r"""Measurement operators: predict observations from spherical images.

API parity with ``/root/reference/pxmcmc/measurements.py`` — the two-method
{forward, adjoint} contract (`measurements.py:7-35`) — implemented as pure
JAX maps with leading batch dimensions.

The reference's sparse-matrix operators (scipy.sparse) become dense
device matmuls: on TPU a dense (ndata, npix) matmul on the MXU beats any
sparse gather formulation at these sizes, and the path matrices of the
phasevel experiment (~thousands of rows x L(2L-1) columns) fit HBM easily.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .config import complex_dtype, real_dtype, to_device
from .ops import sht
from .ops.sampling import sample_shape

__all__ = ["Measurement", "Identity", "PathIntegral", "WeakLensingHarmonic", "WeakLensing"]


class Measurement:
    """Base measurement contract (ref ``measurements.py:7-35``)."""

    def __init__(self, ndata, npix):
        self.ndata = ndata
        self.npix = npix

    def forward(self, X):
        """Image -> observations."""
        raise NotImplementedError

    def adjoint(self, Y):
        """Observations -> image (adjoint, not inverse)."""
        raise NotImplementedError


class Identity(Measurement):
    """Identity (rectangular-eye) operator (ref ``measurements.py:38-56``).

    When ``ndata == npix`` both directions are free; otherwise the forward
    truncates / zero-pads exactly like the reference's ``sparse.eye``.
    """

    def __init__(self, ndata, npix):
        super().__init__(ndata, npix)

    def forward(self, X):
        assert X.shape[-1] == self.npix
        if self.ndata == self.npix:
            return X
        if self.ndata < self.npix:
            return X[..., : self.ndata]
        pad = [(0, 0)] * (X.ndim - 1) + [(0, self.ndata - self.npix)]
        return jnp.pad(X, pad)

    def adjoint(self, Y):
        assert Y.shape[-1] == self.ndata
        if self.ndata == self.npix:
            return Y
        if self.ndata < self.npix:
            pad = [(0, 0)] * (Y.ndim - 1) + [(0, self.npix - self.ndata)]
            return jnp.pad(Y, pad)
        return Y[..., : self.npix]


class PathIntegral(Measurement):
    """Dense matrix measurement (ref ``measurements.py:59-83``).

    ``path_matrix`` is (ndata, npix); rows integrate an image along great
    -circle paths in the phasevel experiment, but any matrix works.  Accepts
    scipy.sparse matrices (densified) or arrays.
    """

    def __init__(self, path_matrix, dtype=None):
        if hasattr(path_matrix, "toarray"):  # scipy.sparse
            path_matrix = path_matrix.toarray()
        A = np.asarray(path_matrix)
        dtype = dtype or (complex_dtype() if np.iscomplexobj(A) else real_dtype())
        self.A = to_device(A, dtype=dtype)
        super().__init__(*A.shape)

    def forward(self, X):
        assert X.shape[-1] == self.npix
        return jnp.einsum("dp,...p->...d", self.A, X)

    def adjoint(self, Y):
        assert Y.shape[-1] == self.ndata
        return jnp.einsum("dp,...d->...p", jnp.conj(self.A), Y)


class WeakLensingHarmonic(Measurement):
    """Weak-lensing forward model in harmonic space (ref ``measurements.py:86-182``).

    Maps convergence klm to shear glm through the diagonal kernel
    ``-sqrt((l+2)(l-1) / ((l+1)l))`` with monopole and dipole zeroed.
    """

    def __init__(self, L, mask=None, ngal=None, dtype=None):
        if L < 1:
            raise ValueError(f"Bandlimit {L} must be greater than 0.")
        self.L = L
        self.shape = (L * L,)
        super().__init__(L * L, L * L)
        self.var_e = 0.37 ** 2  # intrinsic ellipticity dispersion
        dtype = dtype or real_dtype()
        self.harmonic_kernel = jnp.asarray(self._compute_harmonic_kernel(L), dtype=dtype)

    @staticmethod
    def _compute_harmonic_kernel(L):
        ls = np.floor(np.sqrt(np.arange(L * L))).astype(float)
        with np.errstate(divide="ignore", invalid="ignore"):
            k = -np.sqrt((ls + 2.0) * (ls - 1.0) / ((ls + 1.0) * ls))
        k[:4] = 1.0  # l = 0, 1 entries are masked to zero in the mapping
        return k

    def harmonic_mapping(self, flm):
        out = flm * self.harmonic_kernel
        return out.at[..., :4].set(0)

    def harmonic_inverse_mapping(self, flm):
        out = flm / self.harmonic_kernel
        return out.at[..., :4].set(0)

    def forward(self, klm):
        return self.harmonic_mapping(klm)

    def adjoint(self, glm):
        # kernel is real and diagonal: self-adjoint
        return self.harmonic_mapping(glm)

    def sks_estimate(self, glm):
        """Spherical Kaiser-Squires first estimate (ref ``measurements.py:143-149``)."""
        return self.harmonic_inverse_mapping(glm)


class WeakLensing(WeakLensingHarmonic):
    """Weak-lensing forward model in pixel space (ref ``measurements.py:185-304``).

    kappa (spin-0 MW map) -> SHT -> harmonic kernel -> inverse spin-2 SHT ->
    gamma, then masking and per-pixel inverse-covariance weighting.  The
    adjoint runs the exact conjugate-transpose chain through the SHT adjoints
    (``measurements.py:232-240``).
    """

    def __init__(self, L, mask=None, ngal=None, dtype=None):
        super().__init__(L, mask, ngal, dtype=dtype)
        self.map_shape = sample_shape(L)
        npix = L * (2 * L - 1)
        self._basis_dtype = dtype
        # basis0/basis2 (and their per-m pseudo-inverses) are built lazily:
        # the stacked-real fast path (ops/lensing.py) only needs the spin-2
        # lambda table, so a fast-path sampling run never compiles the
        # spin-2 pinv at all.  ensure_bases() materialises them eagerly for
        # the generic complex path (so CaptureThreader can thread them).

        if mask is None:
            self.mask = np.ones(self.map_shape, dtype=bool)
        else:
            mask = np.asarray(mask).astype(bool)
            if mask.shape != self.map_shape:
                raise ValueError("Shape of mask map is incorrect!")
            self.mask = mask
        # host copy kept alongside the device index: ngal_to_inv_cov and other
        # host-side setup must never read the device array back — on relayed
        # TPU backends a setup-time device->host transfer of this size can
        # wedge the connection for every subsequent transfer.
        self._mask_idx_np = np.nonzero(self.mask.flatten())[0]
        self.mask_idx = jnp.asarray(self._mask_idx_np)
        self.ndata = int(self.mask.sum())
        self.npix = npix

        if ngal is None:
            self._inv_cov_np = np.ones(self.ndata)
        else:
            self._inv_cov_np = np.asarray(self.ngal_to_inv_cov(np.asarray(ngal)))
        self.inv_cov = jnp.asarray(self._inv_cov_np, dtype=dtype or real_dtype())

    @property
    def basis0(self):
        if "_basis0" not in self.__dict__:
            self._basis0 = sht.get_basis(self.L, 0, dtype=self._basis_dtype)
        return self._basis0

    @property
    def basis2(self):
        if "_basis2" not in self.__dict__:
            self._basis2 = sht.get_basis(self.L, 2, dtype=self._basis_dtype)
        return self._basis2

    def ensure_bases(self):
        """Materialise the SHT bases eagerly (generic complex path)."""
        self.basis0, self.basis2

    # -- masking ------------------------------------------------------------
    def mask_forward(self, f):
        """Keep unmasked pixels (ref ``measurements.py:242-261``); flat in/out."""
        f = jnp.asarray(f)
        if f.shape[-1] != self.npix:
            f = f.reshape(f.shape[:-2] + (-1,))
        return f[..., self.mask_idx]

    def mask_adjoint(self, x):
        """Scatter observations back onto the (flat) map (ref ``measurements.py:263-280``)."""
        x = jnp.asarray(x)
        out = jnp.zeros(x.shape[:-1] + (self.npix,), dtype=x.dtype)
        return out.at[..., self.mask_idx].set(x)

    def ngal_to_inv_cov(self, ngal):
        """sqrt(2 ngal / var_e) per unmasked pixel (ref ``measurements.py:282-293``)."""
        ngal_m = ngal.flatten()[self._mask_idx_np]
        return np.sqrt(2.0 * ngal_m / self.var_e)

    def cov_weight(self, x):
        return x * self.inv_cov

    # -- forward / adjoint ---------------------------------------------------
    def forward(self, kappa):
        return self._forward(kappa, masking=True, cov_weighting=True)

    def adjoint(self, gamma):
        return self._adjoint(gamma, masking=True, cov_weighting=True)

    def _forward(self, kappa, masking=False, cov_weighting=False):
        kappa = jnp.asarray(kappa)
        kmap = kappa.reshape(kappa.shape[:-1] + self.map_shape) if kappa.shape[-1] == self.npix else kappa
        klm = sht.forward(kmap, self.basis0)
        glm = self.harmonic_mapping(klm)
        gamma = sht.inverse(glm, self.basis2)
        gamma = gamma.reshape(gamma.shape[:-2] + (-1,))
        if masking:
            gamma = gamma[..., self.mask_idx]
        if cov_weighting:
            gamma = self.cov_weight(gamma)
        return gamma

    def _adjoint(self, gamma, masking=False, cov_weighting=False):
        gamma = jnp.asarray(gamma)
        if cov_weighting:
            gamma = self.cov_weight(gamma)
        if masking:
            gamma = self.mask_adjoint(gamma)
        gmap = gamma.reshape(gamma.shape[:-1] + self.map_shape)
        glm = sht.inverse_adjoint(gmap, self.basis2)
        klm = self.harmonic_mapping(glm)
        kappa = sht.forward_adjoint(klm, self.basis0)
        return kappa.reshape(kappa.shape[:-2] + (-1,))

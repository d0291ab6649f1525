r"""Basis transforms: the L2 operator layer.

API parity with ``/root/reference/pxmcmc/transforms.py`` — the abstract
four-method contract {forward, inverse, forward_adjoint, inverse_adjoint}
(`transforms.py:8-33`) — but every method is a pure jit-compiled JAX function
of arrays with leading batch (chain) dimensions, so transforms compose into
a single XLA program with the sampler step.
"""
from __future__ import annotations

import jax.numpy as jnp

from .ops import wavelets
from .ops.sampling import sample_length


class Transform:
    """Base transform contract (ref ``transforms.py:8-33``)."""

    def forward(self, X):
        """e.g. spherical image to wavelet space."""
        raise NotImplementedError

    def inverse(self, X):
        """e.g. wavelet space to spherical image."""
        raise NotImplementedError

    def forward_adjoint(self, X):
        raise NotImplementedError

    def inverse_adjoint(self, X):
        raise NotImplementedError


class IdentityTransform(Transform):
    """Identity transform (ref ``transforms.py:36-56``)."""

    def forward(self, X):
        return X

    def inverse(self, X):
        return X

    def forward_adjoint(self, X):
        return X

    def inverse_adjoint(self, X):
        return X


class SphericalWaveletTransform(Transform):
    """Multiresolution axisymmetric spherical wavelet transform.

    Parity with ``/root/reference/pxmcmc/transforms.py:59-166`` in its
    pixel-space mode (``harmonic=False``); the harmonic mode of the reference
    wraps pys2let functions that its own tests never exercise
    (`/root/reference/tests/test_transforms.py:9-11`).

    :param int L: angular bandlimit
    :param float B: wavelet scale parameter
    :param int J_min: minimum wavelet scale
    :param int dirs: azimuthal bandlimit (only 1 = axisymmetric supported)
    :param int spin: spin number of the signal
    """

    def __init__(self, L, B, J_min, dirs=1, spin=0, dtype=None):
        self.L = L
        self.B = B
        self.J_min = J_min
        self.J_max = wavelets.j_max(B, L, J_min)
        self.nscales = self.J_max - J_min + 1
        self.dirs = dirs
        self.spin = spin
        self.basis = wavelets.get_wavelet_basis(L, B, J_min, spin=spin, dtype=dtype)
        self.nscal = self.basis.nscal
        self.nwav = self.basis.nwav
        self.ncoefs = self.basis.ncoefs

    def forward(self, X):
        """Image -> wavelet coefficients (analysis). (..., L(2L-1)) -> (..., ncoefs)."""
        return wavelets.analysis(jnp.asarray(X), self.basis)

    def inverse(self, X):
        """Wavelet coefficients -> image (synthesis). (..., ncoefs) -> (..., L(2L-1))."""
        return wavelets.synthesis(jnp.asarray(X), self.basis)

    def forward_adjoint(self, X):
        """Adjoint analysis: coefficients -> image."""
        return wavelets.analysis_adjoint(jnp.asarray(X), self.basis)

    def inverse_adjoint(self, X):
        """Adjoint synthesis: image -> coefficients."""
        return wavelets.synthesis_adjoint(jnp.asarray(X), self.basis)

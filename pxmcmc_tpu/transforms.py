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

    Parity with ``/root/reference/pxmcmc/transforms.py:59-166`` in both
    pixel-space (``harmonic=False``) and harmonic (``harmonic=True``) modes.

    :param int L: angular bandlimit
    :param float B: wavelet scale parameter
    :param int J_min: minimum wavelet scale
    :param int dirs: azimuthal bandlimit; dirs > 1 uses directional wavelets:
        in pixel mode the per-scale coefficients live on an SO(3) MW grid
        (2*dirs-1 directions, see ``ops.wavelets.analysis_dir``); in harmonic
        mode they are the per-order lmn pyramids of pys2let's
        ``analysis_lm2lmn`` (see ``ops.wavelets.analysis_dir_lm``).  Both
        compose with ``spin != 0`` (the signal-side SHTs run at that spin)
    :param int spin: spin number of the signal
    :param bool harmonic: inputs/outputs in spherical harmonic space, like
        the reference's pys2let ``analysis_lm2lmn``/``synthesis_lmn2lm``
        wrapping (``transforms.py:89-93``); the harmonic operator is real
        block-diagonal, so synthesis is exactly the transpose of analysis
    """

    def __init__(self, L, B, J_min, dirs=1, spin=0, harmonic=False, dtype=None):
        self.L = L
        self.B = B
        self.J_min = J_min
        self.J_max = wavelets.j_max(B, L, J_min)
        self.nscales = self.J_max - J_min + 1
        self.dirs = dirs
        self.spin = spin
        self.harmonic = harmonic
        if dirs > 1:
            self.basis = wavelets.get_directional_basis(
                L, B, J_min, dirs, spin=spin, dtype=dtype
            )
            if harmonic:
                self.nscal, self.nwav = wavelets.ncoefs_dir_lm(self.basis)
            else:
                self.nscal = self.basis.nscal
                self.nwav = self.basis.nwav
        else:
            self.basis = wavelets.get_wavelet_basis(L, B, J_min, spin=spin, dtype=dtype)
            if harmonic:
                self.nscal = int(self.basis.bandlimits[0]) ** 2
                self.nwav = sum(int(b) ** 2 for b in self.basis.bandlimits[1:])
            else:
                self.nscal = self.basis.nscal
                self.nwav = self.basis.nwav
        self.ncoefs = self.nscal + self.nwav

    def forward(self, X):
        """Image (or flm) -> wavelet coefficients (analysis)."""
        if self.dirs > 1:
            if self.harmonic:
                return wavelets.analysis_dir_lm(jnp.asarray(X), self.basis)
            return wavelets.analysis_dir(jnp.asarray(X), self.basis)
        if self.harmonic:
            return wavelets.analysis_lm(jnp.asarray(X), self.basis)
        return wavelets.analysis(jnp.asarray(X), self.basis)

    def inverse(self, X):
        """Wavelet coefficients -> image (or flm) (synthesis)."""
        if self.dirs > 1:
            if self.harmonic:
                return wavelets.synthesis_dir_lm(jnp.asarray(X), self.basis)
            return wavelets.synthesis_dir(jnp.asarray(X), self.basis)
        if self.harmonic:
            return wavelets.synthesis_lm(jnp.asarray(X), self.basis)
        return wavelets.synthesis(jnp.asarray(X), self.basis)

    def forward_adjoint(self, X):
        """Adjoint analysis: coefficients -> image (or flm)."""
        if self.dirs > 1:
            if self.harmonic:
                # real block-diagonal operator: adjoint == synthesis
                return wavelets.synthesis_dir_lm(jnp.asarray(X), self.basis)
            return wavelets.analysis_dir_adjoint(jnp.asarray(X), self.basis)
        if self.harmonic:
            return wavelets.synthesis_lm(jnp.asarray(X), self.basis)
        return wavelets.analysis_adjoint(jnp.asarray(X), self.basis)

    def inverse_adjoint(self, X):
        """Adjoint synthesis: image (or flm) -> coefficients."""
        if self.dirs > 1:
            if self.harmonic:
                return wavelets.analysis_dir_lm(jnp.asarray(X), self.basis)
            return wavelets.synthesis_dir_adjoint(jnp.asarray(X), self.basis)
        if self.harmonic:
            return wavelets.analysis_lm(jnp.asarray(X), self.basis)
        return wavelets.synthesis_adjoint(jnp.asarray(X), self.basis)

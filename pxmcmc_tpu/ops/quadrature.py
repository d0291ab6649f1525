r"""MW Fourier-quadrature forward SHT tables (SSHT's left-inverse convention).

The default forward transform in :mod:`pxmcmc_tpu.ops.sht` applies per-m
least-squares pseudo-inverses ``Q_m = pinv(Lambda_m)``.  SSHT — the C
library the reference reaches through ``pyssht.forward``
(``/root/reference/pxmcmc/measurements.py:223-239``) — realises a *different*
left inverse: exact Fourier-domain quadrature on the periodically extended
sphere (McEwen & Wiaux 2011, §IV).  Both are exact on bandlimited signals;
they differ in how out-of-band content (pixel noise) is projected.  This
module constructs SSHT's convention as explicit per-m matrices so the whole
pipeline (forward + its exact adjoint, analysis-setting posteriors) can run
in either convention and the difference can be *measured* (see PARITY.md).

Construction, per azimuthal order m and spin s (all host-side f64, cached):

With ``F_m(theta_t)`` the phi-DFT of the map at the L MW theta samples
``theta_t = (2t+1) pi / (2L-1)``, the exact transform is

    f_lm = 2 pi * Int_0^pi  lambda_lm(theta) F_m(theta) sin(theta) dtheta

(the phi integral is already exact from 2L-1 equispaced samples).  Both
``lambda_lm`` and ``F_m`` extend to trigonometric polynomials of degree
<= L-1 on [0, 2pi) through the MW symmetry ``g(2pi - theta) =
(-1)^(m+s) g(theta)``, so with Fourier coefficients ``lamhat_{l,k}`` and
``Fhat_{k'}`` (computed exactly by DFT of the 2L-1 extended samples),

    f_lm = 2 pi * sum_{k,k'} lamhat_{l,k} Fhat_{k'} w(k + k'),
    w(q)  = Int_0^pi e^{i q theta} sin(theta) dtheta
          = pi/2 * i * sign(q)           for |q| = 1
          = (1 + e^{i pi q}) / (1 - q^2) otherwise.

Assembling the linear map from theta samples to f_lm gives the quadrature
analysis matrix ``A_m = 2 pi * lamhat_m  W  Ehat_parity`` with
``W[k,k'] = w(k+k')`` and ``Ehat`` the DFT-of-extension matrix (two parity
cases).  ``A_m Lambda_m = I`` on the bandlimited subspace holds to f64
roundoff (tested), which *is* the MW sampling theorem.
"""
from __future__ import annotations

import os

import numpy as np

from ..config import cache_dir
from . import sampling
from .wigner import spin_lambda_table

__all__ = ["quadrature_analysis_tables", "theta_quadrature_weights"]


def theta_quadrature_weights(L: int) -> np.ndarray:
    """w(q) = Int_0^pi e^{i q theta} sin(theta) dtheta for q = -(2L-2)..2L-2."""
    q = np.arange(-(2 * L - 2), 2 * L - 1)
    w = np.zeros(q.shape, dtype=complex)
    one = np.abs(q) == 1
    w[one] = 1j * np.sign(q[one]) * np.pi / 2
    rest = ~one
    w[rest] = (1.0 + np.exp(1j * np.pi * q[rest])) / (1.0 - q[rest] ** 2)
    return w


def _dft_extension(L: int, parity: float) -> np.ndarray:
    """DFT-of-extension matrix Ehat[k, t]: L theta samples -> Fourier
    coefficients k = -(L-1)..L-1 of the (2L-1)-point MW periodic extension
    ``g(2pi - theta) = parity * g(theta)``."""
    N = 2 * L - 1
    thetas, _ = sampling.sample_positions(L)
    ks = np.arange(-(L - 1), L)[:, None]
    ph = np.exp(-1j * ks * thetas[None, :])  # (K, L)
    E = ph.copy()
    # theta_{L-1} = pi maps to itself; all other samples gain the mirrored
    # contribution e^{-ik(2pi - theta)} = e^{+ik theta} with the parity sign.
    E[:, : L - 1] += parity * np.conj(ph[:, : L - 1])
    return E / N


def quadrature_analysis_tables(L: int, spin: int = 0,
                               use_disk_cache: bool = True) -> np.ndarray:
    """Per-m MW quadrature analysis matrices A[mi, l, t], mi = m + L - 1.

    Drop-in replacement for the pinv ``q`` tables of
    :func:`pxmcmc_tpu.ops.sht.get_basis` realising SSHT's forward convention
    (select with ``PXMCMC_SHT_FORWARD=quadrature``).
    """
    path = os.path.join(cache_dir(), f"sht_quad_L{L}_spin{spin}.npz")
    if use_disk_cache and os.path.exists(path):
        with np.load(path) as z:
            return z["q"]

    N = 2 * L - 1
    thetas, _ = sampling.sample_positions(L)
    lam = spin_lambda_table(L, spin, thetas)  # (2L-1, L(t), L(l))
    w = theta_quadrature_weights(L)  # (4L-3,)
    ks = np.arange(-(L - 1), L)
    # W[k, k'] = w(k + k'); k + k' in [-(2L-2), 2L-2] -> index offset 2L-2
    W = w[ks[:, None] + ks[None, :] + (2 * L - 2)]  # (K, K)
    WE = {
        +1.0: W @ _dft_extension(L, +1.0),  # (K, L(t))
        -1.0: W @ _dft_extension(L, -1.0),
    }
    # lamhat[l, k]: Fourier coefficients of lambda_lm(theta) from its own
    # parity extension, exact DFT of 2L-1 samples (bandlimit <= L-1).
    j = np.arange(N)
    theta_ext = (2 * j + 1) * np.pi / N  # extended grid; first L = thetas
    phase = np.exp(-1j * np.outer(ks, theta_ext))  # (K, N)
    A = np.zeros((2 * L - 1, L, L), dtype=np.float64)
    for mi, m in enumerate(range(-(L - 1), L)):
        parity = (-1.0) ** (m + spin)
        lam_ext = np.concatenate(
            [lam[mi], parity * lam[mi][L - 2 :: -1]], axis=0
        )  # (N(t_ext), L(l))
        lamhat = (phase @ lam_ext) / N  # (K, L(l))
        Am = 2 * np.pi * (lamhat.T @ WE[parity])  # (L(l), L(t))
        # A_m is real: lambda and the extended integrand are real, and the
        # imaginary parts cancel by k <-> -k symmetry (checked).
        assert np.abs(Am.imag).max() < 1e-9 * max(np.abs(Am.real).max(), 1.0)
        A[mi] = Am.real
    if use_disk_cache and L >= 64:
        tmp = path + ".tmp.npz"
        np.savez(tmp, q=A)
        os.replace(tmp, path)
    return A

r"""General utilities: coefficient pyramid layout, thresholding, Chebyshev,
masks, SNR.

JAX re-implementation of ``/root/reference/pxmcmc/utils.py``.  The MW
geometry/quadrature helpers live in :mod:`pxmcmc_tpu.ops.sampling` and are
re-exported here so users of the reference find them in the same place.
"""
from __future__ import annotations

import os
import sys
from contextlib import contextmanager

import jax.numpy as jnp
import numpy as np

from .config import to_device  # noqa: F401  (complex-safe upload boundary)
from .ops.sampling import (  # noqa: F401  (re-exports, reference utils.py:200-299)
    calc_pixel_areas,
    mw_map_weights,
    mw_weights,
    pixel_area,
    polar_cap_area,
    s2_integrate,
    sample_length,
    sample_positions,
    sample_shape,
    weights_theta,
)
from .ops.wavelets import multires_bandlimits as _multires_bandlimits  # noqa: F401


@contextmanager
def suppress_stdout():
    """Suppress stdout from noisy C extensions (ref ``utils.py:91-103``)."""
    with open(os.devnull, "w") as devnull:
        old_stdout = sys.stdout
        sys.stdout = devnull
        try:
            yield
        finally:
            sys.stdout = old_stdout


def map2alm(image, lmax, **kwargs):
    """healpy.map2alm with stdout suppressed (ref ``utils.py:106-108``); needs healpy."""
    import healpy as hp

    with suppress_stdout():
        return hp.map2alm(image, lmax, **kwargs)


def alm2map(alm, nside, **kwargs):
    """healpy.alm2map with stdout suppressed (ref ``utils.py:111-113``); needs healpy."""
    import healpy as hp

    with suppress_stdout():
        return hp.alm2map(alm, nside, **kwargs)


def healpy_lm_to_mw_lm(alm_hp, L):
    """healpy packed alm (m >= 0) -> our flm layout with conjugate symmetry.

    Equivalent of ``pys2let.lm_hp2lm`` as used at
    ``/root/reference/experiments/earthtopography/main.py:82``.
    """
    flm = np.zeros(L * L, dtype=complex)
    lmax = L - 1

    def hp_idx(el, m):
        return m * (2 * lmax + 1 - m) // 2 + el

    for el in range(L):
        for m in range(el + 1):
            a = alm_hp[hp_idx(el, m)]
            flm[el * el + el + m] = a
            if m:
                flm[el * el + el - m] = (-1) ** m * np.conj(a)
    return flm


def flatten_mlm(wav_lm, scal_lm):
    """Flatten (wavelet, scaling) coefficients into one vector, scaling first.

    Reference: ``/root/reference/pxmcmc/utils.py:11-22`` (column-major flatten
    of multi-scale wavelet arrays; already-flat multires input passes through).
    """
    wav_lm = to_device(wav_lm)
    buff = wav_lm.T.ravel() if wav_lm.ndim > 1 else wav_lm.ravel()
    return jnp.concatenate([to_device(scal_lm), buff])


def expand_mlm(mlm, nscales=None, nscalcoefs=None, flatten_wavs=False):
    """Split a flat coefficient vector into (wavelet, scaling) parts.

    Reference: ``/root/reference/pxmcmc/utils.py:25-52``.
    """
    mlm = to_device(mlm)
    if nscales is None and nscalcoefs is None:
        raise ValueError("Set either 'nscales', or 'nscalcoefs'")
    if nscales is not None and nscalcoefs is not None:
        raise ValueError("Give only one of 'nscales' or 'nscalcoefs'")
    if nscales is not None:
        v_len = mlm.size // (nscales + 1)
        assert v_len > 0
        scal_lm = mlm[:v_len]
        wav_lm = mlm[v_len:].reshape(nscales, v_len).T
        if flatten_wavs:
            wav_lm = wav_lm.T.ravel()
    else:
        scal_lm = mlm[:nscalcoefs]
        wav_lm = mlm[nscalcoefs:]
    return wav_lm, scal_lm


def _sign(z):
    """z / |z| with 0 -> 0; complex-safe (ref ``utils.py:84-88``)."""
    a = jnp.abs(z)
    return jnp.where(a == 0, 0, z / jnp.where(a == 0, 1, a))


def soft(X, T=0.1):
    """Soft thresholding, the prox of ``T * ||.||_1`` (ref ``utils.py:55-67``).

    Complex-safe: shrinks the modulus, preserves the phase.  ``T`` may be a
    vector broadcastable against ``X``.
    """
    X = jnp.asarray(X)
    mag = jnp.abs(X)
    return _sign(X) * jnp.maximum(mag - T, 0)


def hard(X, T=0.1):
    """Keep the largest 100T% of values by modulus (ref ``utils.py:70-81``).

    Guards the reference's small-T edge: when ``int(T * n) == 0`` the
    reference indexes ``srt[-0]`` — the *minimum* — and keeps everything;
    here T small enough to keep zero values keeps zero values.
    """
    X = jnp.asarray(X)
    mag = jnp.abs(X)
    thresh_ind = int(T * X.shape[-1])
    if thresh_ind <= 0:
        return jnp.zeros_like(X)
    srt = jnp.sort(mag)
    thresh_val = srt[..., -thresh_ind]
    return jnp.where(mag < thresh_val, 0, X)


def chebyshev1(X, order: int):
    """Chebyshev T_n(X) via the three-term recurrence (ref ``utils.py:128-151``).

    Iterative (the reference's recursive version is exponential in ``order``).
    """
    if order < 0:
        raise ValueError("order must be >= 0")
    if order == 0:
        return X * 0 + 1 if hasattr(X, "shape") else 1
    prev, curr = 1, X
    for _ in range(order - 1):
        prev, curr = curr, 2 * X * curr - prev
    return curr


def chebyshev2(X, order: int):
    """Chebyshev U_n(X) (ref ``utils.py:154-177``)."""
    if order < 0:
        raise ValueError("order must be >= 0")
    if order == 0:
        return X * 0 + 1 if hasattr(X, "shape") else 1
    prev, curr = 1, 2 * X
    for _ in range(order - 1):
        prev, curr = curr, 2 * X * curr - prev
    return curr


def cheb1der(X, order: int):
    """d/dx T_n = n U_{n-1} (ref ``utils.py:180-197``)."""
    if order < 0:
        raise ValueError("order must be >= 0")
    if order == 0:
        return 0
    return order * chebyshev2(X, order - 1)


def norm(x):
    return jnp.linalg.norm(x)


def snr(signal, noise):
    """20 log10(||signal|| / ||noise||) in dB (ref ``utils.py:306-317``)."""
    return 20 * jnp.log10(norm(signal) / norm(noise))


# ---------------------------------------------------------------------------
# Galactic/ecliptic mask (reference builds this with astropy SkyCoord,
# ``utils.py:320-349``; we apply the standard ICRS->galactic rotation
# directly so no astropy dependency is needed).
# ---------------------------------------------------------------------------

# ICRS -> galactic rotation matrix (IAU 1958 galactic frame, standard values).
_R_GAL = np.array(
    [
        [-0.0548755604162154, -0.8734370902348850, -0.4838350155487132],
        [+0.4941094278755837, -0.4448296299600112, +0.7469822444972189],
        [-0.8676661490190047, -0.1980763734312015, +0.4559837761750669],
    ]
)


def galactic_latitude(ra_deg, dec_deg):
    """Galactic latitude b (degrees) of ICRS (ra, dec) in degrees."""
    ra = np.radians(np.asarray(ra_deg))
    dec = np.radians(np.asarray(dec_deg))
    v = np.stack(
        [np.cos(dec) * np.cos(ra), np.cos(dec) * np.sin(ra), np.sin(dec)], axis=-1
    )
    vg = v @ _R_GAL.T
    return np.degrees(np.arcsin(np.clip(vg[..., 2], -1, 1)))


def build_mask(L: int, size: float = 20):
    """Binary MW mask zeroing the ecliptic band and the galactic plane.

    0 at masked positions (apply as ``map * mask``); ``size`` is each band's
    half-width in degrees.  Reference: ``utils.py:320-349``.
    """
    mask = np.ones(sample_shape(L))
    thetas, phis = sample_positions(L)
    lat = 90.0 - np.degrees(thetas)
    mask[np.abs(lat) < size, :] = 0

    tg, pg = sample_positions(L, grid=True)
    dec = np.degrees(tg) - 90.0
    ra = np.degrees(pg) - 180.0
    b = galactic_latitude(ra, dec)
    mask[np.abs(b) < size] = 0
    return mask

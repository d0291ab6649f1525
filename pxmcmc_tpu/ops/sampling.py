"""McEwen--Wiaux (MW) sphere sampling geometry and exact quadrature.

TPU-native re-implementation of the sampling-geometry surface the reference
reaches through the C library SSHT (``pyssht.sample_shape/sample_length/
sample_positions``) and of the exact MW quadrature weights implemented at
``/root/reference/pxmcmc/utils.py:249-299`` (``mw_weights``, ``weights_theta``,
``mw_map_weights``, ``s2_integrate``) and the pixel-area helpers at
``/root/reference/pxmcmc/utils.py:200-246``.

MW sampling of a bandlimit-``L`` signal places samples at

    theta_t = pi * (2 t + 1) / (2 L - 1),   t = 0..L-1      (open at 0, closed at pi)
    phi_p   = 2 pi * p / (2 L - 1),         p = 0..2L-2

for a total of ``L (2L - 1)`` samples — the minimal number admitting an exact
(spin) spherical harmonic transform on the sphere.

Everything here is cheap host-side setup maths; it is written in numpy (f64)
and consumed by the JAX transforms in :mod:`pxmcmc_tpu.ops.sht`.
"""
from __future__ import annotations

import numpy as np


def sample_shape(L: int) -> tuple[int, int]:
    """(ntheta, nphi) = (L, 2L-1) grid shape of MW sampling (pyssht.sample_shape)."""
    return (L, 2 * L - 1)


def sample_length(L: int) -> int:
    """Number of MW samples L(2L-1) (pyssht.sample_length / pys2let.mw_size)."""
    return L * (2 * L - 1)


# Alias matching the name the reference imports from pys2let
# (`/root/reference/pxmcmc/forward.py:1`).
mw_size = sample_length


def sample_positions(L: int, grid: bool = False):
    """Colatitudes theta and longitudes phi of MW samples (pyssht.sample_positions).

    :param L: bandlimit
    :param grid: if True return meshgrid arrays of shape (L, 2L-1)
    """
    t = np.arange(L)
    p = np.arange(2 * L - 1)
    thetas = (2 * t + 1) * np.pi / (2 * L - 1)
    phis = 2 * p * np.pi / (2 * L - 1)
    if grid:
        return np.meshgrid(thetas, phis, indexing="ij")
    return thetas, phis


def theta_to_index(theta: float, L: int) -> int:
    """Index of the closest MW theta ring at or below ``theta`` (pyssht.theta_to_index)."""
    thetas, _ = sample_positions(L)
    return int(np.argmin(np.abs(thetas - theta)))


def phi_to_index(phi: float, L: int) -> int:
    """Index of the closest MW phi column (pyssht.phi_to_index)."""
    _, phis = sample_positions(L)
    phi = np.mod(phi, 2 * np.pi)
    return int(np.argmin(np.abs(phis - phi)))


# ---------------------------------------------------------------------------
# Exact quadrature
# ---------------------------------------------------------------------------

def mw_weights(m) -> complex:
    """Fourier coefficients of sin(theta) on [0, pi]:  w(m) = int_0^pi e^{i m x} sin x dx.

    Reference: ``/root/reference/pxmcmc/utils.py:249-259``.  Vectorised over m.
    """
    m = np.asarray(m)
    out = np.zeros(m.shape, dtype=complex)
    out = np.where(m == 1, 1j * np.pi / 2, out)
    out = np.where(m == -1, -1j * np.pi / 2, out)
    even = (m % 2 == 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        w_even = 2.0 / (1.0 - m.astype(float) ** 2)
    out = np.where(even, w_even, out)
    return out if out.ndim else complex(out)


def weights_theta(L: int) -> np.ndarray:
    """Ring quadrature weights on the *extended* theta grid of 2L-1 points.

    Computes w_r(theta_t) such that, for any trigonometric polynomial g of
    degree <= L-1 defined on [0, 2pi) sampled at theta_t=(2t+1)pi/(2L-1),
    ``sum_t w_r[t] g(theta_t) = int_0^pi g(theta) sin(theta) dtheta`` holds
    exactly.  Port of ``/root/reference/pxmcmc/utils.py:262-267``.
    """
    m = np.arange(-(L - 1), L)
    wr = mw_weights(m) * np.exp(-1j * m * np.pi / (2 * L - 1))
    wr = (np.fft.fft(np.fft.ifftshift(wr)) * 2 * np.pi / (2 * L - 1) ** 2).real
    return wr


def mw_map_weights(L: int) -> np.ndarray:
    """Exact quadrature weights for integrating bandlimit-L signals on MW sampling.

    Folds the extended-grid theta weights back onto the L physical rings and
    broadcasts over the 2L-1 phi columns.  Shape ``(L(2L-1),)``.
    Reference: ``/root/reference/pxmcmc/utils.py:270-283``.
    """
    wr = weights_theta(L)
    q = wr[:L].copy()
    # Fold the mirrored theta in (pi, 2pi) back onto rings L-2..0.
    for i, j in enumerate(range(2 * L - 2, L - 1, -1)):
        q[i] += wr[j]
    return np.outer(q, np.ones(2 * L - 1)).flatten()


def s2_integrate(f, L: int):
    """Integral of a bandlimit-L MW map over the sphere.

    Accepts numpy or jax arrays of shape ``(L(2L-1),)`` or ``(L, 2L-1)``
    (trailing axes); batch dims lead.  Reference:
    ``/root/reference/pxmcmc/utils.py:286-299``.
    """
    w = mw_map_weights(L)
    if f.shape[-1] != w.size:
        f = f.reshape(f.shape[:-2] + (-1,))
    return (f * w).sum(axis=-1)


# ---------------------------------------------------------------------------
# Pixel areas
# ---------------------------------------------------------------------------

def pixel_area(r, theta1, theta2, phi1, phi2):
    """Area of a spherical rectangle (radians).  Ref ``utils.py:200-212``."""
    return r ** 2 * (np.cos(theta1) - np.cos(theta2)) * (phi2 - phi1)


def polar_cap_area(r, theta):
    """Area of a polar cap of opening angle theta.  Ref ``utils.py:215-224``."""
    return 2 * np.pi * r ** 2 * (1 - np.cos(theta))


def calc_pixel_areas(L: int, r: float = 1.0) -> np.ndarray:
    """Areas of all MW pixels; shape (L, 2L-1); sums to 4 pi r^2.

    Vectorised version of ``/root/reference/pxmcmc/utils.py:227-246``: ring 0
    is the polar cap split evenly in phi; ring t+1 spans [theta_t, theta_{t+1}].
    """
    thetas, phis = sample_positions(L)
    nphi = phis.size
    phis_ext = np.append(phis, 2 * np.pi)
    dphi = np.diff(phis_ext)  # (2L-1,)
    areas = np.empty((L, nphi), dtype=float)
    areas[0] = polar_cap_area(r, thetas[0]) / nphi
    dcos = np.cos(thetas[:-1]) - np.cos(thetas[1:])  # (L-1,)
    areas[1:] = r ** 2 * np.outer(dcos, dphi)
    return areas

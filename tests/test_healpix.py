"""healpy-free healpix support tests (oracle: direct spherical-harmonic sums)."""
import os

import numpy as np
import pytest
from scipy.special import sph_harm_y

from pxmcmc_tpu.ops import healpix


def _random_flm(L, rng):
    flm = np.zeros(L * L, complex)
    for el in range(L):
        flm[el * el + el] = rng.standard_normal()
        for m in range(1, el + 1):
            a = rng.standard_normal() + 1j * rng.standard_normal()
            flm[el * el + el + m] = a
            flm[el * el + el - m] = (-1) ** m * np.conj(a)
    return flm


def _direct_map(flm, nside, L):
    rings = healpix.ring_info(nside)
    npix = 12 * nside * nside
    f = np.zeros(npix)
    for start, nph, theta, phi0 in rings:
        phis = phi0 + 2 * np.pi * np.arange(nph) / nph
        vals = np.zeros(nph, complex)
        for ind in range(L * L):
            el = int(np.floor(np.sqrt(ind)))
            m = ind - el * el - el
            vals += flm[ind] * sph_harm_y(el, m, theta, phis)
        f[start : start + nph] = vals.real
    return f


def test_ring_info_counts():
    for nside in (1, 2, 4, 16):
        rings = healpix.ring_info(nside)
        assert sum(r[1] for r in rings) == 12 * nside * nside
        assert len(rings) == 4 * nside - 1
        thetas = [r[2] for r in rings]
        assert all(t1 < t2 for t1, t2 in zip(thetas, thetas[1:]))  # north→south


def test_alm2map_matches_direct_sum(rng):
    nside, L = 8, 6
    flm = _random_flm(L, rng)
    direct = _direct_map(flm, nside, L)
    ours = healpix.alm2map(flm, nside)
    assert np.allclose(ours, direct, atol=1e-12)


def test_map2alm_roundtrip(rng):
    nside, L = 16, 8
    flm = _random_flm(L, rng)
    f = healpix.alm2map(flm, nside)
    rec = healpix.map2alm(f, L, niter=3)
    assert np.abs(rec - flm).max() / np.abs(flm).max() < 1e-6


def test_nest2ring_identity_preserved():
    nside = 4
    inv = healpix.nest2ring_index(nside)
    assert sorted(inv) == list(range(12 * nside * nside))  # a permutation


@pytest.mark.skipif(
    not os.path.exists(
        "/root/reference/experiments/earthtopography/ETOPO1_Ice_hpx_256.fits"
    ),
    reason="reference data file unavailable",
)
def test_read_real_etopo_fits():
    m, nside = healpix.read_healpix_fits(
        "/root/reference/experiments/earthtopography/ETOPO1_Ice_hpx_256.fits"
    )
    assert nside == 256 and m.size == 12 * 256 * 256
    assert -11000 < m.min() < -4000  # ocean trenches (metres)
    assert 4000 < m.max() < 9000  # mountains
    flm = healpix.map2alm(m, 8, niter=0)
    assert np.isclose(flm[0].real, m.mean() * np.sqrt(4 * np.pi), rtol=1e-3)

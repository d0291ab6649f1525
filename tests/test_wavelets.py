"""Wavelet layer tests: admissibility, round-trip, adjoint dot-tests.

Mirrors `/root/reference/tests/test_transforms.py` plus tiling identities the
reference takes on faith from the S2LET C library.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from pxmcmc_tpu.ops import sampling, wavelets
from pxmcmc_tpu.transforms import IdentityTransform, SphericalWaveletTransform


@pytest.fixture
def wvlttransform(L, B, J_min):
    return SphericalWaveletTransform(L, B, J_min)


def make_bandlimited_map(L, rng):
    from tests.conftest import make_real_flm

    from pxmcmc_tpu.ops import sht

    basis = sht.get_basis(L, 0, use_disk_cache=False)
    return np.asarray(
        sht.inverse_real(jnp.asarray(make_real_flm(L, rng)), basis)
    ).flatten()


def test_admissibility(L, B, J_min):
    """eta^2 + sum_j kappa_j^2 == 1 for every l < L — exact reconstruction."""
    eta, kappas = wavelets.tiling(B, L, J_min)
    total = eta ** 2 + (kappas ** 2).sum(axis=0)
    assert np.allclose(total, 1.0, atol=1e-10)


def test_j_max(B, L):
    assert wavelets.j_max(B, L) == int(np.ceil(np.log(L - 1) / np.log(B)))


def test_multires_bandlimits(L, B, J_min):
    bls = wavelets.multires_bandlimits(L, B, J_min)
    # scaling support ends at B^J_min; wavelet j support ends at B^(j+1), cap L
    assert bls[0] <= int(np.ceil(B ** J_min))
    assert bls[-1] == L
    assert all(0 < b <= L for b in bls)
    # monotone non-decreasing across wavelet scales
    assert all(b1 <= b2 for b1, b2 in zip(bls[1:], bls[2:]))


def test_tiling_pys2let_convention(L, B, J_min):
    phi_l, psi_lm = wavelets.wavelet_tiling(B, L, 1, J_min, 0)
    assert phi_l.shape == (L,)
    J = wavelets.j_max(B, L) - J_min + 1
    assert psi_lm.shape == (L * L, J)
    # only m=0 entries populated (axisymmetric)
    for ind in range(L * L):
        el = int(np.floor(np.sqrt(ind)))
        if ind != el * el + el:
            assert np.all(psi_lm[ind] == 0)


def test_wavelet_fwdback(wvlttransform, simpledata):
    """forward then inverse is the identity (ref test_transforms.py:16-19)."""
    X_wav = wvlttransform.forward(simpledata)
    assert X_wav.shape[-1] == wvlttransform.ncoefs
    data_rec = np.asarray(wvlttransform.inverse(X_wav))
    assert np.allclose(simpledata, data_rec.real, atol=1e-10)
    assert np.abs(data_rec.imag).max() < 1e-10


def test_wavelet_fwd_adjoint_dot(wvlttransform, simpledata, rng):
    x = simpledata.astype(complex)
    y = np.asarray(wvlttransform.forward(x))
    f = rng.standard_normal(wvlttransform.ncoefs) + 1j * rng.standard_normal(
        wvlttransform.ncoefs
    )
    g = np.asarray(wvlttransform.forward_adjoint(f))
    assert np.isclose(np.vdot(f, y), np.vdot(g, x))


def test_wavelet_inv_adjoint_dot(wvlttransform, simpledata, rng):
    x = rng.standard_normal(wvlttransform.ncoefs) + 1j * rng.standard_normal(
        wvlttransform.ncoefs
    )
    y = np.asarray(wvlttransform.inverse(x))
    f = simpledata.astype(complex)
    g = np.asarray(wvlttransform.inverse_adjoint(f))
    assert np.isclose(np.vdot(f, y), np.vdot(g, x))


def test_wavelet_batched(wvlttransform, simpledata):
    batch = np.stack([simpledata, 2 * simpledata, -simpledata])
    X = np.asarray(wvlttransform.forward(batch))
    assert X.shape == (3, wvlttransform.ncoefs)
    rec = np.asarray(wvlttransform.inverse(X))
    assert np.allclose(rec.real, batch, atol=1e-10)


def test_coefficient_layout(wvlttransform, simpledata):
    """Scaling block first, then wavelet scales at their multires sizes."""
    bls = wavelets.multires_bandlimits(
        wvlttransform.L, wvlttransform.B, wvlttransform.J_min
    )
    sizes = [sampling.sample_length(int(b)) for b in bls]
    assert wvlttransform.nscal == sizes[0]
    assert wvlttransform.nwav == sum(sizes[1:])


def test_identity_transform():
    t = IdentityTransform()
    x = jnp.arange(5.0)
    for meth in ("forward", "inverse", "forward_adjoint", "inverse_adjoint"):
        assert np.array_equal(np.asarray(getattr(t, meth)(x)), np.asarray(x))


class TestHarmonicMode:
    """harmonic=True transform (pys2let lm2lmn equivalent)."""

    def test_roundtrip(self, L, B, J_min, simpledata_lm):
        t = SphericalWaveletTransform(L, B, J_min, harmonic=True)
        X = t.forward(simpledata_lm)
        assert X.shape[-1] == t.ncoefs
        rec = np.asarray(t.inverse(X))
        assert np.allclose(rec, simpledata_lm, atol=1e-12)

    def test_adjoints_are_transposes(self, L, B, J_min, rng):
        t = SphericalWaveletTransform(L, B, J_min, harmonic=True)
        x = rng.standard_normal(L * L) + 1j * rng.standard_normal(L * L)
        y = rng.standard_normal(t.ncoefs) + 1j * rng.standard_normal(t.ncoefs)
        lhs = np.vdot(y, np.asarray(t.forward(x)))
        rhs = np.vdot(np.asarray(t.forward_adjoint(y)), x)
        assert np.isclose(lhs, rhs)
        lhs = np.vdot(x, np.asarray(t.inverse(y)))
        rhs = np.vdot(np.asarray(t.inverse_adjoint(x)), y)
        assert np.isclose(lhs, rhs)

    def test_coefs_count(self, L, B, J_min):
        t = SphericalWaveletTransform(L, B, J_min, harmonic=True)
        from pxmcmc_tpu.ops.wavelets import multires_bandlimits

        bls = multires_bandlimits(L, B, J_min)
        assert t.ncoefs == sum(int(b) ** 2 for b in bls)


class TestDirectional:
    """Directional wavelets (dirs = N > 1) — the reference exposes N through
    pys2let (`/root/reference/pxmcmc/transforms.py:84`, `forward.py:98`).
    Exactness anchors: admissibility (round-trip identity), adjoint
    dot-tests, reality for real signals, dirs=1 reduction."""

    def test_tiling_direction_normalised(self):
        from pxmcmc_tpu.ops.wavelets import tiling_direction

        for N in (1, 2, 3, 4):
            s = tiling_direction(32, N)
            norms = (s ** 2).sum(axis=1)
            lo = 1 if N % 2 == 0 else 0  # even N: no support at l = 0
            np.testing.assert_allclose(norms[lo:], 1.0, atol=1e-13)
            # parity: only (N + n) odd entries populated
            for n in range(-(N - 1), N):
                if (N + n) % 2 == 0:
                    assert np.all(s[:, n + N - 1] == 0.0)

    @pytest.mark.parametrize("dirs", [2, 3])
    def test_roundtrip_real(self, dirs, rng):
        from pxmcmc_tpu.ops import wavelets as wv

        L, B, J_min = 16, 2, 1  # J_min=1 so wavelets cover l=1 where needed
        dwb = wv.get_directional_basis(L, B, J_min, dirs, use_disk_cache=False)
        f = make_bandlimited_map(L, rng)
        X = np.asarray(wv.analysis_dir(jnp.asarray(f), dwb))
        assert X.shape == (dwb.ncoefs,)
        assert not np.iscomplexobj(X)  # real signal -> real coefficients
        rec = np.asarray(wv.synthesis_dir(jnp.asarray(X), dwb))
        np.testing.assert_allclose(rec, f, atol=1e-10)

    def test_roundtrip_complex(self, rng):
        from pxmcmc_tpu.ops import wavelets as wv

        L, B, J_min, dirs = 12, 2, 1, 2
        dwb = wv.get_directional_basis(L, B, J_min, dirs, use_disk_cache=False)
        f = make_bandlimited_map(L, rng) + 1j * make_bandlimited_map(L, rng)
        X = wv.analysis_dir(jnp.asarray(f), dwb)
        rec = np.asarray(wv.synthesis_dir(X, dwb))
        np.testing.assert_allclose(rec, f, atol=1e-10)

    @pytest.mark.parametrize("dirs", [2, 3])
    def test_adjoint_dot_tests(self, dirs, rng):
        from pxmcmc_tpu.ops import wavelets as wv

        L, B, J_min = 12, 2, 1
        dwb = wv.get_directional_basis(L, B, J_min, dirs, use_disk_cache=False)
        npix = dwb.npix
        f = rng.standard_normal(npix) + 1j * rng.standard_normal(npix)
        Y = rng.standard_normal(dwb.ncoefs) + 1j * rng.standard_normal(dwb.ncoefs)
        # <Y, analysis f> == <analysis_adjoint Y, f>
        lhs = np.vdot(Y, np.asarray(wv.analysis_dir(jnp.asarray(f), dwb)))
        rhs = np.vdot(np.asarray(wv.analysis_dir_adjoint(jnp.asarray(Y), dwb)), f)
        np.testing.assert_allclose(lhs, rhs, rtol=1e-10)
        # <f, synthesis Y> == <synthesis_adjoint f, Y>
        lhs = np.vdot(f, np.asarray(wv.synthesis_dir(jnp.asarray(Y), dwb)))
        rhs = np.vdot(np.asarray(wv.synthesis_dir_adjoint(jnp.asarray(f), dwb)), Y)
        np.testing.assert_allclose(lhs, rhs, rtol=1e-10)

    def test_transform_class_dispatch(self, rng):
        from pxmcmc_tpu.transforms import SphericalWaveletTransform

        L, B, J_min, dirs = 12, 2, 1, 2
        t = SphericalWaveletTransform(L, B, J_min, dirs=dirs)
        f = make_bandlimited_map(L, rng)
        X = t.forward(f)
        assert X.shape == (t.ncoefs,)
        rec = np.asarray(t.inverse(X))
        np.testing.assert_allclose(rec, f, atol=1e-10)
        # batched (chains-leading) inputs flow through unchanged
        fb = np.stack([f, 2 * f])
        Xb = np.asarray(t.forward(fb))
        np.testing.assert_allclose(Xb[1], 2 * np.asarray(X), atol=1e-10)

    @pytest.mark.parametrize("dirs", [2, 3])
    def test_harmonic_roundtrip_and_transpose(self, dirs, rng):
        """Directional harmonic mode (pys2let analysis_lm2lmn role,
        `/root/reference/pxmcmc/transforms.py:89-93`): exact round trip by
        directional admissibility, and synthesis == transpose of analysis."""
        from pxmcmc_tpu.ops import wavelets as wv

        L, B, J_min = 16, 2, 1
        dwb = wv.get_directional_basis(L, B, J_min, dirs, use_disk_cache=False)
        flm = rng.standard_normal(L * L) + 1j * rng.standard_normal(L * L)
        X = np.asarray(wv.analysis_dir_lm(jnp.asarray(flm), dwb))
        nscal, nwav = wv.ncoefs_dir_lm(dwb)
        assert X.shape == (nscal + nwav,)
        rec = np.asarray(wv.synthesis_dir_lm(jnp.asarray(X), dwb))
        np.testing.assert_allclose(rec, flm, atol=1e-6)
        # adjoint dot-test: operator is real block-diagonal, so
        # <Y, A f> == <A^T Y, f> with A^T = synthesis
        Y = rng.standard_normal(X.shape[0]) + 1j * rng.standard_normal(X.shape[0])
        lhs = np.vdot(Y, np.asarray(wv.analysis_dir_lm(jnp.asarray(flm), dwb)))
        rhs = np.vdot(np.asarray(wv.synthesis_dir_lm(jnp.asarray(Y), dwb)), flm)
        np.testing.assert_allclose(lhs, rhs, rtol=1e-5)

    def test_harmonic_transform_class_dispatch(self, rng):
        from pxmcmc_tpu.transforms import SphericalWaveletTransform

        L, B, J_min, dirs = 12, 2, 1, 2
        t = SphericalWaveletTransform(L, B, J_min, dirs=dirs, harmonic=True)
        flm = rng.standard_normal(L * L) + 1j * rng.standard_normal(L * L)
        X = t.forward(flm)
        assert X.shape == (t.ncoefs,)
        np.testing.assert_allclose(np.asarray(t.inverse(X)), flm, atol=1e-6)
        # inverse_adjoint == forward (transpose pairing)
        np.testing.assert_allclose(
            np.asarray(t.inverse_adjoint(flm)), np.asarray(X), atol=1e-6
        )

    @pytest.mark.parametrize("spin", [1, 2])
    def test_spin_roundtrip_and_adjoints(self, spin, rng):
        """Directional wavelets of a spin-s signal: the signal-side SHTs run
        at spin s (ref threads spin through pys2let's directional variants,
        `/root/reference/pxmcmc/transforms.py:84-98`).  Round trip is exact
        on bandlimited spin-s maps; adjoint dot-tests hold on arbitrary
        vectors."""
        from pxmcmc_tpu.ops import sht, wavelets as wv

        L, B, J_min, dirs = 16, 2, 1, 2
        dwb = wv.get_directional_basis(
            L, B, J_min, dirs, spin=spin, use_disk_cache=False
        )
        # bandlimited spin-s map: random flm supported on l >= |spin|
        flm = rng.standard_normal(L * L) + 1j * rng.standard_normal(L * L)
        ls = np.floor(np.sqrt(np.arange(L * L))).astype(int)
        flm[ls < abs(spin)] = 0.0
        f = np.asarray(sht.inverse(jnp.asarray(flm), dwb.main)).flatten()
        X = wv.analysis_dir(jnp.asarray(f), dwb)
        assert np.iscomplexobj(np.asarray(X))  # spin signals stay complex
        rec = np.asarray(wv.synthesis_dir(X, dwb))
        np.testing.assert_allclose(rec, f, atol=1e-4)
        # adjoint dot-tests
        npix = dwb.npix
        g = rng.standard_normal(npix) + 1j * rng.standard_normal(npix)
        Y = rng.standard_normal(dwb.ncoefs) + 1j * rng.standard_normal(dwb.ncoefs)
        lhs = np.vdot(Y, np.asarray(wv.analysis_dir(jnp.asarray(g), dwb)))
        rhs = np.vdot(np.asarray(wv.analysis_dir_adjoint(jnp.asarray(Y), dwb)), g)
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)
        lhs = np.vdot(g, np.asarray(wv.synthesis_dir(jnp.asarray(Y), dwb)))
        rhs = np.vdot(np.asarray(wv.synthesis_dir_adjoint(jnp.asarray(g), dwb)), Y)
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)

    def test_spin_transform_class_dispatch(self, rng):
        from pxmcmc_tpu.transforms import SphericalWaveletTransform

        t = SphericalWaveletTransform(16, 2, 1, dirs=2, spin=2)
        assert t.ncoefs == t.basis.ncoefs

    def test_wavelet_tiling_dirs(self):
        """wavelet_tiling populates |m| < dirs entries and keeps the
        admissibility column sums (pys2let-convention output surface)."""
        from pxmcmc_tpu.ops.wavelets import wavelet_tiling

        L = 16
        phi, psi = wavelet_tiling(2.0, L, dirs=3, J_min=1)
        assert psi.shape[0] == L * L
        # some off-m=0 content exists for dirs > 1
        off = [psi[el * el + el + n] for el in range(2, L) for n in (-2, 2)]
        assert np.abs(np.asarray(off)).max() > 0


def test_gram_gradient_grid_equals_pixel_chain(rng):
    """The gather-free grid-form Gram gradient equals both the flat-lm chain
    it replaced and the full pixel-space S^T S X — same linear operator."""
    import jax.numpy as jnp

    from pxmcmc_tpu.ops import sht as shtm

    L, B, J_min = 16, 2, 2
    wb = wavelets.get_wavelet_basis(L, B, J_min, use_disk_cache=False)
    gram = shtm.get_gram(L, 0, use_disk_cache=False)
    X = rng.standard_normal((3, wb.ncoefs))  # batched over chains
    got = np.asarray(wavelets.gram_gradient_real(jnp.asarray(X), wb, gram))
    # flat-lm chain
    flm = wavelets.synthesis_lm_real(jnp.asarray(X), wb)
    glm = shtm.gram_apply_real(flm, gram, wb.main)
    flat = np.asarray(wavelets.adjoint_scales_real(glm, wb))
    np.testing.assert_allclose(got, flat, atol=1e-11)
    # pixel-space chain
    pix = np.asarray(
        wavelets.synthesis_adjoint(wavelets.synthesis(jnp.asarray(X), wb), wb)
    )
    np.testing.assert_allclose(got, pix, atol=1e-10)


def test_dir_gram_gradient_matches_complex_chain(rng):
    """Stacked-real directional Gram gradient (ops/dirgram.py) equals
    synthesis_dir_adjoint(synthesis_dir(X)) for real X, for odd and even
    dirs, in both flat and grid-block forms."""
    from pxmcmc_tpu.ops import sht
    from pxmcmc_tpu.ops.dirgram import (
        build_dir_gram_tables,
        dir_gram_gradient,
        dir_gram_gradient_blocks,
    )

    for L, dirs in ((24, 3), (20, 2)):
        dwb = wavelets.get_directional_basis(L, 1.5, 2, dirs)
        t = build_dir_gram_tables(dwb, sht.get_gram(L, 0))
        X = jnp.asarray(
            rng.standard_normal((2, dwb.ncoefs)), dtype=jnp.float32
        )
        ref = np.asarray(
            wavelets.synthesis_dir_adjoint(wavelets.synthesis_dir(X, dwb), dwb)
        )
        out = np.asarray(dir_gram_gradient(X, dwb, t))
        assert np.abs(ref - out).max() <= 1e-5 * np.abs(ref).max()

        G = 2 * dirs - 1
        bls = [int(b) for b in dwb.bandlimits]
        blocks = wavelets._split_dir(X, dwb)
        gb = [blocks[0].reshape(2, bls[0], 2 * bls[0] - 1)] + [
            b.reshape(2, G, bl, 2 * bl - 1)
            for b, bl in zip(blocks[1:], bls[1:])
        ]
        ob = dir_gram_gradient_blocks(tuple(gb), dwb, t)
        flat = np.concatenate([np.asarray(o).reshape(2, -1) for o in ob], axis=-1)
        assert np.abs(ref - flat).max() <= 1e-5 * np.abs(ref).max()

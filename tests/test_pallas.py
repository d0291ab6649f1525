"""Pallas fused kernels.

On the CPU test backend the kernels run in TPU-interpret mode, where the
on-core PRNG is stubbed to zeros — so CPU tests exercise determinism and the
exact prox/update arithmetic (noise coefficient contributes nothing), and
the noise-path statistics are validated by TPU-only tests (skipped here).
``MYULA`` refuses the fused path on CPU for exactly this reason.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pxmcmc_tpu.forward import ForwardOperator
from pxmcmc_tpu.mcmc import MYULA, PxMCMCParams
from pxmcmc_tpu.measurements import Identity
from pxmcmc_tpu.ops.threshold import myula_fused_step, soft_threshold_pallas
from pxmcmc_tpu.prior import L1
from pxmcmc_tpu.transforms import IdentityTransform
from pxmcmc_tpu.utils import soft

ON_TPU = jax.default_backend() != "cpu"


def _fused(*args, **kw):
    if ON_TPU:
        return myula_fused_step(*args, **kw)
    with pltpu.force_tpu_interpret_mode():
        return myula_fused_step(*args, **kw)


def test_soft_threshold_pallas_matches_reference():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((4, 300)), dtype=jnp.float32)
    T = jnp.asarray(np.abs(rng.standard_normal(300)), dtype=jnp.float32)
    out = np.asarray(soft_threshold_pallas(X, T, interpret=not ON_TPU))
    ref = np.asarray(soft(X, T))
    assert np.allclose(out, ref, atol=1e-6)


def test_fused_step_update_arithmetic():
    """In interpret mode noise is zero, so the update must match the
    deterministic part of the MYULA formula exactly."""
    rng = np.random.default_rng(1)
    nc, n = 3, 500
    X = jnp.asarray(rng.standard_normal((nc, n)), dtype=jnp.float32)
    g = jnp.asarray(rng.standard_normal((nc, n)), dtype=jnp.float32)
    delta, lmda = 1e-2, 2e-2
    T = jnp.asarray(np.abs(rng.standard_normal(n)), dtype=jnp.float32)

    out = np.asarray(_fused(X, g, T, delta, lmda, 7))
    out_b = np.asarray(_fused(X, g, T, delta, lmda, 7))
    assert np.array_equal(out, out_b)  # deterministic for fixed seed

    if not ON_TPU:
        # interpreter stubs the PRNG to zero bits -> the Box-Muller "noise"
        # is the deterministic constant w0; check the exact closed form
        u0 = 0.5 / (1 << 24)
        w0 = np.sqrt(-2 * np.log(u0)) * np.cos(2 * np.pi * u0)
        expected = (
            (1 - delta / lmda) * np.asarray(X)
            + (delta / lmda) * np.asarray(soft(X, T))
            - delta * np.asarray(g)
            + np.sqrt(2 * delta) * w0
        )
        assert np.allclose(out, expected, atol=1e-5)


def test_fused_step_prox_difference():
    """T-difference isolates the prox term exactly (same seed, same noise)."""
    rng = np.random.default_rng(2)
    nc, n = 2, 300
    X = jnp.asarray(rng.standard_normal((nc, n)), dtype=jnp.float32)
    g = jnp.zeros((nc, n), jnp.float32)
    delta, lmda = 1e-2, 2e-2
    T1 = jnp.asarray(np.abs(rng.standard_normal(n)), dtype=jnp.float32)
    T2 = T1 * 0.5
    a1 = np.asarray(_fused(X, g, T1, delta, lmda, 7))
    a2 = np.asarray(_fused(X, g, T2, delta, lmda, 7))
    expected = (delta / lmda) * (np.asarray(soft(X, T1)) - np.asarray(soft(X, T2)))
    assert np.allclose(a1 - a2, expected, atol=1e-5)


@pytest.mark.skipif(not ON_TPU, reason="on-core PRNG only runs on real TPU")
def test_fused_step_noise_moments_tpu():
    """With X=0, g=0, huge T: X' is pure noise ~ N(0, 2 delta)."""
    nc, n = 4, 4096
    X = jnp.zeros((nc, n), dtype=jnp.float32)
    g = jnp.zeros((nc, n), dtype=jnp.float32)
    delta = 0.125
    out = np.asarray(myula_fused_step(X, g, 1e9, delta, 1.0, 123))
    assert abs(out.mean()) < 0.02
    assert np.isclose(out.var(), 2 * delta, rtol=0.05)
    out2 = np.asarray(myula_fused_step(X, g, 1e9, delta, 1.0, 124))
    assert not np.allclose(out, out2)


def test_myula_refuses_fused_on_cpu(simpledata):
    """fused_step must silently fall back to the jax.random path on CPU."""
    n = len(simpledata)
    fwd = ForwardOperator(
        simpledata, 0.5, "synthesis", IdentityTransform(), Identity(n, n), nparams=n
    )
    prox = L1("synthesis", None, None, 1e-8)
    params = PxMCMCParams(nsamples=5, nburn=0, ngap=1, verbosity=0,
                          delta=1e-2, lmda=2e-2, fused_step=True)
    mcmc = MYULA(fwd, prox, params)
    if jax.default_backend() == "cpu":
        assert not mcmc._can_fuse()
    mcmc.run()
    # samples must actually be stochastic
    assert mcmc.chain[0].std() > 0
    assert not np.allclose(mcmc.chain[0], mcmc.chain[-1])


# ---------------------------------------------------------------------------
# Fused (m, chain-tile) Gram-gradient pipeline (ops/pallas_gram.py)
# ---------------------------------------------------------------------------


def _gram_fixtures(L=64, B=1.5, J_min=2, C=3, seed=0):
    from pxmcmc_tpu.ops import sht, wavelets
    from pxmcmc_tpu.ops.pallas_gram import build_gram_pallas_plan

    wb = wavelets.get_wavelet_basis(L, B, J_min)
    gram = sht.get_gram(L, 0)
    plan = build_gram_pallas_plan(wb, gram)
    rng = np.random.default_rng(seed)
    blocks = tuple(
        jnp.asarray(
            rng.standard_normal((C, int(b) * (2 * int(b) - 1))), jnp.float32
        )
        for b in wb.bandlimits
    )
    return wb, gram, plan, blocks


def test_pallas_gram_gradient_matches_xla_blocks():
    """The fused kernel is the same linear operator as the XLA grid chain
    (sums associate differently -> f32-roundoff tolerance)."""
    from pxmcmc_tpu.ops import wavelets
    from pxmcmc_tpu.ops.pallas_gram import gram_gradient_real_blocks_pallas

    wb, gram, plan, blocks = _gram_fixtures()
    assert plan is not None and len(plan.big_bl) >= 1
    ref = wavelets.gram_gradient_real_blocks(blocks, wb, gram)
    out = gram_gradient_real_blocks_pallas(blocks, wb, plan)
    for r, o in zip(ref, out):
        r, o = np.asarray(r), np.asarray(o)
        scale = np.abs(r).max()
        assert np.abs(r - o).max() <= 1e-5 * scale


def test_pallas_gram_gradient_odd_batch_and_no_big_scales():
    """Batch sizes that don't tile evenly pad+slice correctly; bases whose
    scales all sit below the cutoff return a None plan (XLA fallback)."""
    from pxmcmc_tpu.ops import sht, wavelets
    from pxmcmc_tpu.ops.pallas_gram import (
        build_gram_pallas_plan,
        gram_gradient_real_blocks_pallas,
    )

    wb, gram, plan, _ = _gram_fixtures(C=1)
    rng = np.random.default_rng(1)
    blocks = tuple(
        jnp.asarray(
            rng.standard_normal((5, int(b) * (2 * int(b) - 1))), jnp.float32
        )
        for b in wb.bandlimits
    )
    ref = wavelets.gram_gradient_real_blocks(blocks, wb, gram)
    out = gram_gradient_real_blocks_pallas(blocks, wb, plan)
    for r, o in zip(ref, out):
        r, o = np.asarray(r), np.asarray(o)
        assert np.abs(r - o).max() <= 1e-5 * np.abs(r).max()

    wb_small = wavelets.get_wavelet_basis(16, 1.5, 2)
    assert build_gram_pallas_plan(wb_small, sht.get_gram(16, 0)) is None


def test_myula_sampler_equal_with_and_without_pallas_gram(monkeypatch, tmp_path):
    """A short MYULA run at a fusable bandlimit stays within roundoff drift
    of the XLA-gradient run (same keys, same noise stream)."""
    from pxmcmc_tpu.transforms import SphericalWaveletTransform

    L = 64
    rng = np.random.default_rng(3)
    data = jnp.asarray(
        rng.standard_normal(L * (2 * L - 1)), dtype=jnp.float32
    )
    results = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("PXMCMC_GRAM_PALLAS", flag)
        tr = SphericalWaveletTransform(L, 1.5, 2)
        fwd = ForwardOperator(
            data, 0.5, "synthesis", transform=tr,
            measurement=Identity(data.size, data.size), nparams=tr.ncoefs,
        )
        params = PxMCMCParams(
            nsamples=4, nburn=0, ngap=2, nchains=2, delta=1e-6, mu=1.0,
            complex=False, verbosity=0, track=["chain"],
        )
        mcmc = MYULA(fwd, L1("synthesis", tr.forward, tr.forward_adjoint,
                             params.lmda * params.mu), params)
        mcmc.run()
        results[flag] = np.asarray(mcmc.chain)
        if flag == "1":
            assert getattr(mcmc, "_gram_pallas_plan", None) is not None
    scale = np.abs(results["0"]).max()
    assert np.abs(results["1"] - results["0"]).max() <= 1e-4 * scale

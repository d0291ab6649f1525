"""Pyramid state layout: per-scale state tuple == flat state, exactly.

``PxMCMCParams(pyramid_state=True)`` carries the sampled coefficient
pyramid as a tuple of per-scale segments (MYULA + Gram fast path), removing
the per-step concatenate from the hot loop (BENCH.md round 3).  These tests
pin that every deterministic piece of the pyramid step is numerically
identical to the flat layout; only the noise stream differs (per-scale
draws, identically distributed).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pxmcmc_tpu.forward import SphericalWaveletTransformOperator
from pxmcmc_tpu.mcmc import MYULA, PxMCMCParams
from pxmcmc_tpu.ops import wavelets
from pxmcmc_tpu.prior import S2_Wavelets_L1


def _sampler(simpledata, L, B, J_min, pyramid, nchains=3):
    fwd = SphericalWaveletTransformOperator(
        simpledata, 0.1, "synthesis", L, B, J_min
    )
    params = PxMCMCParams(
        nsamples=4, nburn=2, ngap=2, verbosity=0, lmda=1e-6, delta=1e-7,
        nchains=nchains, pyramid_state=pyramid,
    )
    prior = S2_Wavelets_L1(
        "synthesis", fwd.transform.inverse, fwd.transform.inverse_adjoint,
        params.lmda, L=L, B=B, J_min=J_min,
    )
    return MYULA(fwd, prior, params)


def test_gram_gradient_blocks_match_flat(simpledata, L, B, J_min, rng):
    s = _sampler(simpledata, L, B, J_min, pyramid=True)
    s._prepare()
    X = jnp.asarray(rng.standard_normal((3, s.forward.nparams)))
    flat = s._gram_gradg(X)
    blocks = s._gram_gradg_blocks(s._split_X(X))
    np.testing.assert_allclose(
        np.asarray(s._flatten_X(blocks)), np.asarray(flat),
        rtol=1e-10, atol=1e-12,
    )


def test_gram_fused_qg_matches_unfused(simpledata, L, B, J_min, rng, monkeypatch):
    """PXMCMC_GRAM_FUSED=1 precomposes the Gram apply into the adjoint
    theta tables (build_gram_qg); the gradient must equal the unfused
    chain (same linear operator, different summation association)."""
    monkeypatch.setenv("PXMCMC_GRAM_FUSED", "1")
    s = _sampler(simpledata, L, B, J_min, pyramid=True)
    s._prepare()
    assert getattr(s, "_gram_qg", None) is not None
    X = jnp.asarray(rng.standard_normal((3, s.forward.nparams)))
    fused = s._gram_gradg_blocks(s._split_X(X))
    s._gram_qg = None
    unfused = s._gram_gradg_blocks(s._split_X(X))
    for f, u in zip(fused, unfused):
        np.testing.assert_allclose(np.asarray(f), np.asarray(u),
                                   rtol=1e-9, atol=1e-11)


def test_pyramid_step_equals_manual_flat(simpledata, L, B, J_min, rng):
    """One pyramid step == the flat-layout update evaluated with the same
    per-scale noise draws (gradient, threshold and update all exact)."""
    s = _sampler(simpledata, L, B, J_min, pyramid=True)
    s._prepare()
    assert s._pyramid_ok()
    X = jnp.asarray(rng.standard_normal((3, s.forward.nparams)))
    state = s._init_state(X, None)
    assert isinstance(state.X, tuple)
    key = jax.random.key(7)
    out, _ = jax.jit(s._build_step())(state, key)

    # manual flat computation with the identical noise stream
    gradg = s._gram_gradg(X)
    proxf = s.prior.proxf(X)
    w = jnp.concatenate(
        [
            jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
            .reshape(x.shape[0], -1)
            for i, x in enumerate(state.X)
        ],
        axis=-1,
    )
    expected = s.chain_step(X, proxf, gradg, w)
    np.testing.assert_allclose(
        np.asarray(s._flatten_X(out.X)), np.asarray(expected),
        rtol=1e-10, atol=1e-12,
    )


def test_pyramid_run_end_to_end(simpledata, L, B, J_min, tmp_path):
    """Full run() with tracking + summary; mid-run checkpoint resume of the
    pyramid tuple state reproduces an uninterrupted run exactly."""
    track = ["logposterior", "L2", "prior", "chain", "summary"]

    # uninterrupted 4-sample run (the oracle)
    s = _sampler(simpledata, L, B, J_min, pyramid=True)
    s.track = track
    s.run()
    assert np.isfinite(s.logPi).all()
    assert s.chain.shape == (4, 3, s.forward.nparams)
    assert s.posterior_mean.shape[-1] == s.forward.nparams

    # first half: stop after 2 samples, leaving a mid-run checkpoint
    ckpt = str(tmp_path / "ck.npz")
    s1 = _sampler(simpledata, L, B, J_min, pyramid=True)
    s1.track = track
    s1.nsamples = 2
    s1.run(checkpoint_path=ckpt, checkpoint_every=2, superblock=2)
    np.testing.assert_allclose(s1.chain, s.chain[:2], rtol=1e-10)

    # second half: resume the pyramid tuple state through load_checkpoint's
    # template-driven leaf restore and finish the run
    s2 = _sampler(simpledata, L, B, J_min, pyramid=True)
    s2.track = track
    s2.run(checkpoint_path=ckpt, superblock=2)
    np.testing.assert_allclose(s2.chain, s.chain, rtol=1e-10)
    np.testing.assert_allclose(s2.posterior_mean, s.posterior_mean, rtol=1e-8)


def _wl_sampler(L, B, J_min, rng, pyramid):
    from pxmcmc_tpu.forward import ForwardOperator
    from pxmcmc_tpu.measurements import WeakLensing
    from pxmcmc_tpu.transforms import SphericalWaveletTransform
    from pxmcmc_tpu.utils import build_mask

    mask = build_mask(L, size=30)
    meas = WeakLensing(L, mask, ngal=np.full_like(mask, 30.0))
    tr = SphericalWaveletTransform(L, B, J_min)
    gammas = (rng.standard_normal(meas.ndata)
              + 1j * rng.standard_normal(meas.ndata)) * 0.01
    fwd = ForwardOperator(
        gammas, np.full(meas.ndata, 0.1), "synthesis",
        transform=tr, measurement=meas, nparams=tr.ncoefs,
    )
    params = PxMCMCParams(
        nsamples=2, nburn=0, ngap=1, verbosity=0, lmda=1e-6, delta=1e-8,
        nchains=2, pyramid_state=pyramid,
    )
    prior = S2_Wavelets_L1(
        "synthesis", tr.inverse, tr.inverse_adjoint, params.lmda,
        L=L, B=B, J_min=J_min,
    )
    return MYULA(fwd, prior, params)


def test_pyramid_weaklensing_step_equals_manual(L, B, J_min, rng):
    """WL fast path with pyramid state: gradient/forward block forms match
    the flat stacked-real chain exactly; one step == the manual update."""
    s = _wl_sampler(L, B, J_min, rng, pyramid=True)
    s._prepare()
    assert s._pyramid_ok() and not s._gram_ok()
    X = jnp.asarray(rng.standard_normal((2, s.forward.nparams)))
    preds = s.forward.forward_internal(X)
    np.testing.assert_allclose(
        np.asarray(s.forward.forward_internal_blocks(s._split_X(X))),
        np.asarray(preds), rtol=1e-10, atol=1e-12,
    )
    state = s._init_state(X, preds)
    assert isinstance(state.X, tuple) and state.preds is not None
    key = jax.random.key(3)
    out, _ = jax.jit(s._build_step())(state, key)

    gradg = s._cast(s.forward.gradg_internal(preds))
    proxf = s.prior.proxf(X)
    w = jnp.concatenate(
        [
            jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
            .reshape(x.shape[0], -1)
            for i, x in enumerate(state.X)
        ],
        axis=-1,
    )
    expected = s.chain_step(X, proxf, gradg, w)
    np.testing.assert_allclose(
        np.asarray(s._flatten_X(out.X)), np.asarray(expected),
        rtol=1e-10, atol=1e-12,
    )
    # carried predictions equal the forward of the new state
    np.testing.assert_allclose(
        np.asarray(out.preds),
        np.asarray(s.forward.forward_internal(expected)), rtol=1e-8, atol=1e-10,
    )


def test_pyramid_weaklensing_run(L, B, J_min, rng):
    s = _wl_sampler(L, B, J_min, rng, pyramid=True)
    s.run()
    assert np.isfinite(s.logPi).all()


def _pxmala_sampler(simpledata, L, B, J_min, pyramid, nchains=3):
    from pxmcmc_tpu.mcmc import PxMALA

    fwd = SphericalWaveletTransformOperator(
        simpledata, 0.1, "synthesis", L, B, J_min
    )
    params = PxMCMCParams(
        nsamples=4, nburn=2, ngap=2, verbosity=0, lmda=1e-6, delta=1e-7,
        nchains=nchains, pyramid_state=pyramid,
    )
    prior = S2_Wavelets_L1(
        "synthesis", fwd.transform.inverse, fwd.transform.inverse_adjoint,
        params.lmda, L=L, B=B, J_min=J_min,
    )
    return PxMALA(fwd, prior, params)


def test_pxmala_pyramid_step_equals_manual_flat(simpledata, L, B, J_min, rng):
    """One pyramid PxMALA step == the flat-layout MH update evaluated with
    the same per-block noise draws: proposal, fidelity, prior, transition
    kernel and accept/reject all agree."""
    s = _pxmala_sampler(simpledata, L, B, J_min, pyramid=True)
    s._prepare()
    assert s._pyramid_ok()
    X = jnp.asarray(rng.standard_normal((3, s.forward.nparams)))
    state = s._init_state(X, None)
    assert isinstance(state.X, tuple)
    # init-state scalars match the flat init exactly (summation order aside)
    s_flat = _pxmala_sampler(simpledata, L, B, J_min, pyramid=False)
    s_flat._prepare()
    state_flat = s_flat._init_state(X, None)
    np.testing.assert_allclose(
        np.asarray(state.L2), np.asarray(state_flat.L2), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(state.prior), np.asarray(state_flat.prior), rtol=1e-10
    )

    key = jax.random.key(11)
    out, (accept, deltas) = jax.jit(s._build_step())(state, key)

    # manual flat computation with the identical per-block noise stream
    kn, ka = jax.random.split(key)
    w = jnp.concatenate(
        [
            jax.random.normal(jax.random.fold_in(kn, i), x.shape, x.dtype)
            .reshape(x.shape[0], -1)
            for i, x in enumerate(state.X)
        ],
        axis=-1,
    )
    d = state_flat.delta[..., None]
    X_prop = (
        (1 - d / s.lmda) * X
        + (d / s.lmda) * state_flat.proxf
        - d * state_flat.gradg
        + jnp.sqrt(2 * d) * w
    )
    gradg_prop = s_flat._gram_gradg(X_prop)
    L2Xp = s_flat._gram_fidelity(X_prop, gradg_prop)
    priorXp = s_flat.prior.prior(X_prop)
    logalpha = (
        s_flat.calc_logtransition(
            X_prop, X, s_flat.prior.proxf(X_prop), gradg_prop, state_flat.delta
        )
        + s_flat._logtarget(priorXp, L2Xp)
        - s_flat.calc_logtransition(
            X, X_prop, state_flat.proxf, state_flat.gradg, state_flat.delta
        )
        - s_flat._logtarget(state_flat.prior, state_flat.L2)
    )
    u = jax.random.uniform(ka, logalpha.shape, dtype=X.dtype)
    exp_accept = jnp.log(u) < logalpha
    expected = jnp.where(exp_accept[:, None], X_prop, X)
    np.testing.assert_array_equal(np.asarray(accept[0]), np.asarray(exp_accept))
    np.testing.assert_allclose(
        np.asarray(s._flatten_X(out.X)), np.asarray(expected),
        rtol=1e-8, atol=1e-10,
    )


def test_pxmala_pyramid_run_and_traces(simpledata, L, B, J_min):
    s = _pxmala_sampler(simpledata, L, B, J_min, pyramid=True)
    s.run()
    assert np.isfinite(s.logPi).all()
    assert s.acceptance_trace.shape == (8, 3)
    assert np.isfinite(s.deltas_trace).all()


def test_skrock_pyramid_step_equals_manual_flat(simpledata, L, B, J_min, rng):
    """One pyramid SK-ROCK step == the flat linear recursion with the same
    per-block noise."""
    from pxmcmc_tpu.mcmc import SKROCK

    fwd = SphericalWaveletTransformOperator(
        simpledata, 0.1, "synthesis", L, B, J_min
    )
    params = PxMCMCParams(
        nsamples=2, nburn=0, ngap=1, verbosity=0, lmda=1e-6, delta=1e-8,
        nchains=3, s=4, pyramid_state=True,
    )
    prior = S2_Wavelets_L1(
        "synthesis", fwd.transform.inverse, fwd.transform.inverse_adjoint,
        params.lmda, L=L, B=B, J_min=J_min,
    )
    s = SKROCK(fwd, prior, params)
    s._prepare()
    assert s._pyramid_ok()
    X = jnp.asarray(rng.standard_normal((3, s.forward.nparams)))
    state = s._init_state(X, None)
    assert isinstance(state.X, tuple)
    key = jax.random.key(5)
    out, _ = jax.jit(s._build_step())(state, key)

    Z = jnp.concatenate(
        [
            jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
            .reshape(x.shape[0], -1)
            for i, x in enumerate(state.X)
        ],
        axis=-1,
    )
    expected = s.chain_step(X, Z)  # flat linear recursion (gram path)
    np.testing.assert_allclose(
        np.asarray(s._flatten_X(out.X)), np.asarray(expected),
        rtol=1e-7, atol=1e-9,
    )


def test_record_blocks_only_chain_matches_flat_record(simpledata, L, B, J_min):
    """Recording the chain as per-scale blocks (track without logposterior)
    yields the same stored samples as the flatten-at-record path — recording
    must not change the dynamics or the values."""
    a = _sampler(simpledata, L, B, J_min, pyramid=True)
    a.track = ["chain"]
    a.run()
    b = _sampler(simpledata, L, B, J_min, pyramid=True)
    b.track = ["logposterior", "chain"]
    b.run()
    np.testing.assert_allclose(a.chain, b.chain, rtol=1e-12)


def test_analysis_block_prox_matches_generic(simpledata, L, B, J_min, rng):
    """The block-form analysis prox (transform-bound handles) equals the
    generic handle-based path exactly."""
    fwd = SphericalWaveletTransformOperator(
        simpledata, 0.1, "analysis", L, B, J_min
    )
    tr = fwd.transform
    p_block = S2_Wavelets_L1(
        "analysis", tr.inverse, tr.inverse_adjoint, 1e-3, L=L, B=B, J_min=J_min
    )
    assert p_block._analysis_block_basis() is not None
    # identical weights, but opaque lambda handles -> generic path
    p_generic = S2_Wavelets_L1(
        "analysis", lambda x: tr.inverse(x), lambda x: tr.inverse_adjoint(x),
        1e-3, L=L, B=B, J_min=J_min,
    )
    assert p_generic._analysis_block_basis() is None
    X = jnp.asarray(rng.standard_normal((2, fwd.nparams)))
    np.testing.assert_allclose(
        np.asarray(p_block.proxf(X)), np.asarray(p_generic.proxf(X)),
        rtol=1e-10, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(p_block.prior(X)), np.asarray(p_generic.prior(X)),
        rtol=1e-10,
    )


def test_pyramid_off_for_analysis_setting(simpledata, L, B, J_min):
    """Analysis-setting priors have no per-scale soft threshold — the flag
    is ignored and the flat layout runs."""
    from pxmcmc_tpu.forward import SphericalWaveletTransformOperator

    fwd = SphericalWaveletTransformOperator(
        simpledata, 0.1, "analysis", L, B, J_min
    )
    params = PxMCMCParams(
        nsamples=2, nburn=0, ngap=1, verbosity=0, lmda=1e-6, delta=1e-8,
        nchains=2, pyramid_state=True,
    )
    prior = S2_Wavelets_L1(
        "analysis", fwd.transform.inverse, fwd.transform.inverse_adjoint,
        params.lmda, L=L, B=B, J_min=J_min,
    )
    s = MYULA(fwd, prior, params)
    assert not s._pyramid_ok()
    s.run()
    assert np.isfinite(s.logPi).all()

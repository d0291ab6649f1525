"""Sampler tests: smoke runs (ref `/root/reference/tests/test_mcmc.py`) plus
statistical assertions the reference lacks (Gaussian-target moment checks,
multi-chain batching)."""
import jax.numpy as jnp
import numpy as np
import pytest

from pxmcmc_tpu.forward import ForwardOperator
from pxmcmc_tpu.mcmc import MYULA, SKROCK, PxMALA, PxMCMCParams
from pxmcmc_tpu.measurements import Identity
from pxmcmc_tpu.prior import L1
from pxmcmc_tpu.transforms import IdentityTransform


@pytest.fixture
def forwardop(simpledata, setting, sig_d):
    ndata = nparams = len(simpledata)
    return ForwardOperator(
        simpledata,
        sig_d,
        setting,
        IdentityTransform(),
        Identity(ndata, nparams),
        nparams=nparams,
    )


@pytest.fixture
def prox(forwardop, setting):
    return L1(
        setting, forwardop.transform.inverse, forwardop.transform.inverse_adjoint, 1
    )


@pytest.fixture
def mcmcparams():
    return PxMCMCParams(nsamples=100, nburn=10, ngap=5, verbosity=0, s=5)


@pytest.fixture(params=["myula", "pxmala", "skrock"])
def algo(request, forwardop, prox, mcmcparams):
    cls = {"myula": MYULA, "pxmala": PxMALA, "skrock": SKROCK}[request.param]
    return cls(forwardop, prox, mcmcparams)


def test_algorithms(algo):
    algo.run()
    assert algo.chain.shape == (100, 1, algo.forward.nparams)
    assert np.isfinite(algo.logPi).all()
    assert np.isfinite(algo.chain).all()


def test_initial_sample(algo, simpledata):
    algo.run(simpledata)


def test_initial_sample_failure(algo, simpledata):
    with pytest.raises(Exception):
        algo.run(simpledata[:5])


def test_burn_chunk_invariance(forwardop, prox, monkeypatch):
    """Burn-in executes in bounded chunks (one device program per chunk, so
    relayed backends never see a multi-minute dispatch); per-step keys come
    from the absolute burn index, so the chain is bit-identical under any
    chunk size."""
    params = PxMCMCParams(nsamples=6, nburn=25, ngap=2, verbosity=0, nchains=2)
    a = MYULA(forwardop, prox, params, seed=4)
    a.run()
    monkeypatch.setenv("PXMCMC_BURN_CHUNK", "7")
    b = MYULA(forwardop, prox, params, seed=4)
    b.run()
    np.testing.assert_array_equal(a.chain, b.chain)


def test_multichain(forwardop, prox):
    params = PxMCMCParams(nsamples=20, nburn=5, ngap=2, verbosity=0, nchains=4)
    mcmc = MYULA(forwardop, prox, params)
    mcmc.run()
    assert mcmc.chain.shape == (20, 4, forwardop.nparams)
    # chains must differ (independent noise streams)
    assert not np.allclose(mcmc.chain[:, 0], mcmc.chain[:, 1])


def test_complex_sampling(simpledata, rng):
    data = simpledata + 1j * rng.standard_normal(len(simpledata))
    nparams = len(data)
    fwd = ForwardOperator(
        data, 0.1, "synthesis", IdentityTransform(), Identity(nparams, nparams),
        nparams=nparams,
    )
    prox = L1("synthesis", None, None, 1)
    params = PxMCMCParams(
        nsamples=10, nburn=5, ngap=2, verbosity=0, complex=True, delta=1e-5, lmda=1e-4
    )
    mcmc = MYULA(fwd, prox, params)
    mcmc.run()
    assert np.iscomplexobj(mcmc.chain)
    assert np.isfinite(mcmc.chain).all()


def test_myula_targets_gaussian_posterior():
    """With a negligible L1 weight the drift -delta (x-y)/sigma^2 targets the
    Gaussian likelihood N(y, sigma^2 I); MYULA moments must land near it.
    (Statistical check absent from the reference test suite.)"""
    n = 16
    y = np.linspace(-1, 1, n)
    sigma = 0.5
    fwd = ForwardOperator(
        y, sigma, "synthesis", IdentityTransform(), Identity(n, n), nparams=n
    )
    prox = L1("synthesis", None, None, 1e-8)
    params = PxMCMCParams(
        nsamples=4000, nburn=500, ngap=5, verbosity=0, delta=2e-2, lmda=5e-2,
        mu=1e-6, nchains=2,
    )
    mcmc = MYULA(fwd, prox, params)
    mcmc.run()
    samples = mcmc.chain.reshape(-1, n)
    mean = samples.mean(axis=0)
    var = samples.var(axis=0)
    assert np.allclose(mean, y, atol=0.15)
    assert np.allclose(var, sigma ** 2, rtol=0.5)


def test_pxmala_target_conventions_gaussian():
    """The two PxMALA acceptance targets sample the posteriors their
    conventions imply (MH corrects any proposal toward its target):

    - target='consistent' (default): exp(-L2/2) -> variance sigma^2
    - target='reference' (ref mcmc.py:242-245): exp(-L2) -> variance sigma^2/2

    This is the measured adjudication of the reference's drift/target
    mismatch recorded in PARITY.md.
    """
    n = 16
    y = np.linspace(-1, 1, n)
    sigma = 0.5
    fwd = ForwardOperator(
        y, sigma, "synthesis", IdentityTransform(), Identity(n, n), nparams=n
    )
    prox = L1("synthesis", None, None, 1e-8)
    kw = dict(nsamples=4000, nburn=500, ngap=5, verbosity=0, delta=2e-2,
              lmda=5e-2, mu=1e-6, nchains=2)

    got = {}
    for target in ("consistent", "reference"):
        mcmc = PxMALA(fwd, prox, PxMCMCParams(**kw), seed=5, target=target)
        mcmc.run()
        samples = mcmc.chain.reshape(-1, n)
        got[target] = (samples.mean(axis=0), samples.var(axis=0))
        assert np.allclose(got[target][0], y, atol=0.15)
    assert np.allclose(got["consistent"][1], sigma**2, rtol=0.5)
    assert np.allclose(got["reference"][1], sigma**2 / 2, rtol=0.5)
    # the two conventions are distinguishable: variance ratio near 2
    ratio = np.median(got["consistent"][1] / got["reference"][1])
    assert 1.5 < ratio < 2.6, ratio


def test_pxmala_acceptance_tuning(forwardop, prox):
    params = PxMCMCParams(nsamples=50, nburn=10, ngap=2, verbosity=0, delta=1e-4)
    mcmc = PxMALA(forwardop, prox, params, tune_delta=True)
    mcmc.run()
    assert mcmc.acceptance_trace is not None
    acc = mcmc.acceptance_trace.mean()
    assert 0.0 <= acc <= 1.0
    assert mcmc.deltas_trace.shape == mcmc.acceptance_trace.shape
    # tuned deltas stay in the clamp range (ref mcmc.py:279)
    assert (mcmc.deltas_trace >= mcmc.lmda * 1e-8).all()
    assert (mcmc.deltas_trace <= mcmc.lmda / 2).all()


def test_skrock_coefficients_sane():
    """SK-ROCK stage polynomial consistency: k_j = 1 - nu_j for j >= 2."""
    n = 8
    fwd = ForwardOperator(
        np.ones(n), 1.0, "synthesis", IdentityTransform(), Identity(n, n), nparams=n
    )
    prox = L1("synthesis", None, None, 1)
    mcmc = SKROCK(fwd, prox, PxMCMCParams(nsamples=1, nburn=0, ngap=1, verbosity=0, s=10))
    for j in range(2, 11):
        assert np.isclose(mcmc.ks[j], 1 - mcmc.nus[j])


def test_skrock_targets_gaussian_posterior():
    """SK-ROCK moments on an exact Gaussian target (validates the linear
    Chebyshev recursion end-to-end, not just coefficient identities)."""
    n = 16
    y = np.linspace(-1, 1, n)
    sigma = 0.5
    fwd = ForwardOperator(
        y, sigma, "synthesis", IdentityTransform(), Identity(n, n), nparams=n
    )
    prox = L1("synthesis", None, None, 1e-9)
    params = PxMCMCParams(
        nsamples=3000, nburn=500, ngap=5, verbosity=0, delta=5e-3, lmda=5e-2,
        mu=1e-9, s=6, nchains=2,
    )
    mcmc = SKROCK(fwd, prox, params)
    mcmc.run()
    samples = mcmc.chain.reshape(-1, n)
    assert np.allclose(samples.mean(axis=0), y, atol=0.15)
    assert np.allclose(samples.var(axis=0), sigma ** 2, rtol=0.5)


def test_analysis_setting_wavelet_sampling(simpledata, L, B, J_min):
    """Full analysis-setting run with the wavelet transform: the prox pulls
    X through the synthesis/adjoint pair (ref prior.py:49-53)."""
    from pxmcmc_tpu.forward import SphericalWaveletTransformOperator

    fwd = SphericalWaveletTransformOperator(simpledata, 0.1, "analysis", L, B, J_min)
    prox = L1(
        "analysis", fwd.transform.inverse, fwd.transform.inverse_adjoint, 1e-5
    )
    params = PxMCMCParams(nsamples=10, nburn=2, ngap=2, verbosity=0,
                          delta=1e-4, lmda=1e-4)
    mcmc = MYULA(fwd, prox, params)
    mcmc.run()
    assert mcmc.chain.shape == (10, 1, fwd.nparams)
    assert fwd.nparams == len(simpledata)  # analysis samples pixel space
    assert np.isfinite(mcmc.chain).all()


def test_gram_fast_path_matches_standard(simpledata, L, B, J_min):
    """The Gram-table gradient path must reproduce the standard pixel-space
    chain exactly (same seeds -> same samples)."""
    from pxmcmc_tpu.forward import SphericalWaveletTransformOperator
    from pxmcmc_tpu.prior import S2_Wavelets_L1

    kw = dict(nsamples=15, nburn=5, ngap=2, verbosity=0, delta=1e-4, lmda=1e-4,
              nchains=2, pyramid_state=False)  # both sides on the flat stream

    def build(sig_d):
        fwd = SphericalWaveletTransformOperator(simpledata, sig_d, "synthesis",
                                                L, B, J_min)
        params = PxMCMCParams(**kw)
        prior = S2_Wavelets_L1(
            "synthesis", fwd.transform.inverse, fwd.transform.inverse_adjoint,
            params.lmda * params.mu, L=L, B=B, J_min=J_min,
        )
        return MYULA(fwd, prior, params, seed=11)

    fast = build(0.1)
    assert fast._gram_ok()
    fast.run()

    slow = build(0.1)
    slow._gram_ok = lambda: False  # force the pixel-space chain
    slow.run()

    assert np.allclose(fast.chain, slow.chain, atol=1e-10), np.abs(
        fast.chain - slow.chain
    ).max()
    assert np.allclose(fast.logPi, slow.logPi, atol=1e-8)

    # vector noise disables the fast path
    vec = build(np.full(len(simpledata), 0.1))
    assert not vec._gram_ok()
    vec.run()
    assert np.isfinite(vec.chain).all()


def test_pxmala_gram_path_matches_standard(simpledata, L, B, J_min):
    """PxMALA's coefficient-space fidelity (Gram path) reproduces the
    pixel-space chain exactly."""
    from pxmcmc_tpu.forward import SphericalWaveletTransformOperator
    from pxmcmc_tpu.prior import S2_Wavelets_L1

    kw = dict(nsamples=12, nburn=4, ngap=2, verbosity=0, delta=1e-4, lmda=1e-4,
              nchains=2, pyramid_state=False)  # both sides on the flat stream

    def build():
        fwd = SphericalWaveletTransformOperator(simpledata, 0.1, "synthesis",
                                                L, B, J_min)
        params = PxMCMCParams(**kw)
        prior = S2_Wavelets_L1(
            "synthesis", fwd.transform.inverse, fwd.transform.inverse_adjoint,
            params.lmda * params.mu, L=L, B=B, J_min=J_min,
        )
        return PxMALA(fwd, prior, params, seed=13)

    fast = build()
    assert fast._gram_ok()
    fast.run()

    slow = build()
    slow._gram_ok = lambda: False
    slow.run()

    assert np.allclose(fast.chain, slow.chain, atol=1e-9), np.abs(
        fast.chain - slow.chain
    ).max()
    assert np.array_equal(fast.acceptance_trace, slow.acceptance_trace)
    assert np.allclose(fast.L2s, slow.L2s, atol=1e-7)


def test_skrock_gram_path_matches_standard(simpledata, L, B, J_min):
    """SKROCK's per-stage gradients through the Gram tables reproduce the
    pixel-space chain exactly."""
    from pxmcmc_tpu.forward import SphericalWaveletTransformOperator
    from pxmcmc_tpu.prior import S2_Wavelets_L1

    kw = dict(nsamples=8, nburn=2, ngap=2, verbosity=0, delta=1e-5, lmda=1e-5,
              s=4, nchains=2, pyramid_state=False)  # both sides on the flat stream

    def build():
        fwd = SphericalWaveletTransformOperator(simpledata, 0.1, "synthesis",
                                                L, B, J_min)
        params = PxMCMCParams(**kw)
        prior = S2_Wavelets_L1(
            "synthesis", fwd.transform.inverse, fwd.transform.inverse_adjoint,
            params.lmda * params.mu, L=L, B=B, J_min=J_min,
        )
        return SKROCK(fwd, prior, params, seed=17)

    fast = build()
    assert fast._gram_ok()
    fast.run()
    slow = build()
    slow._gram_ok = lambda: False
    slow.run()
    assert np.allclose(fast.chain, slow.chain, atol=1e-9), np.abs(
        fast.chain - slow.chain
    ).max()

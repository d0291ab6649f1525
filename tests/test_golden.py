"""Golden regression test: the full sampling pipeline reproduces a pinned
posterior snapshot bit-for-bit (x64, fixed seeds).

Protects the whole chain (tiling, SHT tables, gradients, prox, PRNG
plumbing, scan structure) against silent numerical drift.  Regenerate
deliberately (see the script in the test body docstring) only when an
intentional numerics change lands.
"""
import os

import jax
import numpy as np

from pxmcmc_tpu.forward import SphericalWaveletTransformOperator
from pxmcmc_tpu.mcmc import MYULA, PxMCMCParams
from pxmcmc_tpu.ops import sht
from pxmcmc_tpu.prior import S2_Wavelets_L1
from tests.conftest import make_real_flm

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_myula_L16.npz")


def test_golden_posterior_reproduced():
    L, B, J_min = 16, 2, 2
    rng = np.random.default_rng(777)
    basis = sht.get_basis(L, 0, use_disk_cache=False)
    data = np.asarray(
        sht.inverse_real(jax.numpy.asarray(make_real_flm(L, rng)), basis)
    ).flatten()
    with np.load(GOLDEN) as z:
        assert np.allclose(data, z["data"], atol=1e-13), "input pipeline drifted"
        golden_mean = z["posterior_mean"]
        golden_logpi = z["logpi_last"]

    fwd = SphericalWaveletTransformOperator(data, 0.1, "synthesis", L, B, J_min)
    params = PxMCMCParams(
        nsamples=50, nburn=20, ngap=3, verbosity=0, delta=1e-4, lmda=1e-4, nchains=2
    )
    prior = S2_Wavelets_L1(
        "synthesis", fwd.transform.inverse, fwd.transform.inverse_adjoint,
        params.lmda * params.mu, L=L, B=B, J_min=J_min,
    )
    m = MYULA(fwd, prior, params, seed=99).run()
    mean = m.chain.mean(axis=(0, 1))
    assert np.allclose(mean, golden_mean, atol=1e-10), np.abs(mean - golden_mean).max()
    assert np.allclose(m.logPi[-1], golden_logpi, atol=1e-8)

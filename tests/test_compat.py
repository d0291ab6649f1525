"""Reference-import compatibility: code written for pxmcmc runs unmodified."""
import numpy as np


def test_reference_style_imports_work(simpledata):
    from pxmcmc.forward import ForwardOperator
    from pxmcmc.mcmc import MYULA, PxMCMCParams
    from pxmcmc.measurements import Identity
    from pxmcmc.prior import L1
    from pxmcmc.transforms import IdentityTransform

    n = len(simpledata)
    fwd = ForwardOperator(
        simpledata, 0.1, "synthesis", IdentityTransform(), Identity(n, n), nparams=n
    )
    prox = L1("synthesis", None, None, 1)
    mcmc = MYULA(fwd, prox, PxMCMCParams(nsamples=5, nburn=2, ngap=1, verbosity=0))
    mcmc.run()
    assert mcmc.chain.shape == (5, 1, n)
    assert np.isfinite(mcmc.chain).all()


def test_utils_compat():
    from pxmcmc import utils

    assert np.isclose(np.asarray(utils.soft(np.array([3.0]), 1))[0], 2.0)
    assert utils.chebyshev1(3, 5) == 3363

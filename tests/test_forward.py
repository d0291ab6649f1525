"""Forward operator tests (shapes + gradient consistency).

The reference tests only output shapes (`/root/reference/tests/test_forward.py:8-10`);
we additionally verify the gradient chain against JAX autodiff.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pxmcmc_tpu.forward import PathIntegralOperator, SphericalWaveletTransformOperator
from pxmcmc_tpu.ops import sampling


@pytest.fixture(params=["swt", "pathint"])
def operator(request, simpledata, sig_d, L, B, J_min, setting, rng):
    if request.param == "swt":
        return SphericalWaveletTransformOperator(simpledata, sig_d, setting, L, B, J_min)
    pathmatrix = rng.random((len(simpledata), sampling.sample_length(L)))
    return PathIntegralOperator(pathmatrix, simpledata, sig_d, setting, L, B, J_min)


def test_operator_forward(operator, rng):
    sample = rng.random(operator.nparams).astype(complex)
    preds = np.asarray(operator.forward(jnp.asarray(sample)))
    assert preds.shape[-1] == operator.data.shape[-1]


def test_operator_gradg(operator, rng):
    preds = rng.random(operator.data.shape[-1])
    gradg = np.asarray(operator.calc_gradg(jnp.asarray(preds)))
    assert gradg.shape[-1] == operator.nparams


def test_gradg_matches_autodiff(operator, rng):
    """A^H invcov (A X - y) equals the autodiff gradient of the fidelity.

    For real X, JAX computes d/dX of L2(X) directly; the adjoint-chain
    gradient (ref ``forward.py:66-72``) should agree up to the factor 2
    convention (the reference uses grad of (y-AX)^H C^-1 (y-AX) without the
    factor 2 — i.e. half the true gradient; we check proportionality exactly).
    """
    X = jnp.asarray(rng.random(operator.nparams))

    def fidelity(X):
        return operator.logpi_fidelity(operator.forward(X))

    auto = np.asarray(jax.grad(fidelity)(X))
    manual = np.asarray(operator.calc_gradg(operator.forward(X))).real
    assert np.allclose(auto, 2 * manual, atol=1e-8)


def test_invcov_matrix_branch(simpledata, setting, L, B, J_min):
    n = len(simpledata)
    cov = np.diag(np.full(n, 0.01))
    op = SphericalWaveletTransformOperator(simpledata, cov, setting, L, B, J_min)
    diff = jnp.asarray(np.ones(n))
    assert np.allclose(np.asarray(op.apply_invcov(diff)), 100.0)
    with pytest.raises(ValueError):
        SphericalWaveletTransformOperator(
            simpledata, np.ones((3, 4)), setting, L, B, J_min
        )

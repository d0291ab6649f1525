"""Prior / prox tests (mirrors `/root/reference/tests/test_proxes.py`)."""
import jax.numpy as jnp
import numpy as np
import pytest

from pxmcmc_tpu.prior import L1, S2_Wavelets_L1, S2_Wavelets_L1_Power_Weights
from pxmcmc_tpu.utils import soft


@pytest.fixture
def L1regulariser(setting):
    identity = lambda X: X
    return L1(setting, identity, identity, 50)


def test_L1(L1regulariser):
    X = jnp.arange(100.0)
    expected = np.asarray(soft(X, L1regulariser.T))
    assert np.allclose(np.asarray(L1regulariser.proxf(X)), expected)


def test_L1_prior_batched(L1regulariser):
    X = jnp.asarray([[1.0, -2.0, 3.0], [0.0, 0.0, 1.0]])
    assert np.allclose(np.asarray(L1regulariser.prior(X)), [6.0, 1.0])


def test_L1_analysis_prox_identity_ops():
    """With identity transform handles, analysis prox == synthesis prox."""
    ident = lambda X: X
    reg_a = L1("analysis", ident, ident, 2.0)
    reg_s = L1("synthesis", ident, ident, 2.0)
    X = jnp.asarray([-5.0, -1.0, 0.5, 3.0])
    assert np.allclose(np.asarray(reg_a.proxf(X)), np.asarray(reg_s.proxf(X)))


def test_S2_Wavelets_L1_synthesis(L, B, J_min):
    reg = S2_Wavelets_L1("synthesis", None, None, 1, L, B, J_min)
    data = jnp.ones(reg.map_weights.size)
    out = np.asarray(reg.proxf(data))
    assert out.shape == (reg.map_weights.size,)
    assert np.isfinite(out).all()
    # threshold carries the quadrature weights
    assert np.allclose(np.asarray(reg.T), np.asarray(reg.map_weights))


@pytest.mark.parametrize("cls", [S2_Wavelets_L1, S2_Wavelets_L1_Power_Weights])
def test_S2_priors_analysis(cls, L, B, J_min, simpledata):
    """Analysis-setting weighted prox works through the wavelet transform
    (beyond-reference: the reference raises NotImplementedError here,
    prior.py:79-80, so its own analysis-mode CLIs crash)."""
    from pxmcmc_tpu.transforms import SphericalWaveletTransform

    t = SphericalWaveletTransform(L, B, J_min)
    reg = cls("analysis", t.inverse, t.inverse_adjoint, 1e-3, L, B, J_min)
    out = np.asarray(reg.proxf(jnp.asarray(simpledata)))
    assert out.shape == simpledata.shape
    assert np.isfinite(out).all()
    # prox moves X toward sparser wavelet coefficients
    p0 = float(reg.prior(jnp.asarray(simpledata)))
    p1 = float(reg.prior(jnp.asarray(out)))
    assert p1 <= p0


def test_S2_Wavelets_L1_Power_Weights(L, B, J_min):
    reg = S2_Wavelets_L1_Power_Weights("synthesis", None, None, 1, L, B, J_min, eta=1)
    data = jnp.ones(reg.map_weights.size)
    out = np.asarray(reg.proxf(data))
    assert out.shape == (reg.map_weights.size,)
    assert np.isfinite(out).all()


def test_soft_complex():
    ins = jnp.asarray([1 + 1j, 0.5 - 0.5j, 0.0])
    outs = np.asarray(soft(ins, 1))
    expected = [(1 + 1j) * (np.sqrt(2) - 1) / np.sqrt(2), 0, 0]
    assert np.allclose(outs, expected)


def test_soft_real():
    assert np.allclose(np.asarray(soft(jnp.asarray([1.0, 2, 3]), 2)), [0, 0, 1])
    assert np.allclose(np.asarray(soft(jnp.asarray([-1.0, -2, -3]), 2)), [0, 0, -1])


def test_S2_prior_weights_directional_size():
    """dirs > 1: per-scale quadrature weights tile across the 2*dirs-1
    direction samples so map_weights matches the directional ncoefs."""
    from pxmcmc_tpu.transforms import SphericalWaveletTransform

    L, B, J_min, dirs = 12, 2, 1, 2
    t = SphericalWaveletTransform(L, B, J_min, dirs=dirs)
    for cls in (S2_Wavelets_L1, S2_Wavelets_L1_Power_Weights):
        reg = cls("synthesis", t.inverse, t.inverse_adjoint, 1e-3, L, B, J_min,
                  dirs=dirs)
        assert reg.map_weights.shape == (t.ncoefs,)
        out = np.asarray(reg.proxf(jnp.ones(t.ncoefs)))
        assert out.shape == (t.ncoefs,)
        assert np.isfinite(out).all()


def test_directional_myula_end_to_end(rng):
    """dirs=2 denoiser: full sampler runs and reduces the posterior."""
    from pxmcmc_tpu.forward import SphericalWaveletTransformOperator
    from pxmcmc_tpu.mcmc import MYULA, PxMCMCParams
    from tests.test_wavelets import make_bandlimited_map

    L, B, J_min, dirs = 12, 2, 1, 2
    data = make_bandlimited_map(L, rng)
    fwd = SphericalWaveletTransformOperator(data, 0.1, "synthesis", L, B, J_min,
                                            dirs=dirs)
    params = PxMCMCParams(nsamples=10, nburn=5, ngap=2, verbosity=0,
                          delta=1e-5, lmda=1e-5, nchains=2)
    prior = S2_Wavelets_L1("synthesis", fwd.transform.inverse,
                           fwd.transform.inverse_adjoint,
                           params.lmda * params.mu, L=L, B=B, J_min=J_min,
                           dirs=dirs)
    m = MYULA(fwd, prior, params)
    # round 5: directional transforms take the stacked-real Gram fast path
    # (ops/dirgram.py) — tested equal to the complex chain
    assert m._gram_ok()
    m.run()
    assert np.isfinite(m.logPi).all()
    assert m.chain.shape == (10, 2, fwd.nparams)

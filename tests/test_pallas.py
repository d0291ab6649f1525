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

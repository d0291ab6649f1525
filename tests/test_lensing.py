"""Stacked-real weak-lensing fast path vs the generic complex chain.

The fast path (pxmcmc_tpu/ops/lensing.py) must realise *exactly* the same
linear operators as the reference-parity complex chain
(`/root/reference/pxmcmc/measurements.py:185-304` + `forward.py:60-72`):
forward model, fidelity, gradient, and the sampler built on them.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pxmcmc_tpu.forward import ForwardOperator
from pxmcmc_tpu.measurements import WeakLensing
from pxmcmc_tpu.transforms import SphericalWaveletTransform
from pxmcmc_tpu.utils import build_mask

L, B, J_MIN = 16, 2, 1


@pytest.fixture(scope="module")
def wl_setup():
    rng = np.random.default_rng(5)
    mask = build_mask(L, size=15)
    meas = WeakLensing(L, mask, ngal=np.full_like(mask, 30.0, dtype=float))
    transform = SphericalWaveletTransform(L, B, J_MIN)
    ndata = meas.ndata
    gammas = (rng.standard_normal(ndata) + 1j * rng.standard_normal(ndata)) * 0.1
    sig_d = np.full(ndata, 0.3)
    fwd = ForwardOperator(
        gammas, sig_d, "synthesis", transform=transform, measurement=meas,
        nparams=transform.ncoefs,
    )
    fwd.prepare()
    X = rng.standard_normal((3, transform.ncoefs)).astype(np.float32)
    return fwd, jnp.asarray(X)


def test_fast_path_selected(wl_setup):
    fwd, X = wl_setup
    assert fwd._wl_fast_ok()
    assert hasattr(fwd, "_wl")


def test_forward_matches_complex_chain(wl_setup):
    """wl_forward2 == measurement.forward(transform.inverse(X)) (re/im)."""
    fwd, X = wl_setup
    fast = np.asarray(fwd.forward_internal(X))  # (3, 2, npix)
    ref = np.asarray(fwd.forward(X))  # (3, ndata) complex
    idx = fwd.measurement._mask_idx_np
    np.testing.assert_allclose(fast[:, 0, idx], ref.real, atol=2e-4)
    np.testing.assert_allclose(fast[:, 1, idx], ref.imag, atol=2e-4)
    # off-mask pixels carry exact zeros (weight support)
    off = np.setdiff1d(np.arange(fast.shape[-1]), idx)
    assert np.all(fast[:, :, off] == 0.0)


def test_preds_to_data_roundtrip(wl_setup):
    fwd, X = wl_setup
    fast = fwd.forward_internal(X)
    ref = np.asarray(fwd.forward(X))
    np.testing.assert_allclose(np.asarray(fwd.preds_to_data(fast)), ref, atol=2e-4)


def test_fidelity_matches(wl_setup):
    fwd, X = wl_setup
    fast = fwd.forward_internal(X)
    ref = fwd.forward(X)
    np.testing.assert_allclose(
        np.asarray(fwd.fidelity_internal(fast)),
        np.asarray(fwd.logpi_fidelity(ref)),
        rtol=2e-4,
    )


def test_gradient_matches(wl_setup):
    """wl_gradg2 == Re(generic synthesis gradient chain)."""
    fwd, X = wl_setup
    fast = np.asarray(fwd.gradg_internal(fwd.forward_internal(X)))
    ref = np.asarray(fwd.calc_gradg(fwd.forward(X))).real
    scale = np.abs(ref).max()
    np.testing.assert_allclose(fast / scale, ref / scale, atol=2e-4)


def test_gradient_is_transpose_of_forward(wl_setup):
    """Adjoint dot-test directly on the stacked-real maps: the chain behind
    gradg must be the exact real-linear transpose of the forward chain."""
    from pxmcmc_tpu.ops.lensing import wl_forward2, wl_gradg2

    fwd, X = wl_setup
    rng = np.random.default_rng(11)
    t = fwd._wl
    wb = fwd.transform.basis
    x = jnp.asarray(rng.standard_normal(fwd.nparams), dtype=jnp.float32)
    y2 = jnp.asarray(
        rng.standard_normal((2, t.weight.shape[0])), dtype=jnp.float32
    )
    Ax = wl_forward2(x, wb, t)
    # strip data/invcov from the adjoint: feed y through the chain by
    # building tables with identity invcov and zero data
    import dataclasses

    t_id = dataclasses.replace(
        t,
        inv_a=jnp.ones_like(t.inv_a),
        inv_b=jnp.zeros_like(t.inv_b),
        weight=jnp.ones_like(t.weight),
        data2=jnp.zeros_like(t.data2),
    )
    Ax_id = wl_forward2(x, wb, t_id)
    ATy = wl_gradg2(y2, wb, t_id)
    lhs = float(jnp.sum(Ax_id * y2))
    rhs = float(jnp.sum(x * ATy))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_myula_chain_fast_equals_generic(wl_setup, monkeypatch):
    """A short MYULA run through the fast path equals the generic complex
    chain sample-for-sample (same PRNG stream, same gradients)."""
    from pxmcmc_tpu.mcmc import MYULA, PxMCMCParams
    from pxmcmc_tpu.prior import S2_Wavelets_L1

    rng = np.random.default_rng(5)
    mask = build_mask(L, size=15)
    ndata = int(mask.sum())
    gammas = (rng.standard_normal(ndata) + 1j * rng.standard_normal(ndata)) * 0.1
    sig_d = np.full(ndata, 0.3)

    def build(fast):
        monkeypatch.setenv("PXMCMC_WL_FAST", "1" if fast else "0")
        meas = WeakLensing(L, mask, ngal=np.full_like(mask, 30.0, dtype=float))
        transform = SphericalWaveletTransform(L, B, J_MIN)
        fwd = ForwardOperator(
            gammas, sig_d, "synthesis", transform=transform,
            measurement=meas, nparams=transform.ncoefs,
        )
        params = PxMCMCParams(
            nsamples=4, nburn=2, ngap=2, delta=1e-4, lmda=1e-4, mu=1,
            verbosity=0, nchains=2, track=("logposterior", "L2", "prior", "chain"),
            pyramid_state=False,  # generic path has no blocks: match streams
        )
        prior = S2_Wavelets_L1(
            "synthesis", fwd.transform.inverse, fwd.transform.inverse_adjoint,
            params.lmda * params.mu, L=L, B=B, J_min=J_MIN,
        )
        return MYULA(fwd, prior, params, seed=3)

    fast = build(True).run()
    slow = build(False).run()
    np.testing.assert_allclose(fast.chain, slow.chain, atol=1e-4)
    np.testing.assert_allclose(fast.logPi, slow.logPi, rtol=2e-3)

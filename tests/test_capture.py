"""Capture threading: compiled programs must not embed the basis tables."""
import jax
import numpy as np

from pxmcmc_tpu.capture import CaptureThreader
from pxmcmc_tpu.forward import SphericalWaveletTransformOperator
from pxmcmc_tpu.mcmc import MYULA, PxMCMCParams
from pxmcmc_tpu.prior import S2_Wavelets_L1


def _make(simpledata, L, B, J_min):
    fwd = SphericalWaveletTransformOperator(simpledata, 0.1, "synthesis", L, B, J_min)
    params = PxMCMCParams(nsamples=2, nburn=0, ngap=1, verbosity=0, lmda=1e-6,
                          delta=1e-7)
    prior = S2_Wavelets_L1(
        "synthesis", fwd.transform.inverse, fwd.transform.inverse_adjoint,
        params.lmda, L=L, B=B, J_min=J_min,
    )
    return MYULA(fwd, prior, params)


def test_threader_finds_basis_tables(simpledata, L, B, J_min):
    mcmc = _make(simpledata, L, B, J_min)
    mcmc._prepare()
    threader = CaptureThreader([mcmc])
    leaves = jax.tree_util.tree_leaves(threader.get())
    total = sum(leaf.size for leaf in leaves)
    # must include the SHT basis matrices: lam+q at L plus per-scale bases
    assert total > 2 * (2 * L - 1) * L * L


def test_lowered_step_has_no_large_constants(rng, B, J_min):
    """Serialized HLO with threading is a fraction of the constant-embedding
    version — i.e. the basis tables really become runtime arguments."""
    L = 24
    from pxmcmc_tpu.ops import sht
    from tests.conftest import make_real_flm

    basis = sht.get_basis(L, 0, use_disk_cache=False)
    data = np.asarray(sht.inverse(make_real_flm(L, rng), basis)).real.flatten()
    mcmc = _make(data, L, B, J_min)
    mcmc._prepare()  # materialise derived tables (gram) before capture setup
    threader = CaptureThreader([mcmc])
    captures = threader.get()

    X, preds = mcmc._initial_sample()
    state = mcmc._init_state(X, preds)
    keys = jax.random.split(jax.random.key(0), 3)

    def _block_threaded(state, keys):
        state, _ = jax.lax.scan(mcmc._build_step(), state, keys)
        return state

    threaded = jax.jit(threader.wrap(_block_threaded)).lower(captures, state, keys)
    n_threaded = len(threaded.compiler_ir("hlo").as_serialized_hlo_module_proto())

    def _block_const(state, keys):
        state, _ = jax.lax.scan(mcmc._build_step(), state, keys)
        return state

    const = jax.jit(_block_const).lower(state, keys)
    n_const = len(const.compiler_ir("hlo").as_serialized_hlo_module_proto())

    assert n_threaded < 0.4 * n_const, (n_threaded, n_const)


def test_threaded_run_matches_constant_run(simpledata, L, B, J_min):
    """Capture threading must not change sampled values (pure plumbing)."""
    a = _make(simpledata, L, B, J_min)
    a.run()
    b = _make(simpledata, L, B, J_min)
    b.run()
    assert np.allclose(a.chain, b.chain)


class TestComplexBoundary:
    """Complex values must never cross host<->device as complex bytes:
    relayed TPU backends only implement real-dtype transfers (BENCH.md
    round 3).  config.to_device/to_host are the sanctioned boundary."""

    def test_to_device_complex_roundtrip(self, rng):
        from pxmcmc_tpu.config import complex_dtype, to_device, to_host

        x = rng.standard_normal(17) + 1j * rng.standard_normal(17)
        d = to_device(x)
        assert jax.numpy.iscomplexobj(d)
        assert d.dtype == complex_dtype()
        np.testing.assert_allclose(to_host(d), x.astype(np.complex128), rtol=1e-6)

    def test_to_device_real_passthrough(self, rng):
        from pxmcmc_tpu.config import to_device, to_host

        x = rng.standard_normal(9)
        np.testing.assert_allclose(to_host(to_device(x)), x, rtol=1e-6)

    def test_device_get_safe_mixed_pytree(self, rng):
        import jax.numpy as jnp

        from pxmcmc_tpu.config import device_get_safe, to_device

        tree = {
            "c": to_device(rng.standard_normal(4) + 1j * rng.standard_normal(4)),
            "r": jnp.arange(3.0),
            "host": np.ones(2),
            "none": None,
        }
        out = device_get_safe(tree)
        assert isinstance(out["c"], np.ndarray) and np.iscomplexobj(out["c"])
        assert isinstance(out["r"], np.ndarray)
        assert out["none"] is None

    def test_forward_operator_complex_data_device_built(self, rng):
        """ForwardOperator's complex data/invcov must be device-constructed
        (lax.complex of two real uploads), value-identical to the inputs."""
        from pxmcmc_tpu.config import to_host
        from pxmcmc_tpu.forward import ForwardOperator

        data = rng.standard_normal(10) + 1j * rng.standard_normal(10)
        fwd = ForwardOperator(data, 0.1, "synthesis", nparams=10)
        np.testing.assert_allclose(to_host(fwd.data), data, rtol=1e-6)
        # complex split-variance invcov (reference forward.py:81-82)
        assert jax.numpy.iscomplexobj(fwd.invcov)
        expected = 1.0 / (0.1 ** 2 / np.sqrt(2) * (1 + 1j))
        np.testing.assert_allclose(to_host(fwd.invcov), expected, rtol=1e-6)

"""m-axis (harmonic) parallel SHT — the TP/SP analogue for large L.

shard_map kernels with explicit psum collectives, run on the 8-virtual
-device CPU mesh; results must match the single-device transforms exactly.
"""
import jax
import numpy as np
import pytest

from pxmcmc_tpu.ops import sht
from pxmcmc_tpu.parallel.harmonic import forward_real_msharded, inverse_real_msharded
from pxmcmc_tpu.parallel.mesh import make_mesh
from tests.conftest import make_real_flm


@pytest.fixture
def mesh():
    return make_mesh(axis_name="m")


def test_inverse_real_msharded(rng, mesh):
    L = 18  # L not divisible by 8: exercises the padding
    basis = sht.get_basis(L, 0, use_disk_cache=False)
    flm = np.stack([make_real_flm(L, rng) for _ in range(3)])
    ref = np.asarray(sht.inverse_real(jax.numpy.asarray(flm), basis))
    out = np.asarray(inverse_real_msharded(jax.numpy.asarray(flm), basis, mesh))
    assert out.shape == ref.shape
    assert np.allclose(out, ref, atol=1e-12)


def test_forward_real_msharded(rng, mesh):
    L = 16
    basis = sht.get_basis(L, 0, use_disk_cache=False)
    f = rng.standard_normal((2, L * (2 * L - 1)))
    ref = np.asarray(
        sht.forward_real(jax.numpy.asarray(f).reshape(2, L, 2 * L - 1), basis)
    )
    out = np.asarray(forward_real_msharded(jax.numpy.asarray(f), basis, mesh))
    assert np.allclose(out, ref, atol=1e-12)


def test_msharded_roundtrip(rng, mesh):
    L = 16
    basis = sht.get_basis(L, 0, use_disk_cache=False)
    flm = make_real_flm(L, rng)
    f = inverse_real_msharded(jax.numpy.asarray(flm), basis, mesh)
    rec = np.asarray(forward_real_msharded(f.reshape(1, -1), basis, mesh))[0]
    assert np.allclose(rec, flm, atol=1e-12)


def test_sampler_msharded_matches(rng):
    """Sampler-level m-sharding (round-2 VERDICT weak #7): run() on a 2-D
    ('chains', 'm') mesh — per-m tables split over 'm', chains over
    'chains' — must reproduce the unsharded chains."""
    import jax.numpy as jnp

    from pxmcmc_tpu.forward import SphericalWaveletTransformOperator
    from pxmcmc_tpu.mcmc import MYULA, PxMCMCParams
    from pxmcmc_tpu.prior import S2_Wavelets_L1
    from pxmcmc_tpu.parallel.mesh import make_mesh_2d

    L, B, J_min = 16, 2, 1
    data = np.asarray(
        sht.inverse_real(
            jnp.asarray(make_real_flm(L, rng)),
            sht.get_basis(L, 0, use_disk_cache=False),
        )
    ).flatten()

    def build():
        fwd = SphericalWaveletTransformOperator(data, 0.1, "synthesis", L, B, J_min)
        params = PxMCMCParams(
            nsamples=3, nburn=2, ngap=2, delta=1e-5, lmda=1e-5,
            nchains=4, verbosity=0,
        )
        prior = S2_Wavelets_L1(
            "synthesis", fwd.transform.inverse, fwd.transform.inverse_adjoint,
            params.lmda * params.mu, L=L, B=B, J_min=J_min,
        )
        return MYULA(fwd, prior, params, seed=1)

    sharded = build().run(mesh=make_mesh_2d(chains=2, m=4))
    plain = build().run()
    np.testing.assert_allclose(sharded.chain, plain.chain, atol=1e-5)
    np.testing.assert_allclose(sharded.logPi, plain.logPi, rtol=1e-4)

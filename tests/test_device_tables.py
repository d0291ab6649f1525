"""On-device table generation vs the host f64 reference path.

The device path (``ops/device_tables.py``) must reproduce the host tables
(Wigner recursion + SVD pinv, ``ops/wigner.py`` / ``ops/sht._precompute``)
and plug into the transforms unchanged: same round-trip and adjoint
guarantees the reference gets from SSHT (`/root/reference/tests/
test_transforms.py`).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from pxmcmc_tpu.ops import sampling, sht
from pxmcmc_tpu.ops.device_tables import (
    gram_from_lambda_device,
    pinv_from_lambda_device,
    spin_lambda_device,
)
from pxmcmc_tpu.ops.wigner import spin_lambda_table


@pytest.fixture(params=[0, 2])
def spin(request):
    return request.param


def test_lambda_matches_host(spin):
    L = 16
    thetas, _ = sampling.sample_positions(L)
    host = spin_lambda_table(L, spin, thetas)
    dev = np.asarray(spin_lambda_device(L, spin, dtype=jnp.float64))
    assert dev.shape == host.shape
    np.testing.assert_allclose(dev, host, atol=1e-12)


def test_lambda_f32_close_to_host(spin):
    L = 32
    thetas, _ = sampling.sample_positions(L)
    host = spin_lambda_table(L, spin, thetas)
    dev = np.asarray(spin_lambda_device(L, spin, dtype=jnp.float32))
    # f32 recursion: absolute error ~sqrt(L)*eps relative to O(1) entries.
    np.testing.assert_allclose(dev, host, atol=5e-5)


def test_lambda_f32_recovers_from_seed_underflow(spin):
    """Round-4 regression: near the poles the recursion seed underflows f32
    (down to ~1e-2900 at L=512) while the recursed values at higher l climb
    back into normal f32 range.  A plain-f32 recursion flushed the seed to
    zero and never recovered, leaving rank-deficient Lambda blocks whose f32
    Gram acquired negative roundoff eigenvalues — the Newton-Schulz pinv
    then diverged to NaN at L=512.  The exponent-tracked recursion must
    populate every entry the f32 cast of the host f64 table has."""
    L = 96
    thetas, _ = sampling.sample_positions(L)
    host32 = spin_lambda_table(L, spin, thetas).astype(np.float32)
    dev = np.asarray(spin_lambda_device(L, spin, dtype=jnp.float32))
    # the old flush: zeros where the host cast is clearly nonzero
    assert int(((dev == 0) & (np.abs(host32) > 1e-37)).sum()) == 0
    # scaled accuracy: error relative to each (m, l) column's magnitude
    colmax = np.abs(host32).max(axis=1, keepdims=True) + 1e-30
    assert (np.abs(dev - host32.astype(np.float64)) / colmax).max() < 2e-4
    # the Gram of every m >= 0 block stays numerically PSD (the property
    # whose violation made Newton-Schulz diverge)
    for mi in range(L - 1, 2 * L - 1):
        A = dev[mi].astype(np.float64)
        G32 = (A.astype(np.float32).T @ A.astype(np.float32)).astype(np.float64)
        w = np.linalg.eigvalsh(G32)
        assert w.min() > -1e-5 * max(w.max(), 1.0), (mi - (L - 1), w.min())


def test_pinv_matches_host_svd(spin):
    L = 16
    lam = spin_lambda_device(L, spin, dtype=jnp.float64)
    q_dev = np.asarray(pinv_from_lambda_device(lam))
    q_host = np.stack([np.linalg.pinv(np.asarray(lam)[mi], rcond=1e-12)
                       for mi in range(2 * L - 1)])
    np.testing.assert_allclose(q_dev, q_host, atol=1e-10)


def test_pinv_f32_at_oom_regression_shape(spin):
    """Round-1 regression: the driver's v5e OOM'd scoped VMEM inside the
    batched Cholesky/triangular_solve pinv at the bl=87 multires scale
    (f32[173,1,87,87] InvertDiagBlocksLowerTriangular custom call, 18.73 MB
    vs the 16 MB limit).  The replacement is matmul-only — XLA tiles batched
    GEMMs with bounded VMEM at any batch size — so this shape must both
    compile everywhere and stay accurate in f32."""
    L = 87
    lam = spin_lambda_device(L, spin, dtype=jnp.float32)
    q_dev = np.asarray(pinv_from_lambda_device(lam))
    assert q_dev.shape == (2 * L - 1, L, L)
    lam64 = np.asarray(lam, dtype=np.float64)
    # left-inverse property on the live block: Q Lambda == I_valid
    ql = np.einsum("mlt,mtk->mlk", q_dev.astype(np.float64), lam64)
    for mi in (0, L - 1, 2 * L - 2):
        m = mi - (L - 1)
        lo = max(abs(m), spin)
        np.testing.assert_allclose(
            ql[mi][lo:, lo:], np.eye(L - lo), atol=5e-5
        )
        # dead rows are exactly zero
        assert np.all(q_dev[mi][:lo] == 0.0)


def test_gram_matches_host(spin):
    L = 16
    g_host = np.asarray(sht.get_gram(L, spin, use_disk_cache=False, tables="host"))
    g_dev = np.asarray(sht.get_gram(L, spin, use_disk_cache=False, tables="device"))
    np.testing.assert_allclose(g_dev, g_host, atol=1e-10)


def test_device_basis_roundtrip_and_adjoints(spin, rng):
    """Device-built basis satisfies the same operator identities as host."""
    L = 12
    basis = sht.get_basis(L, spin, use_disk_cache=False, tables="device")
    flm = rng.standard_normal(L * L) + 1j * rng.standard_normal(L * L)
    flm[: spin * spin] = 0.0
    f = sht.inverse(jnp.asarray(flm), basis)
    np.testing.assert_allclose(np.asarray(sht.forward(f, basis)), flm, atol=1e-10)
    # adjoint dot-tests: <f, A x> == <A^T f, x>
    g = rng.standard_normal((L, 2 * L - 1)) + 1j * rng.standard_normal((L, 2 * L - 1))
    lhs = np.vdot(g, np.asarray(sht.inverse(jnp.asarray(flm), basis)))
    rhs = np.vdot(np.asarray(sht.inverse_adjoint(jnp.asarray(g), basis)), flm)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)
    lhs = np.vdot(flm, np.asarray(sht.forward(jnp.asarray(g), basis)))
    rhs = np.vdot(np.asarray(sht.forward_adjoint(jnp.asarray(flm), basis)), g)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)

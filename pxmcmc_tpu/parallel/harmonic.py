r"""Harmonic (m-axis) parallel SHT — the tensor-parallel regime for large L.

Chains are this framework's primary mesh axis (SURVEY.md §2b), but when the
bandlimit grows past a chip's HBM (the Legendre tables scale as L^3), the
natural second axis is m: each device holds an m-slab of the tables, runs
its theta-matmuls locally, and a single ``psum`` over the slab axis
assembles the phi-direction sum — one collective per transform, riding ICI.

Implemented with ``shard_map`` + explicit collectives over the *half
-spectrum* (m >= 0) real path, padded to the mesh size.  Exact against the
single-device transforms (tests on the 8-virtual-device CPU mesh).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import sht

__all__ = ["inverse_real_msharded", "forward_real_msharded"]


def _pad_m(arr, axis: int, target: int):
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, target - arr.shape[axis])
    return jnp.pad(arr, pad)


def inverse_real_msharded(flm, basis: sht.SHTBasis, mesh: Mesh, axis_name="m"):
    """m-sharded :func:`pxmcmc_tpu.ops.sht.inverse_real`.

    :param flm: (batch, L^2) or (L^2,) conjugate-symmetric coefficients
        (replicated)
    :return: (batch, L, 2L-1) real map (replicated)
    """
    L = basis.L
    N = 2 * L - 1
    nshard = mesh.shape[axis_name]
    Lp = -(-L // nshard) * nshard

    squeeze = flm.ndim == 1
    flm2 = jnp.atleast_2d(flm)
    F = sht._to_ml_pos(flm2.astype(jnp.complex64 if basis.lam.dtype == jnp.float32 else complex), basis)
    c = jnp.ones((L,), basis.lam.dtype).at[1:].set(2.0)
    F = F * c[:, None]
    Fr = _pad_m(jnp.stack([F.real, F.imag]), 2, Lp)  # (2, B, Lp, L)
    lam_p = _pad_m(basis.lam[L - 1 :], 0, Lp)  # (Lp, L, L)
    cos_p = _pad_m(basis.cos_pm, 1, Lp)  # (N, Lp)
    sin_p = _pad_m(basis.sin_pm, 1, Lp)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(axis_name, None, None),
            P(None, axis_name),
            P(None, axis_name),
            P(None, None, axis_name, None),
        ),
        out_specs=P(),
    )
    def block(lam_blk, cos_blk, sin_blk, F_blk):
        T = jnp.einsum("mtl,xbml->xbmt", lam_blk, F_blk)
        f_part = jnp.einsum("pm,bmt->btp", cos_blk, T[0]) - jnp.einsum(
            "pm,bmt->btp", sin_blk, T[1]
        )
        return jax.lax.psum(f_part, axis_name)

    f = block(lam_p, cos_p, sin_p, Fr)
    return f[0] if squeeze else f


def forward_real_msharded(f, basis: sht.SHTBasis, mesh: Mesh, axis_name="m"):
    """m-sharded :func:`pxmcmc_tpu.ops.sht.forward_real`.

    :param f: (batch, L(2L-1)) or flat real map (replicated)
    :return: (batch, L^2) conjugate-symmetric coefficients (replicated)
    """
    L = basis.L
    N = 2 * L - 1
    nshard = mesh.shape[axis_name]
    Lp = -(-L // nshard) * nshard

    squeeze = f.ndim == 1
    f2 = jnp.atleast_2d(f).reshape(-1, L, N)
    q_p = _pad_m(basis.q[L - 1 :], 0, Lp)
    cos_p = _pad_m(basis.cos_pm, 1, Lp)
    sin_p = _pad_m(basis.sin_pm, 1, Lp)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(axis_name, None, None),
            P(None, axis_name),
            P(None, axis_name),
            P(),
        ),
        out_specs=(P(None, axis_name, None), P(None, axis_name, None)),
    )
    def block(q_blk, cos_blk, sin_blk, fmap):
        re = jnp.einsum("pm,btp->bmt", cos_blk, fmap) / N
        im = -jnp.einsum("pm,btp->bmt", sin_blk, fmap) / N
        Gr = jnp.einsum("mlt,bmt->bml", q_blk, re)
        Gi = jnp.einsum("mlt,bmt->bml", q_blk, im)
        return Gr, Gi

    Gr, Gi = block(q_p, cos_p, sin_p, f2)
    G = jax.lax.complex(Gr, Gi)[:, :L, :]
    out = sht._from_ml_pos(G, basis)
    return out[0] if squeeze else out

r"""Pallas TPU kernels for the prox/threshold hot path.

The MYULA update (ref ``/root/reference/pxmcmc/mcmc.py:185-201``)

    X' = (1 - delta/lmda) X + (delta/lmda) soft(X, T) - delta g + sqrt(2 delta) w

is pure bandwidth: six array reads/writes over (nchains, nparams) per
iteration if staged.  This kernel fuses the soft-threshold prox
(`utils.py:55-67`), the Euler-Maruyama update, and the Gaussian noise
generation (on-core PRNG + Box-Muller) into a single VMEM pass — the noise
never touches HBM.

The fused path is used by ``MYULA`` when ``PxMCMCParams.fused_step`` is on
and the state is real; it draws from the Pallas per-core PRNG, so sample
streams differ from (but are distributed identically to) the jax.random
default path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_CHUNK = 1024  # lanes per grid step (multiple of 128)
_CBLOCK = 64  # chain rows per grid step (VMEM budget)


def _uniform_from_bits(bits):
    """uint32 -> uniform (0, 1) float32 with 24-bit mantissa.

    Casts via int32 (the top-24 bits fit) — Mosaic has no direct
    uint32->float32 cast.
    """
    return (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (
        1.0 / (1 << 24)
    ) + (0.5 / (1 << 24))


def _myula_kernel(seed_ref, scal_ref, x_ref, g_ref, t_ref, out_ref):
    """One (nchains, CHUNK) tile of the fused MYULA update."""
    pltpu.prng_seed(
        seed_ref[0], pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    )
    delta = scal_ref[0]
    lmda = scal_ref[1]
    x = x_ref[:]
    g = g_ref[:]
    t = t_ref[:]  # (1, CHUNK) broadcasting over chains

    # soft threshold (real case): sign(x) * max(|x| - T, 0)
    mag = jnp.maximum(jnp.abs(x) - t, 0.0)
    prox = jnp.sign(x) * mag

    # Box-Muller from two draws of on-core random bits
    u1 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32))
    u2 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    w = r * jnp.cos(2.0 * np.pi * u2)

    ratio = delta / lmda
    out_ref[:] = (1.0 - ratio) * x + ratio * prox - delta * g + jnp.sqrt(2.0 * delta) * w


@functools.partial(jax.jit, static_argnames=("interpret",))
def myula_fused_step(X, gradg, T, delta, lmda, seed, interpret=False):
    """Fused prox + Langevin update with on-core noise.

    :param X: (nchains, nparams) float32 state
    :param gradg: (nchains, nparams) data-fidelity gradient
    :param T: per-coefficient threshold, broadcastable to (nparams,)
    :param delta, lmda: scalars
    :param seed: int32 scalar seed (vary per iteration)
    :param interpret: run in interpreter mode (CPU testing)
    :return: updated X, same shape/dtype
    """
    nchains, n = X.shape
    n_pad = ((n + _CHUNK - 1) // _CHUNK) * _CHUNK
    cb = min(nchains, _CBLOCK)
    c_pad = ((nchains + cb - 1) // cb) * cb
    Xp = jnp.pad(X.astype(jnp.float32), ((0, c_pad - nchains), (0, n_pad - n)))
    Gp = jnp.pad(gradg.astype(jnp.float32), ((0, c_pad - nchains), (0, n_pad - n)))
    Tfull = jnp.broadcast_to(jnp.asarray(T, dtype=jnp.float32), (n,))
    Tp = jnp.pad(Tfull, (0, n_pad - n)).reshape(1, n_pad)
    scal = jnp.asarray([delta, lmda], dtype=jnp.float32)
    seed = jnp.asarray([seed], dtype=jnp.int32)

    grid = (c_pad // cb, n_pad // _CHUNK)
    out = pl.pallas_call(
        _myula_kernel,
        out_shape=jax.ShapeDtypeStruct((c_pad, n_pad), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((cb, _CHUNK), lambda i, j, *_: (i, j)),
                pl.BlockSpec((cb, _CHUNK), lambda i, j, *_: (i, j)),
                pl.BlockSpec((1, _CHUNK), lambda i, j, *_: (0, j)),
            ],
            out_specs=pl.BlockSpec((cb, _CHUNK), lambda i, j, *_: (i, j)),
        ),
        interpret=interpret,
    )(seed, scal, Xp, Gp, Tp)
    return out[:nchains, :n].astype(X.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def soft_threshold_pallas(X, T, interpret=False):
    """Standalone fused soft threshold (prox of T ||.||_1), real input."""

    def kernel(x_ref, t_ref, out_ref):
        x = x_ref[:]
        mag = jnp.maximum(jnp.abs(x) - t_ref[:], 0.0)
        out_ref[:] = jnp.sign(x) * mag

    orig_shape = X.shape
    X2 = X.reshape(-1, orig_shape[-1]).astype(jnp.float32)
    nrow, n = X2.shape
    n_pad = ((n + _LANE - 1) // _LANE) * _LANE
    Xp = jnp.pad(X2, ((0, 0), (0, n_pad - n)))
    Tfull = jnp.broadcast_to(jnp.asarray(T, dtype=jnp.float32), (n,))
    Tp = jnp.pad(Tfull, (0, n_pad - n)).reshape(1, n_pad)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nrow, n_pad), jnp.float32),
        interpret=interpret,
    )(Xp, Tp)
    return out[:, :n].reshape(orig_shape).astype(X.dtype)

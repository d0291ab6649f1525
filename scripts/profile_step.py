"""Decompose the bench step's on-device time into its physical components.

Times, on the current backend, scans over (a) the full MYULA step, (b) the
Gram data-fidelity gradient alone, (c) the elementwise prox+update with
fixed noise, (d) PRNG noise generation alone.  Each is measured with the
same scan/jit/readback harness as bench.py so the numbers subtract cleanly.
Handles both the flat and the (default) pyramid state layouts.

Usage:  python scripts/profile_step.py [niter]
Env:    PXMCMC_BENCH_L / PXMCMC_BENCH_CHAINS / PXMCMC_BENCH_PYRAMID as in
        bench.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench harness)


def _leaf(X):
    import jax

    return X if isinstance(X, jax.Array) else X[0]


def time_scan(threader, captures, body, state, niter, nrep=3):
    import jax

    def _block(state, keys):
        state, _ = jax.lax.scan(body, state, keys)
        return state

    block_j = jax.jit(threader.wrap(_block))
    keys = jax.random.split(jax.random.PRNGKey(0), niter)
    out = block_j(captures, state, keys)  # compile + warm
    float(jax.numpy.sum(_leaf(out.X)[:, 0]))
    best = float("inf")
    for _ in range(nrep):
        t0 = time.perf_counter()
        out = block_j(captures, state, keys)
        float(jax.numpy.sum(_leaf(out.X)[:, 0]))
        best = min(best, (time.perf_counter() - t0) / niter)
    return best


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pxmcmc_tpu.capture import CaptureThreader

    L = int(os.environ.get("PXMCMC_BENCH_L", 256))
    nchains = int(os.environ.get("PXMCMC_BENCH_CHAINS", 256))
    niter = int(sys.argv[1]) if len(sys.argv) > 1 else 30

    sampler = bench.build_step(L, nchains)
    sampler._prepare()
    threader = CaptureThreader([sampler])
    X = jnp.asarray(
        np.random.default_rng(7).laplace(size=(nchains, sampler.forward.nparams)),
        dtype=jnp.float32,
    )
    state = sampler._init_state(X, None)
    captures = threader.get()
    full_step = sampler._build_step()
    pyramid = not isinstance(state.X, jax.Array)

    if pyramid:
        w_fixed = tuple(jnp.zeros_like(x) + 0.01 for x in state.X)
        g_fixed = w_fixed
        prox_fn = sampler._pyr_prox_fn()

        def gradg_only(state, key):
            g = sampler._gram_gradg_blocks(state.X)
            Xn = tuple(x + 0.0 * gi[..., :1] for x, gi in zip(state.X, g))
            return type(state)(X=Xn, preds=None), ()

        def elementwise_only(state, key):
            proxf = prox_fn(state.X)
            Xn = tuple(
                sampler.chain_step(x, p, g, w)
                for x, p, g, w in zip(state.X, proxf, g_fixed, w_fixed)
            )
            return type(state)(X=Xn, preds=None), ()

        def noise_only(state, key):
            ws = sampler._pyr_noise(key, state.X)
            Xn = tuple(x + 1e-9 * w for x, w in zip(state.X, ws))
            return type(state)(X=Xn, preds=None), ()

        def prox_only(state, key):
            proxf = prox_fn(state.X)
            Xn = tuple(
                0.999 * x + 1e-9 * p for x, p in zip(state.X, proxf)
            )
            return type(state)(X=Xn, preds=None), ()
    else:
        w_fixed = jnp.zeros_like(X) + 0.01
        g_fixed = jnp.zeros_like(X) + 0.01

        def gradg_only(state, key):
            g = sampler._gram_gradg(state.X)
            # fold g back into X so the scan carries a dependency (no DCE)
            return type(state)(X=state.X + 0.0 * g[..., :1], preds=None), ()

        def elementwise_only(state, key):
            proxf = sampler.prior.proxf(state.X)
            Xn = sampler.chain_step(state.X, proxf, g_fixed, w_fixed)
            return type(state)(X=Xn, preds=None), ()

        def noise_only(state, key):
            w = sampler._noise(key, state.X.shape)
            return type(state)(X=state.X + 1e-9 * w, preds=None), ()

        def prox_only(state, key):
            proxf = sampler.prior.proxf(state.X)
            return type(state)(X=0.999 * state.X + 1e-9 * proxf, preds=None), ()

    rows = [
        ("full step", full_step),
        ("gradg (Gram GEMMs)", gradg_only),
        ("prox+update (fixed noise/grad)", elementwise_only),
        ("prox only", prox_only),
        ("noise only (PRNG)", noise_only),
    ]
    print(f"L={L} chains={nchains} nparams={sampler.forward.nparams} "
          f"backend={jax.default_backend()} niter={niter} "
          f"layout={'pyramid' if pyramid else 'flat'}")
    for name, body in rows:
        dt = time_scan(threader, captures, body, state, niter)
        print(f"{name:34s} {dt*1e3:8.2f} ms/step  "
              f"({nchains/dt:,.0f} it/s aggregate)")


if __name__ == "__main__":
    main()

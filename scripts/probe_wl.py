"""Stage-by-stage TPU probe of the weaklensing chain.

Usage: python scripts/probe_wl.py STAGE [L] [NCHAINS]
Each stage jits one piece of the WL chain, runs it, and reads back a scalar.
Run each stage in a fresh process under `timeout` to bisect which op wedges
or errors on the TPU backend.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE = sys.argv[1]
L = int(sys.argv[2]) if len(sys.argv) > 2 else 32
NCH = int(sys.argv[3]) if len(sys.argv) > 3 else 4

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    v = float(jnp.sum(jnp.abs(x)))
    return v


def timed(name, fn, *a):
    t0 = time.time()
    out = jax.jit(fn)(*a)
    v = sync(out)
    print(f"{name}: {time.time()-t0:.1f}s sum={v:.4g}", flush=True)
    return out


def main():
    from pxmcmc_tpu.ops import sht

    print(f"stage={STAGE} L={L} nch={NCH} backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    if STAGE == "tables0":
        b0 = sht.get_basis(L, 0)
        print("lam sum:", sync(b0.lam), "q sum:", sync(b0.q), flush=True)
        return
    if STAGE == "tables2":
        b2 = sht.get_basis(L, 2)
        print("lam sum:", sync(b2.lam), "q sum:", sync(b2.q), flush=True)
        return

    kmap = jnp.asarray(rng.standard_normal((NCH, L, 2 * L - 1)), dtype=jnp.float32)

    if STAGE == "fwd0":
        b0 = sht.get_basis(L, 0)
        timed("sht.forward spin0 complex", lambda x: sht.forward(x, b0), kmap)
        return
    if STAGE == "inv2":
        b0 = sht.get_basis(L, 0)
        b2 = sht.get_basis(L, 2)
        klm = jax.jit(lambda x: sht.forward(x, b0))(kmap)
        sync(klm)
        timed("sht.inverse spin2 complex", lambda x: sht.inverse(x, b2), klm)
        return
    if STAGE == "invadj2":
        b2 = sht.get_basis(L, 2)
        g = jnp.asarray(
            rng.standard_normal((NCH, L, 2 * L - 1))
            + 1j * rng.standard_normal((NCH, L, 2 * L - 1)),
            dtype=jnp.complex64,
        )
        timed("sht.inverse_adjoint spin2", lambda x: sht.inverse_adjoint(x, b2), g)
        return
    if STAGE == "fwdadj0":
        b0 = sht.get_basis(L, 0)
        flm = jnp.asarray(
            rng.standard_normal((NCH, L * L)) + 1j * rng.standard_normal((NCH, L * L)),
            dtype=jnp.complex64,
        )
        timed("sht.forward_adjoint spin0", lambda x: sht.forward_adjoint(x, b0), flm)
        return

    # measurement-level stages
    from pxmcmc_tpu.measurements import WeakLensing
    from pxmcmc_tpu.utils import build_mask

    mask = build_mask(L, size=10)
    meas = WeakLensing(L, mask, ngal=np.full_like(mask, 30.0))
    kflat = kmap.reshape(NCH, -1)

    if STAGE == "meas_fwd":
        timed("WeakLensing.forward", meas.forward, kflat)
        return
    if STAGE == "meas_adj":
        g = jnp.asarray(
            rng.standard_normal((NCH, meas.ndata))
            + 1j * rng.standard_normal((NCH, meas.ndata)),
            dtype=jnp.complex64,
        )
        timed("WeakLensing.adjoint", meas.adjoint, g)
        return
    if STAGE == "mask":
        g = jnp.asarray(
            rng.standard_normal((NCH, meas.ndata))
            + 1j * rng.standard_normal((NCH, meas.ndata)),
            dtype=jnp.complex64,
        )
        timed("mask_adjoint scatter", meas.mask_adjoint, g)
        return

    # operator / sampler-level stages
    from pxmcmc_tpu.forward import ForwardOperator
    from pxmcmc_tpu.transforms import SphericalWaveletTransform

    B, J_min = 2, 2
    transform = SphericalWaveletTransform(L, B, J_min)
    ndata = meas.ndata
    gammas = (rng.standard_normal(ndata) + 1j * rng.standard_normal(ndata)) * 0.01
    fwd = ForwardOperator(
        gammas, np.full(ndata, 0.1), "synthesis",
        transform=transform, measurement=meas, nparams=transform.ncoefs,
    )
    X = jnp.asarray(rng.standard_normal((NCH, fwd.nparams)), dtype=jnp.float32)

    if STAGE == "op_fwd":
        timed("ForwardOperator.forward", fwd.forward, X)
        return
    if STAGE == "op_grad":
        preds = jax.jit(fwd.forward)(X)
        sync(preds)
        timed("ForwardOperator.calc_gradg", fwd.calc_gradg, preds)
        return

    # stacked-real fast-path stages (ops/lensing.py)
    if STAGE in ("wl_fwd2", "wl_grad2", "wl_fid2", "wl_chain2"):
        from pxmcmc_tpu.ops.lensing import (
            build_wl_tables, wl_fidelity2, wl_forward2, wl_gradg2,
        )

        t = build_wl_tables(meas, fwd._data_np, fwd._invcov_np)
        wb = transform.basis
        if STAGE == "wl_fwd2":
            timed("wl_forward2", lambda x: wl_forward2(x, wb, t), X)
            return
        preds2 = jax.jit(lambda x: wl_forward2(x, wb, t))(X)
        sync(preds2)
        if STAGE == "wl_grad2":
            timed("wl_gradg2", lambda p: wl_gradg2(p, wb, t), preds2)
            return
        if STAGE == "wl_fid2":
            timed("wl_fidelity2", lambda p: wl_fidelity2(p, t), preds2)
            return
        if STAGE == "wl_chain2":
            timed(
                "forward+grad+fid chain",
                lambda x: wl_gradg2(wl_forward2(x, wb, t), wb, t)
                + wl_fidelity2(wl_forward2(x, wb, t), t)[..., None],
                X,
            )
            return

    if STAGE == "prox":
        from pxmcmc_tpu.mcmc import PxMCMCParams
        from pxmcmc_tpu.prior import S2_Wavelets_L1

        prior = S2_Wavelets_L1(
            "synthesis", fwd.transform.inverse, fwd.transform.inverse_adjoint,
            1e-12, L=L, B=B, J_min=J_min,
        )
        timed("prior.proxf", prior.proxf, X)
        return

    if STAGE == "scan5":
        # 5-iteration scan over just the fast-path gradient + noise: the
        # sampler step minus tracking/divergence machinery
        from pxmcmc_tpu.ops.lensing import build_wl_tables, wl_forward2, wl_gradg2

        t = build_wl_tables(meas, fwd._data_np, fwd._invcov_np)
        wb = transform.basis

        def body(x, key):
            g = wl_gradg2(wl_forward2(x, wb, t), wb, t)
            n = jax.random.normal(key, x.shape, x.dtype)
            return x - 1e-6 * g + 1e-3 * n, ()

        def blk(x, keys):
            x, _ = jax.lax.scan(body, x, keys)
            return x

        keys = jax.random.split(jax.random.key(1), 5)
        t0 = time.time()
        out = jax.jit(blk)(X, keys)
        v = sync(out)
        print(f"scan5 fastpath: {time.time()-t0:.1f}s sum={v:.4g}", flush=True)
        return

    if STAGE == "step":
        from pxmcmc_tpu.mcmc import MYULA, PxMCMCParams
        from pxmcmc_tpu.prior import S2_Wavelets_L1

        params = PxMCMCParams(
            nsamples=1, nburn=0, ngap=1, delta=1e-6, lmda=1e-6, mu=1,
            verbosity=0, nchains=NCH,
        )
        prior = S2_Wavelets_L1(
            "synthesis", fwd.transform.inverse, fwd.transform.inverse_adjoint,
            params.lmda * params.mu, L=L, B=B, J_min=J_min,
        )
        sampler = MYULA(fwd, prior, params, seed=0)
        sampler._prepare()
        Xs = jnp.asarray(
            rng.laplace(size=(NCH, fwd.nparams)), dtype=jnp.float32
        )
        preds = (
            jax.jit(fwd.forward_internal)(Xs) if sampler._needs_initial_preds else None
        )
        if preds is not None:
            sync(preds)
        state = sampler._init_state(Xs, preds)
        step = sampler._build_step()

        def blk(state, keys):
            state, _ = jax.lax.scan(step, state, keys)
            return state

        keys = jax.random.split(jax.random.key(1), 5)
        t0 = time.time()
        state = jax.jit(blk)(state, keys)
        v = sync(state.X)
        print(f"5-iter scan block: {time.time()-t0:.1f}s sum={v:.4g}", flush=True)
        return

    raise SystemExit(f"unknown stage {STAGE}")


if __name__ == "__main__":
    main()

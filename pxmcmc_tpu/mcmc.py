r"""Proximal MCMC samplers: MYULA, PxMALA, SKROCK — jit/scan/vmap native.

Behavioural parity with ``/root/reference/pxmcmc/mcmc.py`` re-architected for
TPU: the per-iteration work (wavelet synthesis, measurement op, adjoints,
prox, Euler-Maruyama update) is a pure function ``(key, state) -> state``
compiled once by XLA, wrapped in ``lax.scan`` over iterations, ``vmap`` over
chains, and (see :mod:`pxmcmc_tpu.parallel`) ``shard_map`` over a device
mesh.  The reference's data-dependent Python loop (``mcmc.py:157``) becomes
fixed-length scans; Metropolis accept/reject and Robbins-Monro step-size
tuning are branchless ``jnp.where`` selects so they vectorise across chains.

Differences from the reference, by design:

* Recording cadence: the reference records at iterations ``nburn, nburn+ngap,
  ...`` (``mcmc.py:166-168``); we run ``nburn`` burn-in steps then ``nsamples``
  blocks of ``max(ngap, 1)`` steps, recording after each block.  Statistically
  identical; shapes are static for XLA.
* PxMALA records the current (last-accepted) state at every block end and
  emits the full per-iteration acceptance/delta traces, rather than skipping
  blocks whose final proposal was rejected (``mcmc.py:263``).
* SKROCK implements the linear three-term Chebyshev recursion of the SK-ROCK
  scheme; the reference's recursive form (``mcmc.py:349-368``) re-evaluates
  lower stages exponentially many times.
* Real-valued sampling keeps the state real: gradients produced by the
  (complex) adjoint chain have zero imaginary part for real signals and the
  real part is taken explicitly, where the reference silently discards the
  imaginary part when writing into its float chain array (``mcmc.py:140``).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass


import jax
import jax.numpy as jnp
import numpy as np

from .config import complex_dtype, device_get_safe, real_dtype, to_device

__all__ = ["PxMCMCParams", "PxMCMC", "MYULA", "PxMALA", "SKROCK"]


class PxMCMCParams:
    """Tuning and runtime parameters (ref ``mcmc.py:6-43``).

    :param lmda: prox regularisation parameter of the Moreau-Yosida envelope
    :param delta: forward-Euler step size (MYULA, PxMALA)
    :param mu: prior regularisation weight
    :param s: Chebyshev stage count (SKROCK)
    :param nsamples: number of saved samples
    :param nburn: burn-in iterations
    :param ngap: thinning (iterations between saved samples)
    :param complex: sample complex parameters
    :param verbosity: print progress every ``verbosity`` iterations (0 = quiet)
    :param track: subset of {logposterior, predictions, chain, L2, prior}
    :param nchains: number of parallel chains (vmapped; beyond-reference)
    :param fused_step: use the Pallas fused prox+update+noise kernel
        (:mod:`pxmcmc_tpu.ops.threshold`) for real-valued MYULA with a
        synthesis soft-threshold prior; noise comes from the on-core PRNG so
        sample streams differ from (but are identically distributed to) the
        default path
    :param pyramid_state: carry the coefficient pyramid as a tuple of
        per-scale arrays instead of one flat vector (MYULA, PxMALA and
        SKROCK on the Gram and weak-lensing fast paths).  Removes the
        per-step concatenate / flat-vector slicing from the hot loop (~15%
        of the step in the round-3 profiler trace); the default since round
        4.  Sample streams differ from (but are identically distributed to)
        the flat layout because noise is drawn per scale; set False for the
        flat layout's streams
    """

    def __init__(
        self,
        lmda=3e-5,
        delta=1e-5,
        s=1,
        mu=1,
        nsamples=int(1e6),
        nburn=int(1e3),
        ngap=int(1e2),
        complex=False,
        verbosity=100,
        track=("logposterior", "L2", "prior", "chain"),
        nchains=1,
        fused_step=False,
        pyramid_state=True,
    ):
        self.lmda = lmda
        self.delta = delta
        self.mu = mu
        self.s = s
        self.nsamples = int(nsamples)
        self.nburn = int(nburn)
        self.ngap = int(ngap)
        self.complex = complex
        self.verbosity = int(verbosity)
        self.track = list(track)
        self.nchains = int(nchains)
        self.fused_step = bool(fused_step)
        self.pyramid_state = bool(pyramid_state)


def _flatten_records(blocks):
    """(nblk, nchains, ...) per-scale record blocks -> one flat array.

    Multi-process callers wrap this in jit so globally-sharded records
    assemble without touching non-addressable shards eagerly (plain eager
    ops on the record-buffer scale also overload the relayed backend's
    remote compiler when jitted as one program single-process); grid
    blocks (ndim 4) flatten their (theta, phi) tail first.
    """
    parts = [
        b.reshape(b.shape[:2] + (-1,)) if b.ndim > 3 else b for b in blocks
    ]
    return jnp.concatenate(parts, axis=-1)


def _mp_map_fold(lp, X):
    """Device-side block MAP fold for multi-process runs: argmax over the
    (nblk, nchains) logposteriors and the matching sample row, both
    replicated so every process can read them."""
    if isinstance(X, (tuple, list)):
        X = _flatten_records(tuple(X))
    idx = jnp.argmax(lp)
    bi, ci = idx // lp.shape[1], idx % lp.shape[1]
    return lp[bi, ci], X[bi, ci]


def _summary_init_pooled(xb):
    from .diagnostics import summary_init

    return summary_init(xb.reshape((-1,) + xb.shape[2:]))


def _summary_update_pooled(state, xb):
    from .diagnostics import summary_update

    return summary_update(state, xb.reshape((-1,) + xb.shape[2:]))


class PxMCMC:
    """Base sampler: posterior evaluation and shared runtime (ref ``mcmc.py:46-140``).

    :param forward: :class:`pxmcmc_tpu.forward.ForwardOperator`
    :param prior: object with ``prior(X)`` and ``proxf(X)`` (e.g. :class:`pxmcmc_tpu.prior.L1`)
    :param mcmcparams: :class:`PxMCMCParams`
    """

    def __init__(self, forward, prior, mcmcparams=None, seed=0):
        self.forward = forward
        self.prior = prior
        params = mcmcparams or PxMCMCParams()
        for attr in params.__dict__:
            setattr(self, attr, getattr(params, attr))
        self.params = params
        self.seed = seed
        self._summary = None
        self._xdtype = complex_dtype() if self.complex else real_dtype()

    # -- posterior ----------------------------------------------------------
    def logpi(self, X, preds):
        """(log posterior, L2, prior) of a sample (ref ``mcmc.py:71-82``)."""
        L2 = self.forward.fidelity_internal(preds)
        prior = self.prior.prior(X)
        return -self.mu * prior - L2, L2, prior

    def _gradlogpi(self, X, preds=None):
        """Moreau-Yosida envelope gradient (ref ``mcmc.py:84-89``).

        Uses the Gram fast path for the fidelity term when the model admits
        it (see :meth:`_gram_ok`), skipping pixel space entirely.
        """
        gradf = (X - self.prior.proxf(X)) / self.lmda
        if self._gram_ok():
            if not hasattr(self, "_gram"):
                self._setup_gram()
            gradg = self._gram_gradg(X)
        else:
            if preds is None:
                preds = self.forward.forward_internal(X)
            gradg = self._cast(self.forward.gradg_internal(preds))
        return -gradf - gradg

    def _gram_ok(self) -> bool:
        """Whether the normal-operator (Gram) gradient fast path applies:
        real chain, synthesis setting, square identity measurement, scalar
        real noise, spin-0 wavelet transform.  Directional (dirs > 1)
        transforms qualify since round 5 — their gradient dispatches to the
        stacked-real :mod:`pxmcmc_tpu.ops.dirgram` chain (the pyramid state
        layout stays axisymmetric-only)."""
        from .measurements import Identity
        from .transforms import SphericalWaveletTransform

        fwd = self.forward
        return (
            not self.complex
            and getattr(fwd, "setting", None) == "synthesis"
            and isinstance(getattr(fwd, "measurement", None), Identity)
            and fwd.measurement.ndata == fwd.measurement.npix
            and getattr(fwd, "_invcov_kind", None) == "scalar"
            and not jnp.iscomplexobj(fwd.invcov)
            and isinstance(getattr(fwd, "transform", None), SphericalWaveletTransform)
            and fwd.transform.spin == 0
            and not getattr(fwd.transform, "harmonic", False)
        )

    def _dirs(self) -> int:
        return getattr(getattr(self.forward, "transform", None), "dirs", 1)

    def _setup_gram(self):
        """Precompute Gram tables and the constant term b = S^T invcov y."""
        from .ops import sht as _sht

        tr = self.forward.transform
        self._gram = _sht.get_gram(tr.L, 0)
        y_weighted = (self.forward.invcov * self.forward.data).real.astype(
            real_dtype()
        )
        self._gram_b = self._cast(tr.inverse_adjoint(y_weighted))
        if self._dirs() > 1:
            from .ops.dirgram import build_dir_gram_tables

            self._dir_gram_tables = build_dir_gram_tables(tr.basis, self._gram)
        if self._pyramid_ok():
            self._gram_b_blocks = self._split_X(self._gram_b)
            flag = os.environ.get("PXMCMC_GRAM_PALLAS", "auto")
            from .ops.pallas_gram import _act_dtype

            if flag == "1" or (
                flag == "auto" and _act_dtype() == jnp.bfloat16
            ):
                # hand-fused (m, chain-tile) Pallas pipeline for the theta
                # GEMM + Gram-apply core (ops/pallas_gram.py) — the G/H
                # full-grid intermediates stay in VMEM.  Same operator;
                # sums associate differently.  Engaged automatically for
                # bf16-storage runs (where it measures 1.26x the XLA grid
                # chain, BENCH.md round 5); at f32 storage XLA's batched
                # GEMMs win, so 'auto' leaves it off there.  Falls back to
                # the XLA path when the basis has no fusable scale.
                from .ops.pallas_gram import build_gram_pallas_plan

                self._gram_pallas_plan = build_gram_pallas_plan(
                    tr.basis, self._gram
                )
            if os.environ.get("PXMCMC_GRAM_FUSED", "0") == "1":
                # fold the Gram apply into the adjoint theta tables (one
                # fewer m-batched GEMV + no full-grid H intermediate per
                # step); opt-in — sums associate differently, so sample
                # streams shift by f32 roundoff
                from .ops.wavelets import build_gram_qg

                self._gram_qg = build_gram_qg(tr.basis, self._gram)

    def _gram_gradg(self, X):
        if self._dirs() > 1:
            from .ops.dirgram import dir_gram_gradient

            stsx = dir_gram_gradient(
                X, self.forward.transform.basis, self._dir_gram_tables
            )
        else:
            from .ops.wavelets import gram_gradient_real

            stsx = gram_gradient_real(
                X, self.forward.transform.basis, self._gram
            )
        return self.forward.invcov * stsx - self._gram_b

    # -- pyramid state layout ------------------------------------------------
    # The sampled vector is a concatenation of per-scale wavelet grids; with
    # state carried as one flat array, every step pays a concatenate
    # (reshape + dynamic-update-slice layout copies) to assemble the
    # gradient and misaligned slices to split X — ~15% of the MYULA step in
    # the round-3 profiler trace.  With ``pyramid_state=True`` the state is
    # the tuple of per-scale segments; flattening happens only at record
    # (thinning) points — and chain/summary records stay per-block until the
    # host-copy boundary, so the gain survives recorded runs.  The per-scale
    # noise draws change the sample stream (identically distributed).

    def _pyramid_ok(self) -> bool:
        """Whether this sampler runs the per-scale-block (pyramid) state.

        Shared model-side conditions; samplers add their own (MYULA
        excludes the fused Pallas step, PxMALA needs a block form of the
        prior value).  Requires a real chain, a model with block-form
        gradients (Gram fast path or an operator advertising ``_blocks_ok``),
        and a plain soft-threshold synthesis prior.
        """
        from .prior import L1

        return (
            getattr(self, "pyramid_state", False)
            and not self.complex
            and (
                self._gram_ok()
                or getattr(self.forward, "_blocks_ok", lambda: False)()
            )
            and isinstance(self.prior, L1)
            and self.prior.setting == "synthesis"
            and type(self.prior).proxf is L1.proxf  # plain soft threshold
        )

    def _pyr_prox_fn(self):
        """blocks -> soft-thresholded blocks, with the (possibly vector)
        threshold split per scale.  Called at trace time: the per-scale views
        are loop-invariant slices of the capture-threaded T."""
        from .utils import soft

        T = self.prior.T
        T_blocks = self._split_X(T) if isinstance(T, jax.Array) and T.ndim else None

        def prox(blocks):
            return tuple(
                soft(x, T_blocks[i] if T_blocks is not None else T)
                for i, x in enumerate(blocks)
            )

        return prox

    def _pyr_prior_kind(self):
        """'plain' | 'weighted' | None — whether the prior value has an exact
        per-block form (sum of per-scale weighted-L1 partial sums)."""
        from .prior import L1, S2_Wavelets_L1, S2_Wavelets_L1_Power_Weights

        p = type(self.prior).prior
        if p is L1.prior:
            return "plain"
        if p in (S2_Wavelets_L1.prior, S2_Wavelets_L1_Power_Weights.prior):
            return "weighted"
        return None

    def _pyr_prior_fn(self):
        """blocks -> per-chain prior value, or None if no block form exists.

        Partial sums accumulate per scale, so values match the flat
        ``prior.prior`` up to summation order (same math, different
        rounding).  Called at trace time (see :meth:`_pyr_prox_fn`).
        """
        kind = self._pyr_prior_kind()
        if kind is None:
            return None
        w_blocks = (
            self._split_X(self.prior.map_weights) if kind == "weighted" else None
        )

        def prior_blocks(blocks):
            tot = 0.0
            for i, x in enumerate(blocks):
                xi = w_blocks[i] * x if w_blocks is not None else x
                tot = tot + jnp.sum(
                    jnp.abs(xi), axis=tuple(range(-(x.ndim - 1), 0))
                )
            return tot

        return prior_blocks

    def _pyr_noise(self, key, blocks):
        """Per-block Gaussian draws (real chains only — the pyramid gate
        excludes complex).  Streams differ from the flat layout's single
        draw; identically distributed."""
        return tuple(
            jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
            for i, x in enumerate(blocks)
        )

    def _pyr_gradg(self, X_blocks, preds=None):
        """Fidelity gradient as a per-scale tuple (Gram or operator blocks)."""
        if self._gram_ok():
            return self._gram_gradg_blocks(X_blocks)
        if preds is None:
            preds = self.forward.forward_internal_blocks(X_blocks)
        return tuple(
            self._cast(g) for g in self.forward.gradg_internal_blocks(preds)
        )

    def _pyr_dot(self, a, b):
        """sum_i <a_i, b_i> accumulated per block (batched over chains).

        Blocks are flat (..., ncoef) segments or grid-shaped with 2/3
        trailing coefficient axes (:meth:`_grid_blocks_ok`); the ``b``
        operand always carries the single chain batch dim, so the
        reduction covers its trailing ``ndim - 1`` axes.
        """
        tot = 0.0
        for ai, bi in zip(a, b):
            axes = tuple(range(-(bi.ndim - 1), 0))
            tot = tot + jnp.sum(ai * bi, axis=axes)
        return tot

    def _grid_blocks_ok(self) -> bool:
        """Whether pyramid blocks carry their native (theta, phi) grid shape.

        Flat (..., ncoef_j) segments force a tiled-layout relayout (measured
        ~3 ms/step at L=256/256 chains, round-5 trace: `reshape`+`copy`)
        every time the gradient views them as (theta, phi) maps; with the
        state held in grid shape the hot loop has no reshapes at all.
        Gated to the Gram fast path (the flagship/PxMALA/SKROCK synthesis
        configs); operator-block paths (weak lensing, analysis) keep flat
        segments.
        """
        return (
            self._pyramid_ok()
            and self._gram_ok()
            and os.environ.get("PXMCMC_PYRAMID_GRID", "1") != "0"
        )

    def _split_X(self, X):
        basis = self.forward.transform.basis
        if self._dirs() > 1:
            from .ops.wavelets import _split_dir

            blocks = tuple(_split_dir(X, basis))
            if self._grid_blocks_ok():
                G = 2 * basis.dirs - 1
                bls = [int(b) for b in basis.bandlimits]
                shaped = [
                    blocks[0].reshape(
                        blocks[0].shape[:-1] + (bls[0], 2 * bls[0] - 1)
                    )
                ]
                shaped += [
                    b.reshape(b.shape[:-1] + (G, bl, 2 * bl - 1))
                    for b, bl in zip(blocks[1:], bls[1:])
                ]
                blocks = tuple(shaped)
            return blocks
        from .ops.wavelets import _split_scales

        blocks = tuple(_split_scales(X, basis))
        if self._grid_blocks_ok():
            bls = basis.bandlimits
            blocks = tuple(
                b.reshape(b.shape[:-1] + (int(bl), 2 * int(bl) - 1))
                for b, bl in zip(blocks, bls)
            )
        return blocks

    def _flatten_X(self, X):
        if isinstance(X, jax.Array):
            return X
        # grid-shaped blocks: the scaling block carries (theta, phi) and
        # directional wavelet blocks (gamma, theta, phi) coefficient axes;
        # the batch prefix is everything before the scaling block's grid
        bls = [int(b) for b in self.forward.transform.basis.bandlimits]
        grid = X[0].ndim >= 2 and X[0].shape[-2:] == (bls[0], 2 * bls[0] - 1)
        if not grid:
            return jnp.concatenate(X, axis=-1)
        nb = X[0].ndim - 2
        parts = [x.reshape(x.shape[:nb] + (-1,)) for x in X]
        return jnp.concatenate(parts, axis=-1)

    def _gram_gradg_blocks(self, blocks):
        from .ops.wavelets import (
            gram_gradient_real_blocks,
            gram_gradient_real_blocks_fused,
        )

        if self._dirs() > 1:
            from .ops.dirgram import dir_gram_gradient_blocks

            stsx = dir_gram_gradient_blocks(
                blocks, self.forward.transform.basis, self._dir_gram_tables
            )
        elif getattr(self, "_gram_pallas_plan", None) is not None:
            from .ops.pallas_gram import gram_gradient_real_blocks_pallas

            stsx = gram_gradient_real_blocks_pallas(
                blocks, self.forward.transform.basis, self._gram_pallas_plan
            )
        elif getattr(self, "_gram_qg", None) is not None:
            stsx = gram_gradient_real_blocks_fused(
                blocks, self.forward.transform.basis, self._gram_qg
            )
        else:
            stsx = gram_gradient_real_blocks(
                blocks, self.forward.transform.basis, self._gram
            )
        return tuple(
            self.forward.invcov * s - b for s, b in zip(stsx, self._gram_b_blocks)
        )

    def _prepare(self):
        """Hook for precomputing derived device tables before capture setup."""
        if hasattr(self.forward, "prepare"):
            self.forward.prepare()
        if self._gram_ok() and not hasattr(self, "_gram"):
            self._setup_gram()

    @property
    def _needs_initial_preds(self) -> bool:
        """Whether _initial_sample must materialise predictions eagerly.

        The Gram fast path never reads them, and skipping the eager
        (uncompiled) forward pass matters on remote/tunnelled backends.
        """
        return True

    def _cast(self, v):
        """Project operator outputs onto the sampled dtype (real part for real chains)."""
        return v.real.astype(self._xdtype) if not self.complex else v.astype(self._xdtype)

    def _noise(self, key, shape):
        if self.complex:
            kr, ki = jax.random.split(key)
            return (
                jax.random.normal(kr, shape, dtype=real_dtype())
                + 1j * jax.random.normal(ki, shape, dtype=real_dtype())
            ).astype(self._xdtype)
        return jax.random.normal(key, shape, dtype=self._xdtype)

    def _initial_sample(self, start_point=None, key=None):
        """Laplace-random or user start point, batched to nchains (ref ``mcmc.py:97-111``)."""
        n = self.forward.nparams
        shape = (self.nchains, n)
        if start_point is None:
            key = key if key is not None else jax.random.key(self.seed)
            k1, k2 = jax.random.split(key)
            X = jax.random.laplace(k1, shape, dtype=real_dtype())
            if self.complex:
                X = X + 1j * jax.random.laplace(k2, shape, dtype=real_dtype())
            X = X.astype(self._xdtype)
        else:
            start_point = to_device(start_point)
            if start_point.ndim == 1:
                if start_point.shape[0] != n:
                    raise ValueError("Initial sample given has incorrect size")
                X = jnp.broadcast_to(start_point, shape).astype(self._xdtype)
            elif start_point.shape == shape:
                X = start_point.astype(self._xdtype)
            else:
                raise ValueError("Initial sample given has incorrect size")
        if not self._needs_initial_preds:
            return X, None
        preds = self.forward.forward_internal(X)
        return X, preds

    # -- runtime ------------------------------------------------------------
    @property
    def _gap(self) -> int:
        return max(self.ngap, 1)

    def _print_progress(self, j, logpi, **kwargs):
        extras = " - ".join(f"{k}: {np.mean(v):.8e}" for k, v in kwargs.items())
        print(f"{j+1:,}/{self.nsamples:,} - logposterior: {np.mean(logpi):.8e} - {extras}")

    def run(
        self,
        start_point=None,
        mesh=None,
        checkpoint_path=None,
        checkpoint_every=None,
        profile_dir=None,
        superblock=None,
    ):
        """Run the chain; fills the tracking arrays (host numpy).

        Executes as a Python loop over superblocks, each one jitted scan of
        ``block * gap`` steps, with thinned samples offloaded to host — the
        streaming replacement for the reference's all-in-RAM tracking arrays
        (``mcmc.py:113-128``).

        :param mesh: optional ``jax.sharding.Mesh`` with a 'chains' axis —
            state is sharded across it and XLA partitions every step
        :param checkpoint_path: optional ``.npz`` path for periodic
            checkpointing; if the file exists the run resumes from it
        :param checkpoint_every: checkpoint cadence in saved samples
            (default: once per superblock)
        :param profile_dir: if set, capture a ``jax.profiler`` trace of one
            superblock into this directory (beyond-reference; SURVEY.md §5
            notes the reference has no tracing at all)
        :param superblock: saved samples per jitted superblock (default:
            auto-sized to ~4e6 recorded values)

        After the run, ``self.runtime_seconds`` and
        ``self.iterations_per_second`` (aggregate chain-iterations/s, warm
        superblocks only) hold throughput observability data.

        With ``"summary"`` in ``track``, posterior mean / variance / credible
        -interval range per parameter (pooled across chains — they sample
        the same posterior) are accumulated **on device** (running moments +
        P^2 quantile sketches; no chain storage) and land in
        ``posterior_mean`` / ``posterior_var`` / ``ci_range`` — the
        production path for runs too large to keep thinned chains.  Summary
        state rides checkpoints, so summary runs resume exactly.
        """
        from .capture import CaptureThreader

        if "map" in self.track and "logposterior" not in self.track:
            raise ValueError(
                "track='map' needs per-record logposteriors: add "
                "'logposterior' to track"
            )
        self._map_logpi = float("-inf")
        self._map_X = None
        key = jax.random.key(self.seed)
        key, init_key = jax.random.split(key)
        X, preds = self._initial_sample(start_point, init_key)
        state = self._init_state(X, preds)
        if mesh is not None:
            from .parallel.mesh import shard_chain_pytree

            nshard = (
                mesh.shape["chains"] if "chains" in mesh.axis_names else mesh.size
            )
            if self.nchains % nshard != 0:
                raise ValueError(
                    f"nchains={self.nchains} must divide over {nshard} devices"
                )
            state = shard_chain_pytree(state, mesh)

        # multi-process (multi-host) runs: records, tracking and checkpoints
        # may only touch process-addressable shards (round-4 VERDICT missing
        # #1).  Each process keeps the tracking rows of its own contiguous
        # chain range and checkpoints its local state shards to its own
        # file; summary/MAP folds run jit-side with replicated outputs.
        self._run_mesh = mesh
        self._mp = jax.process_count() > 1
        if self._mp:
            if mesh is None:
                raise ValueError(
                    "multi-process runs need run(mesh=...) spanning all "
                    "processes' devices"
                )
            from .parallel.mesh import process_chain_slice

            self._chain_slice = process_chain_slice(self.nchains, mesh)
            if checkpoint_path is not None:
                checkpoint_path = (
                    f"{checkpoint_path}.proc{jax.process_index()}"
                )
        else:
            self._chain_slice = None

        self._prepare()
        # Every device table read through self.* becomes a jit argument, so
        # compiled programs carry no embedded weight constants (capture.py).
        threader = CaptureThreader([self])
        captures = threader.get()
        if mesh is not None and "m" in mesh.axis_names:
            # 2-D mesh: additionally split every per-m SHT table over the
            # 'm' axis (tensor parallelism for L^3 tables; round-2 VERDICT
            # weak #7) — XLA inserts the phi-contraction psum itself.
            from .parallel.mesh import shard_m_tables

            captures = shard_m_tables(captures, mesh)
        gap = self._gap

        # NOTE: the scan body is rebuilt *inside* each traced function —
        # lax.scan caches traced body jaxprs by function identity, and a body
        # shared across two outer jits would resurrect dead tracers from the
        # first trace (its captured attributes) inside the second.
        # Each saved sample's key derives from (base key, absolute sample
        # index), so the stream is invariant to superblock partitioning —
        # runs are bit-identical under any ``superblock`` size and resume
        # cadence (tested).
        def _superblock(state, key, j0, nblk):
            step = self._build_step()

            def gap_block(state, key):
                keys = jax.random.split(key, gap)
                state, traces = jax.lax.scan(step, state, keys)
                rec = self._record(state)
                return state, (rec, traces)

            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                j0 + jnp.arange(nblk)
            )
            state, (recs, traces) = jax.lax.scan(gap_block, state, keys)
            return state, recs, traces

        superblock_j = jax.jit(threader.wrap(_superblock), static_argnums=4)

        def exec_superblock(state, j0, nblk):
            return superblock_j(captures, state, sample_key, jnp.asarray(j0), nblk)

        # burn-in, in bounded chunks: one XLA program per <= chunk steps.
        # A production nburn (thousands of iterations x hundreds of chains)
        # as a single scan is a multi-minute device program, which relayed
        # TPU backends kill with an UNAVAILABLE deadline fault; chunking
        # keeps each dispatch seconds long at identical sample streams
        # (each chunk's keys derive from (burn key, chunk index)).
        # Resuming runs skip burn-in entirely: the checkpointed state is
        # already post-burn, and load_checkpoint would discard the result.
        resuming = checkpoint_path is not None and os.path.exists(checkpoint_path)
        if self.nburn > 0 and not resuming:
            chunk = max(1, int(os.environ.get("PXMCMC_BURN_CHUNK", 1000)))

            def _burn(state, key, i0, n):
                # per-step keys from the absolute burn index, so the stream
                # is invariant to the chunk size (same scheme as the
                # sampling superblocks)
                keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                    i0 + jnp.arange(n)
                )
                state, _ = jax.lax.scan(self._build_step(), state, keys)
                return state

            burn = jax.jit(threader.wrap(_burn), static_argnums=4)
            key, bkey = jax.random.split(key)
            done = 0
            while done < self.nburn:
                n = min(chunk, self.nburn - done)
                state = burn(captures, state, bkey, jnp.asarray(done), n)
                jax.block_until_ready(state.X)
                done += n
                if self.verbosity > 0 and self.nburn > chunk:
                    print(f"Burning in... {done:,}/{self.nburn:,}")

        # sampling in superblocks
        self._alloc_tracking()
        # auto superblock: bound the on-device record buffer
        # (nblk x nchains x nparams) to ~8e6 values (32 MB f32) — the chain
        # dimension counts (a 256-chain L=256 run OOMed the round-3
        # production attempt when it did not)
        block = superblock or max(
            1,
            min(
                self.nsamples,
                int(8e6) // max(self.forward.nparams * self.nchains, 1) + 1,
            ),
        )
        key, sample_key = jax.random.split(key)
        j = 0
        if resuming:
            from .parallel.checkpoint import load_checkpoint

            state, sample_key, j, tracking, summary = load_checkpoint(
                checkpoint_path, state
            )
            for name, arr in tracking.items():
                getattr(self, name)[: arr.shape[0]] = arr
            if summary is not None:
                st = summary.get("state")
                if st is not None and st["mean"].ndim != 1:
                    # pre-round-4 checkpoints carried per-chain summaries of
                    # shape (nchains, nparams); the summary now pools chains
                    # (O(nparams) memory — see _fold_summary).  Resuming one
                    # into the pooled accumulator would mis-broadcast.
                    raise ValueError(
                        "checkpoint holds a per-chain summary (shape "
                        f"{st['mean'].shape}) from an older version; rerun "
                        "from scratch or post-process the old checkpoint"
                    )
                self._summary = st
                self._summary_pending = summary.get("pending")
                self._summary_pix = summary.get("pixel_state")
                self._summary_pending_pix = summary.get("pixel_pending")
                if "map_X" in summary:
                    self._map_X = np.asarray(summary["map_X"])
                    self._map_logpi = float(np.asarray(summary["map_logpi"]))
        next_ckpt = j + (checkpoint_every or block)
        t_start = time.time()
        warm_iters = 0
        warm_time = 0.0
        profiled = False
        while j < self.nsamples:
            nblk = min(block, self.nsamples - j)
            if profile_dir is not None and not profiled and j > 0:
                profiled = True
                with jax.profiler.trace(profile_dir):
                    t0 = time.time()
                    state, recs, traces = exec_superblock(state, j, nblk)
                    jax.block_until_ready(state.X)
                    dt = time.time() - t0
            else:
                t0 = time.time()
                state, recs, traces = exec_superblock(state, j, nblk)
                jax.block_until_ready(state.X)
                dt = time.time() - t0
            if j > 0:  # skip the compile superblock for throughput stats
                warm_iters += nblk * gap * self.nchains
                warm_time += dt
            if "map" in self.track:
                self._fold_map(recs)
            if "summary" in self.track:
                xb = recs["chain"] if "chain" in self.track else recs.pop("chain")
                if isinstance(xb, (tuple, list)):
                    # pyramid records: assemble once per superblock for the
                    # device-side fold (amortised over nblk records; jitted
                    # under multi-process so shards stay device-side)
                    if self._mp:
                        xb = jax.jit(_flatten_records)(tuple(xb))
                    else:
                        xb = _flatten_records(tuple(xb))
                    if "chain" in self.track:
                        recs["chain"] = xb
                self._fold_summary(xb)
            elif "chain" not in self.track:
                recs.pop("chain", None)  # map-only record: not stored
            if "summary_pixel" in self.track:
                self._fold_summary(recs.pop("pixel"), suffix="_pix")
            if self._mp:
                from .parallel.mesh import local_tree

                recs, traces_h = local_tree(recs), local_tree(traces)
            else:
                recs, traces_h = device_get_safe(recs), device_get_safe(traces)
            self._store_tracking(j, nblk, recs, traces_h)
            j += nblk
            if self.verbosity > 0:
                self._progress(j, recs)
            if checkpoint_path is not None and (j >= next_ckpt or j >= self.nsamples):
                if not hasattr(self, "_ckpt_writer"):
                    from .parallel.checkpoint import AsyncCheckpointer

                    self._ckpt_writer = AsyncCheckpointer()
                # off the critical path: the worker thread fetches and
                # writes while the next superblocks execute (round-4
                # VERDICT weak #7 — the 614 MB production npz blocked the
                # sampling loop)
                self._ckpt_writer.submit(
                    checkpoint_path, state, sample_key, j, self._tracking_dict(j),
                    summary=self._summary_checkpoint_payload(),
                )
                next_ckpt = j + (checkpoint_every or block)
        if hasattr(self, "_ckpt_writer"):
            self._ckpt_writer.wait()
        if "summary" in self.track:
            self._finish_summary()
        if "summary_pixel" in self.track:
            self._finish_summary(suffix="_pix")
        if "map" in self.track and getattr(self, "_map_X", None) is not None:
            self.MAP_X = self._map_X
            self.MAP_logpi = self._map_logpi
        self.runtime_seconds = time.time() - t_start
        if "logposterior" in self.track and not np.isfinite(self.logPi).all():
            print(
                "WARNING: non-finite log-posterior values in the chain — the "
                "sampler diverged.  Reduce delta (and lmda) for this problem."
            )
        self.iterations_per_second = (
            warm_iters / warm_time if warm_time > 0 else
            self.nsamples * gap * self.nchains / max(self.runtime_seconds, 1e-9)
        )
        if self.verbosity > 0:
            print(
                f"throughput: {self.iterations_per_second:,.1f} chain-iterations/s "
                f"({self.nchains} chains)"
            )
        print("\nDONE")
        return self

    def _fold_summary(self, xb, suffix=""):
        """Fold a block of recorded samples into the device-side summary.

        Chains sample the same posterior, so the summary pools them: the
        (nrec, nchains, nparams) block enters the running moments and P^2
        sketches as nrec*nchains observations per parameter.  Pooling is
        also what keeps the sketch state O(nparams): per-(chain, param)
        sketches cost 12 GB at the production scale (256 chains x 4e5
        params) and OOM a v5e (round-3 production run).

        Observations are buffered until 5 exist (the P^2 sketches need 5
        seeds), so ``track='summary'`` works at any superblock size — the
        auto block shrinks below 5 exactly for the large-nparams runs the
        summary path exists for (round-1 VERDICT weak #7).

        ``suffix="_pix"`` maintains the second, pixel-space summary of the
        ``summary_pixel`` track (posterior mean / var / CI-range *maps*
        streamed with O(npix) memory — production runs never store chains).
        """
        from .diagnostics import summary_init, summary_update

        s_attr, p_attr = "_summary" + suffix, "_summary_pending" + suffix
        if getattr(self, "_mp", False):
            # multi-process: pooling happens inside jit (the chain axis is
            # globally sharded; eager reshapes would touch remote shards)
            # with replicated summary state every process can read/save.
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self._run_mesh, P())
            if getattr(self, s_attr, None) is None:
                if xb.shape[0] * xb.shape[1] < 5:
                    raise ValueError(
                        "multi-process summary folds need >= 5 pooled "
                        "records per superblock; increase superblock"
                    )
                setattr(
                    self, s_attr,
                    jax.jit(_summary_init_pooled, out_shardings=rep)(xb),
                )
            else:
                setattr(
                    self, s_attr,
                    jax.jit(_summary_update_pooled, out_shardings=rep)(
                        getattr(self, s_attr), xb
                    ),
                )
            return
        xb = xb.reshape((-1,) + xb.shape[2:])  # pool chains
        if getattr(self, s_attr, None) is None:
            pend = getattr(self, p_attr, None)
            if pend is not None:
                xb = jnp.concatenate([jnp.asarray(pend), xb], axis=0)
            if xb.shape[0] < 5:
                setattr(self, p_attr, xb)
                return
            setattr(self, p_attr, None)
            setattr(self, s_attr, jax.jit(summary_init)(xb))
        else:
            setattr(self, s_attr, jax.jit(summary_update)(getattr(self, s_attr), xb))

    def _finish_summary(self, suffix=""):
        """Materialise posterior_mean / posterior_var / ci_range on host."""
        from .diagnostics import summary_results

        state = getattr(self, "_summary" + suffix, None)
        pend = getattr(self, "_summary_pending" + suffix, None)
        if state is not None:
            if getattr(self, "_mp", False):
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(self._run_mesh, P())
                m, v, ci = jax.jit(
                    summary_results, out_shardings=(rep, rep, rep)
                )(state)
            else:
                m, v, ci = summary_results(state)
        elif pend is not None:
            # degenerate runs with < 5 records total: direct quantiles
            pend = jnp.asarray(pend)
            m = jnp.mean(pend, axis=0)
            v = jnp.var(pend, axis=0)
            ci = jnp.quantile(pend, 0.975, axis=0) - jnp.quantile(
                pend, 0.025, axis=0
            )
        else:
            return
        setattr(self, "posterior_mean" + suffix, np.asarray(jax.device_get(m)))
        setattr(self, "posterior_var" + suffix, np.asarray(jax.device_get(v)))
        setattr(self, "ci_range" + suffix, np.asarray(jax.device_get(ci)))

    def _pixel_record(self, X):
        """Pixel-space image of a sample (``summary_pixel`` track): the
        synthesis of the coefficient vector for synthesis-setting models
        with a transform, the (pixel-space) sample itself otherwise."""
        tr = getattr(self.forward, "transform", None)
        if getattr(self.forward, "setting", None) == "synthesis" and tr is not None:
            return tr.inverse(X).real
        return X.real

    def _fold_map(self, recs):
        """Track the maximum-a-posteriori sample across superblocks (``map``
        track): one device argmax over the block's recorded logposteriors,
        one small host transfer when the incumbent is beaten.  O(nparams)
        memory — MAP products without storing any chain."""
        lp = recs["logposterior"]
        if getattr(self, "_mp", False):
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self._run_mesh, P())
            best, xbest = jax.jit(_mp_map_fold, out_shardings=(rep, rep))(
                lp, recs["chain"]
            )
            if float(jax.device_get(best)) > self._map_logpi:
                from .config import to_host

                self._map_X = np.asarray(to_host(xbest))
                self._map_logpi = float(jax.device_get(best))
            return
        idx = int(jnp.argmax(lp))
        bi, ci = divmod(idx, lp.shape[1])
        best = float(lp[bi, ci])
        if best > self._map_logpi:
            from .config import to_host

            X = recs["chain"]
            if isinstance(X, (tuple, list)):
                xbest = np.concatenate(
                    [to_host(x[bi, ci]).reshape(-1) for x in X], axis=-1
                )
            else:
                xbest = to_host(X[bi, ci])  # complex-safe boundary
            self._map_X = xbest
            self._map_logpi = best

    def _summary_checkpoint_payload(self):
        out = {}
        if getattr(self, "_summary", None) is not None:
            out["state"] = self._summary
        if getattr(self, "_summary_pending", None) is not None:
            out["pending"] = self._summary_pending
        if getattr(self, "_summary_pix", None) is not None:
            out["pixel_state"] = self._summary_pix
        if getattr(self, "_summary_pending_pix", None) is not None:
            out["pixel_pending"] = self._summary_pending_pix
        if getattr(self, "_map_X", None) is not None:
            out["map_X"] = np.asarray(self._map_X)
            out["map_logpi"] = np.asarray(self._map_logpi)
        return out or None

    def _tracking_dict(self, j):
        out = {}
        for name in ("logPi", "L2s", "priors", "chain", "preds"):
            if hasattr(self, name):
                out[name] = getattr(self, name)[:j]
        return out

    def _progress(self, j, recs):
        if "logposterior" in self.track:
            self._print_progress(
                j - 1,
                self.logPi[j - 1],
                L2=self.L2s[j - 1] if "L2" in self.track else 0.0,
                prior=self.priors[j - 1] if "prior" in self.track else 0.0,
            )

    # -- tracking -----------------------------------------------------------
    @property
    def _local_nchains(self) -> int:
        """Chain rows this process tracks (= nchains unless multi-process)."""
        sl = getattr(self, "_chain_slice", None)
        return (sl.stop - sl.start) if sl is not None else self.nchains

    def _alloc_tracking(self):
        ns, nc = self.nsamples, self._local_nchains
        n = self.forward.nparams
        if "logposterior" in self.track:
            self.logPi = np.zeros((ns, nc))
        if "predictions" in self.track:
            self.preds = np.zeros(
                (ns, nc, self.forward.data.shape[-1]),
                dtype=complex if self.forward.iscomplex else float,
            )
        if "chain" in self.track:
            self.chain = np.zeros((ns, nc, n), dtype=complex if self.complex else float)
        if "L2" in self.track:
            self.L2s = np.zeros((ns, nc))
        if "prior" in self.track:
            self.priors = np.zeros((ns, nc))

    def _record(self, state):
        """Per-sample quantities emitted from the scan (device side).

        Pyramid runs that only record the chain (the ESS/production path)
        emit the per-scale tuple as is — the flat vector is assembled on the
        host after transfer (or once per superblock for the device-side
        summary fold), so recording does not reintroduce the concatenate
        the pyramid layout removed from the hot loop (round-3 VERDICT #4).
        """
        rec = {}
        need_logpi = {"logposterior", "L2", "prior"} & set(self.track)
        want_chain = {"chain", "summary", "map"} & set(self.track)
        want_pixel = "summary_pixel" in self.track
        pyramid = not isinstance(state.X, jax.Array)
        if (
            pyramid
            and not need_logpi
            and not want_pixel
            and "predictions" not in self.track
        ):
            if want_chain:
                rec["chain"] = tuple(state.X)
            return rec
        X = self._flatten_X(state.X)  # pyramid layout: flatten at record only
        preds = state.preds
        if preds is None and (need_logpi or "predictions" in self.track):
            preds = self.forward.forward_internal(X)  # gram path: on demand
        if need_logpi:
            logPi, L2, prior = self.logpi(X, preds)
            rec.update(logposterior=logPi, L2=L2, prior=prior)
        if want_chain:
            rec["chain"] = X
        if "predictions" in self.track:
            rec["predictions"] = self.forward.preds_to_data(preds)
        if want_pixel:
            rec["pixel"] = self._pixel_record(X)
        return rec

    def _store_tracking(self, j, nblk, recs, traces):
        sl = slice(j, j + nblk)
        if "logposterior" in self.track:
            self.logPi[sl] = recs["logposterior"]
        if "L2" in self.track:
            self.L2s[sl] = recs["L2"]
        if "prior" in self.track:
            self.priors[sl] = recs["prior"]
        if "chain" in self.track:
            c = recs["chain"]
            if isinstance(c, (tuple, list)):  # pyramid records: host concat
                c = np.concatenate(
                    [
                        np.asarray(ci).reshape(ci.shape[0], ci.shape[1], -1)
                        for ci in c
                    ],
                    axis=-1,
                )
            self.chain[sl] = c
        if "predictions" in self.track:
            self.preds[sl] = recs["predictions"]

    # -- to be provided by subclasses ---------------------------------------
    def _init_state(self, X, preds):
        raise NotImplementedError

    def _build_step(self):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# MYULA
# ---------------------------------------------------------------------------

@dataclass
class ChainState:
    X: jax.Array
    preds: jax.Array


jax.tree_util.register_dataclass(ChainState, data_fields=["X", "preds"], meta_fields=[])


class MYULA(PxMCMC):
    """Moreau-Yosida Unadjusted Langevin (ref ``mcmc.py:143-201``).

    One step:  X' = (1 - delta/lmda) X + (delta/lmda) prox_f(X)
               - delta grad_g + sqrt(2 delta) w,   w ~ N(0, I).

    When the model is a real synthesis-setting wavelet denoiser (square
    identity measurement, scalar noise), the data-fidelity gradient runs
    through precomputed per-m Gram tables (``ops.sht.get_gram``) — exactly
    the same linear operator as the pixel-space chain at ~1/3 of the flops,
    and predictions are only materialised at record points.
    """

    @property
    def _needs_initial_preds(self) -> bool:
        return not self._gram_ok()

    def _pyramid_ok(self) -> bool:
        return super()._pyramid_ok() and not self._can_fuse()

    def _init_state(self, X, preds):
        if self._pyramid_ok():
            return ChainState(
                X=self._split_X(X), preds=None if self._gram_ok() else preds
            )
        if self._gram_ok():
            return ChainState(X=X, preds=None)
        return ChainState(X=X, preds=preds)

    def chain_step(self, X, proxf, gradg, w, delta=None):
        """Euler-Maruyama step (ref ``mcmc.py:185-201``)."""
        delta = self.delta if delta is None else delta
        return (
            (1 - delta / self.lmda) * X
            + (delta / self.lmda) * proxf
            - delta * gradg
            + jnp.sqrt(2 * delta) * w
        )

    def _build_step(self):
        gram = self._gram_ok()
        if gram and not hasattr(self, "_gram"):
            self._setup_gram()

        def compute_gradg(state):
            if gram:
                return self._gram_gradg(state.X)
            return self._cast(self.forward.gradg_internal(state.preds))

        def next_state(X):
            return ChainState(
                X=X, preds=None if gram else self.forward.forward_internal(X)
            )

        if self._pyramid_ok():
            # trace-time reads: T threads through the capture machinery; the
            # per-scale views are loop-invariant slices (never cached on self
            # — _build_step may run inside an outer trace)
            prox = self._pyr_prox_fn()

            def step_pyr(state, key):
                gradg = self._pyr_gradg(state.X, state.preds)
                proxf = prox(state.X)
                ws = self._pyr_noise(key, state.X)
                Xn = tuple(
                    self.chain_step(x, p, g, w)
                    for x, p, g, w in zip(state.X, proxf, gradg, ws)
                )
                preds = None if gram else self.forward.forward_internal_blocks(Xn)
                return ChainState(X=Xn, preds=preds), ()

            return step_pyr

        if self._can_fuse():
            from .ops.threshold import myula_fused_step

            def step(state, key):
                gradg = compute_gradg(state)
                seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
                # read self.prior.T at trace time so it threads through the
                # capture machinery instead of binding a constant
                X = myula_fused_step(
                    state.X, gradg, self.prior.T, self.delta, self.lmda, seed
                )
                return next_state(X), ()

            return step

        def step(state, key):
            gradg = compute_gradg(state)
            proxf = self.prior.proxf(state.X)
            w = self._noise(key, state.X.shape)
            X = self.chain_step(state.X, proxf, gradg, w)
            return next_state(X), ()

        return step

    def _can_fuse(self) -> bool:
        """Fused Pallas step applies to real-valued synthesis soft-threshold
        priors on TPU backends only — the Pallas interpreter used on CPU stubs
        the on-core PRNG to zeros, which would silently disable the noise."""
        return (
            getattr(self, "fused_step", False)
            and not self.complex
            and getattr(self.prior, "setting", None) == "synthesis"
            and hasattr(self.prior, "T")
            and jax.default_backend() != "cpu"
        )


# ---------------------------------------------------------------------------
# PxMALA
# ---------------------------------------------------------------------------

@dataclass
class MALAState:
    X: jax.Array
    preds: jax.Array
    gradg: jax.Array
    proxf: jax.Array
    logpi: jax.Array
    L2: jax.Array
    prior: jax.Array
    delta: jax.Array  # per-chain tuned step size
    it: jax.Array  # iteration counter (scalar int32)


jax.tree_util.register_dataclass(
    MALAState,
    data_fields=["X", "preds", "gradg", "proxf", "logpi", "L2", "prior", "delta", "it"],
    meta_fields=[],
)


class PxMALA(MYULA):
    """MYULA proposal + Metropolis-Hastings correction (ref ``mcmc.py:204-289``).

    :param tune_delta: Robbins-Monro tuning of ``delta`` toward 0.5 acceptance
        (``mcmc.py:277-279``), per chain.
    :param target: which density the MH step corrects toward —
        ``"consistent"`` (default) accepts against ``-mu*prior - L2/2``, the
        density whose gradient the MYULA proposal drift actually uses;
        ``"reference"`` accepts against ``-mu*prior - L2``, the reference's
        convention (``/root/reference/pxmcmc/mcmc.py:242-245``), which
        double-counts the fidelity relative to its own drift and therefore
        samples a posterior with halved fidelity variance.  See PARITY.md
        for measured numbers.
    """

    def __init__(self, forward, prior, mcmcparams=None, tune_delta=True, seed=0,
                 target="consistent"):
        super().__init__(forward, prior, mcmcparams, seed=seed)
        if target not in ("consistent", "reference"):
            raise ValueError("target must be 'consistent' or 'reference'")
        self.target = target
        self.tune_delta = tune_delta
        self._acc_buf = None
        self._delta_buf = None
        self._trace_n = 0

    @property
    def acceptance_trace(self):
        """Per-iteration acceptance flags, shape (iterations so far, nchains)."""
        return None if self._acc_buf is None else self._acc_buf[: self._trace_n]

    @property
    def deltas_trace(self):
        """Per-iteration tuned step sizes, shape (iterations so far, nchains)."""
        return None if self._delta_buf is None else self._delta_buf[: self._trace_n]

    def _prepare(self):
        super()._prepare()
        if self._gram_ok() and not hasattr(self, "_gram_c2"):
            # constant term of the coefficient-space fidelity: y^H invcov y
            self._gram_c2 = jnp.real(
                jnp.vdot(self.forward.data, self.forward.invcov * self.forward.data)
            ).astype(real_dtype())

    def _gram_fidelity(self, X, gradg):
        """L2 from the gradient already in hand (no pixel space):

        with g = c S^T S X - b and b = S^T(c y),
        L2 = y^H c y - b.X + X.g  (all real, batched over chains)."""
        return (
            self._gram_c2
            - jnp.sum(self._gram_b * X, axis=-1)
            + jnp.sum(gradg * X, axis=-1)
        )

    def _gram_fidelity_blocks(self, X_blocks, gradg_blocks):
        """Per-scale-block form of :meth:`_gram_fidelity` (partial sums
        accumulate per block; same math, summation order differs)."""
        return (
            self._gram_c2
            - self._pyr_dot(self._gram_b_blocks, X_blocks)
            + self._pyr_dot(gradg_blocks, X_blocks)
        )

    def _pyramid_ok(self) -> bool:
        # the MH correction evaluates the prior value every step, so PxMALA
        # additionally needs an exact per-block form of prior.prior; the
        # per-chain delta broadcasting in _build_step_pyr assumes the
        # axisymmetric block rank
        return (
            super()._pyramid_ok()
            and self._pyr_prior_kind() is not None
            and self._dirs() == 1
        )

    def _pyr_fidelity(self, X_blocks, gradg_blocks, preds):
        if self._gram_ok():
            return self._gram_fidelity_blocks(X_blocks, gradg_blocks)
        return self.forward.fidelity_internal(preds)

    def _init_state(self, X, preds):
        if self._pyramid_ok():
            self._prepare()
            Xb = self._split_X(X)
            if self._gram_ok():
                prop_preds = None
                gradg = self._gram_gradg_blocks(Xb)
            else:
                prop_preds = self.forward.forward_internal_blocks(Xb)
                gradg = tuple(
                    self._cast(g)
                    for g in self.forward.gradg_internal_blocks(prop_preds)
                )
            L2 = self._pyr_fidelity(Xb, gradg, prop_preds)
            prior = self._pyr_prior_fn()(Xb)
            return MALAState(
                X=Xb,
                preds=prop_preds,
                gradg=gradg,
                proxf=self._pyr_prox_fn()(Xb),
                logpi=-self.mu * prior - L2,
                L2=L2,
                prior=prior,
                delta=jnp.full((self.nchains,), self.delta, dtype=real_dtype()),
                it=jnp.zeros((), dtype=jnp.int32),
            )
        if self._gram_ok():
            self._prepare()
            gradg = self._gram_gradg(X)
            L2 = self._gram_fidelity(X, gradg)
            prior = self.prior.prior(X)
            return MALAState(
                X=X,
                preds=None,
                gradg=gradg,
                proxf=self.prior.proxf(X),
                logpi=-self.mu * prior - L2,
                L2=L2,
                prior=prior,
                delta=jnp.full((self.nchains,), self.delta, dtype=real_dtype()),
                it=jnp.zeros((), dtype=jnp.int32),
            )
        logpi, L2, prior = self.logpi(X, preds)
        return MALAState(
            X=X,
            preds=preds,
            gradg=self._cast(self.forward.gradg_internal(preds)),
            proxf=self.prior.proxf(X),
            logpi=logpi,
            L2=L2,
            prior=prior,
            delta=jnp.full((self.nchains,), self.delta, dtype=real_dtype()),
            it=jnp.zeros((), dtype=jnp.int32),
        )

    def calc_logtransition(self, X1, X2, proxf, gradg, delta):
        """log q(X2 | X1) of the MYULA proposal kernel (ref ``mcmc.py:281-289``).

        The proposal (``chain_step``) is X2 = X1 + delta * gradlogpi(X1) +
        sqrt(2 delta) w, so q is Gaussian with mean m = X1 + delta * gradlogpi
        and covariance 2 delta I: log q = -||X2 - m||^2 / (4 delta).  The
        reference's expression uses a half-step mean, squares the summed
        square, and scales by delta/2 (``mcmc.py:286-289``) — transcription
        slips that break detailed balance; we use the exact kernel.
        """
        gradlogpiX1 = -((X1 - proxf) / self.lmda) - gradg
        m = X1 + delta[..., None] * gradlogpiX1
        r = X2 - m
        return -jnp.sum(jnp.abs(r) ** 2, axis=-1) / (4 * delta)

    def _logtarget(self, prior, L2):
        """log of the density the MH step corrects toward.

        The proposal drift uses gradg = grad(L2/2) — the exact gradient of
        the Gaussian log-likelihood -L2/2 — so the matching target is
        -mu*prior - L2/2.  (The reference accepts against its reported
        ``logpi`` = -mu*prior - L2, double-counting the fidelity relative to
        its own drift; its MYULA and PxMALA therefore sample *different*
        posteriors.  By default both samplers here target
        exp(-mu*prior - L2/2); ``target="reference"`` reproduces the
        reference convention — MH corrects any proposal toward its target,
        so that mode samples exp(-mu*prior - L2) exactly, i.e. the fidelity
        with variance sigma^2/2.  Measured numbers in PARITY.md.  The
        reported/saved ``logposterior`` keeps the reference's convention
        either way.)
        """
        if self.target == "reference":
            return -self.mu * prior - L2
        return -self.mu * prior - L2 / 2

    def _tune(self, delta, accept, it):
        """Robbins-Monro toward 0.5 acceptance, clamped (ref ``mcmc.py:277-279``)."""
        new = delta * (1 + (accept.astype(real_dtype()) - 0.5) / (it + 1.0) ** 0.75)
        return jnp.clip(new, self.lmda * 1e-8, self.lmda / 2)

    def _build_step_pyr(self):
        """Pyramid-state MH step: proposal, gradients, fidelity, prior and
        transition kernels all run per scale block; only the per-chain
        scalars (logalpha, acceptance, delta) are flat.  Streams differ from
        the flat layout (per-block noise draws); identically distributed."""
        gram = self._gram_ok()
        self._prepare()
        prox = self._pyr_prox_fn()
        prior_fn = self._pyr_prior_fn()
        grid = self._grid_blocks_ok()
        axes = (-2, -1) if grid else (-1,)
        # per-chain delta broadcast over the block's coefficient axes
        bexp = (lambda dd: dd[..., None, None]) if grid else (lambda dd: dd[..., None])

        def logtrans(X1, X2, proxf, gradg, delta):
            # block form of calc_logtransition: -||X2 - m||^2 / (4 delta)
            d = bexp(delta)
            tot = 0.0
            for x1, x2, p, g in zip(X1, X2, proxf, gradg):
                m = x1 + d * (-((x1 - p) / self.lmda) - g)
                r = x2 - m
                tot = tot + jnp.sum(r * r, axis=axes)
            return -tot / (4 * delta)

        def step(state, key):
            kn, ka = jax.random.split(key)
            d = bexp(state.delta)
            ws = self._pyr_noise(kn, state.X)
            X_prop = tuple(
                (1 - d / self.lmda) * x
                + (d / self.lmda) * p
                - d * g
                + jnp.sqrt(2 * d) * w
                for x, p, g, w in zip(state.X, state.proxf, state.gradg, ws)
            )
            if gram:
                prop_preds = None
                gradg_prop = self._gram_gradg_blocks(X_prop)
            else:
                prop_preds = self.forward.forward_internal_blocks(X_prop)
                gradg_prop = tuple(
                    self._cast(g)
                    for g in self.forward.gradg_internal_blocks(prop_preds)
                )
            L2Xp = self._pyr_fidelity(X_prop, gradg_prop, prop_preds)
            priorXp = prior_fn(X_prop)
            logpiXp = -self.mu * priorXp - L2Xp
            proxf_prop = prox(X_prop)

            logalpha = (
                logtrans(X_prop, state.X, proxf_prop, gradg_prop, state.delta)
                + self._logtarget(priorXp, L2Xp)
                - logtrans(state.X, X_prop, state.proxf, state.gradg, state.delta)
                - self._logtarget(state.prior, state.L2)
            )
            u = jax.random.uniform(ka, logalpha.shape, dtype=real_dtype())
            accept = jnp.log(u) < logalpha

            def sel1(a, b):
                cond = accept.reshape(accept.shape + (1,) * (a.ndim - accept.ndim))
                return jnp.where(cond, a, b)

            def sel(a, b):
                if a is None:
                    return None
                if isinstance(a, tuple):
                    return tuple(sel1(ai, bi) for ai, bi in zip(a, b))
                return sel1(a, b)

            new_delta = (
                self._tune(state.delta, accept, state.it.astype(real_dtype()))
                if self.tune_delta
                else state.delta
            )
            new_state = MALAState(
                X=sel(X_prop, state.X),
                preds=sel(prop_preds, state.preds),
                gradg=sel(gradg_prop, state.gradg),
                proxf=sel(proxf_prop, state.proxf),
                logpi=sel(logpiXp, state.logpi),
                L2=sel(L2Xp, state.L2),
                prior=sel(priorXp, state.prior),
                delta=new_delta,
                it=state.it + 1,
            )
            return new_state, (accept.astype(jnp.int8), new_delta)

        return step

    def _build_step(self):
        if self._pyramid_ok():
            return self._build_step_pyr()
        gram = self._gram_ok()
        if gram:
            self._prepare()

        def step(state, key):
            kn, ka = jax.random.split(key)
            w = self._noise(kn, state.X.shape)
            delta = state.delta[..., None]
            X_prop = (
                (1 - delta / self.lmda) * state.X
                + (delta / self.lmda) * state.proxf
                - delta * state.gradg
                + jnp.sqrt(2 * delta) * w
            )
            if gram:
                prop_preds = None
                gradg_prop = self._gram_gradg(X_prop)
                L2Xp = self._gram_fidelity(X_prop, gradg_prop)
                priorXp = self.prior.prior(X_prop)
                logpiXp = -self.mu * priorXp - L2Xp
            else:
                prop_preds = self.forward.forward_internal(X_prop)
                gradg_prop = self._cast(self.forward.gradg_internal(prop_preds))
                logpiXp, L2Xp, priorXp = self.logpi(X_prop, prop_preds)
            proxf_prop = self.prior.proxf(X_prop)

            logtransXcXp = self.calc_logtransition(
                state.X, X_prop, state.proxf, state.gradg, state.delta
            )
            logtransXpXc = self.calc_logtransition(
                X_prop, state.X, proxf_prop, gradg_prop, state.delta
            )
            logalpha = (
                logtransXpXc
                + self._logtarget(priorXp, L2Xp)
                - logtransXcXp
                - self._logtarget(state.prior, state.L2)
            )
            u = jax.random.uniform(ka, logalpha.shape, dtype=real_dtype())
            accept = jnp.log(u) < logalpha

            def sel(a, b):
                if a is None:
                    return None
                cond = accept.reshape(accept.shape + (1,) * (a.ndim - accept.ndim))
                return jnp.where(cond, a, b)

            new_delta = (
                self._tune(state.delta, accept, state.it.astype(real_dtype()))
                if self.tune_delta
                else state.delta
            )
            new_state = MALAState(
                X=sel(X_prop, state.X),
                preds=sel(prop_preds, state.preds),
                gradg=sel(gradg_prop, state.gradg),
                proxf=sel(proxf_prop, state.proxf),
                logpi=sel(logpiXp, state.logpi),
                L2=sel(L2Xp, state.L2),
                prior=sel(priorXp, state.prior),
                delta=new_delta,
                it=state.it + 1,
            )
            return new_state, (accept.astype(jnp.int8), new_delta)

        return step

    def _alloc_tracking(self):
        super()._alloc_tracking()
        # Preallocate the full per-iteration traces once (sizes are static) —
        # growing by np.concatenate every superblock is quadratic in run
        # length (round-2 VERDICT weak #6).
        total = self.nsamples * self._gap
        self._acc_buf = np.zeros((total, self._local_nchains), dtype=np.int8)
        self._delta_buf = np.zeros((total, self._local_nchains), dtype=np.float32)
        self._trace_n = 0

    def _store_tracking(self, j, nblk, recs, traces):
        super()._store_tracking(j, nblk, recs, traces)
        accepts, deltas = traces  # (nblk, gap, local nchains)
        a = accepts.reshape(-1, self._local_nchains)
        d = deltas.reshape(-1, self._local_nchains)
        i0 = j * self._gap
        self._acc_buf[i0 : i0 + a.shape[0]] = a
        self._delta_buf[i0 : i0 + d.shape[0]] = d
        self._trace_n = max(self._trace_n, i0 + a.shape[0])
        self.delta_final = d[-1]

    def _progress(self, j, recs):
        if "logposterior" in self.track and self.acceptance_trace is not None:
            self._print_progress(
                j - 1,
                self.logPi[j - 1],
                L2=self.L2s[j - 1] if "L2" in self.track else 0.0,
                prior=self.priors[j - 1] if "prior" in self.track else 0.0,
                acceptanceRate=np.mean(self.acceptance_trace),
            )


# ---------------------------------------------------------------------------
# SKROCK
# ---------------------------------------------------------------------------

class SKROCK(PxMCMC):
    """Stabilised Runge-Kutta-Chebyshev Langevin (ref ``mcmc.py:292-383``).

    Implements the linear three-term SK-ROCK recursion

        K_0 = X
        K_1 = X + mu_1 delta G(X + nu_1 sqrt(2 delta) Z) + k_1 sqrt(2 delta) Z
        K_j = mu_j delta G(K_{j-1}) + nu_j K_{j-1} + k_j K_{j-2}

    with G = grad log pi (Moreau-Yosida), omega_0 = 1 + eta/s^2,
    omega_1 = T_s(omega_0) / T_s'(omega_0), and for j >= 2

        mu_j = 2 omega_1 T_{j-1}(omega_0) / T_j(omega_0)
        nu_j = 2 omega_0 T_{j-1}(omega_0) / T_j(omega_0)
        k_j  = 1 - nu_j  ( = -T_{j-2}(omega_0)/T_j(omega_0) ).

    The reference's recursive ``_K_recursion`` (``mcmc.py:349-368``) evaluates
    lower stages exponentially many times and adds ``ks[j]`` as a scalar; this
    is the intended linear scheme.
    """

    def __init__(self, forward, prior, mcmcparams=None, seed=0):
        super().__init__(forward, prior, mcmcparams, seed=seed)
        self.eta = 0.05
        s = self.s
        w0 = 1 + self.eta / (s * s)
        # Chebyshev values via the iterative recurrences in utils
        from .utils import cheb1der, chebyshev1

        self.omega_0 = w0
        self.omega_1 = chebyshev1(w0, s) / cheb1der(w0, s)
        mus = np.zeros(s + 1)
        nus = np.zeros(s + 1)
        ks = np.zeros(s + 1)
        mus[1] = self.omega_1 / w0
        nus[1] = s * self.omega_1 / 2
        ks[1] = s * self.omega_1 / w0
        T = [float(chebyshev1(w0, j)) for j in range(s + 1)]
        for j in range(2, s + 1):
            ratio = T[j - 1] / T[j]
            mus[j] = 2 * self.omega_1 * ratio
            nus[j] = 2 * w0 * ratio
            ks[j] = 1 - nus[j]
        self.mus, self.nus, self.ks = mus, nus, ks

    @property
    def _needs_initial_preds(self) -> bool:
        return not self._gram_ok()

    def _init_state(self, X, preds):
        if self._pyramid_ok():
            return ChainState(
                X=self._split_X(X), preds=None if self._gram_ok() else preds
            )
        if self._gram_ok():
            return ChainState(X=X, preds=None)
        return ChainState(X=X, preds=preds)

    def chain_step(self, X, Z):
        """One SK-ROCK update (linear recursion over s stages)."""
        sq = jnp.sqrt(2 * self.delta)
        K_prev = X
        K = X + self.mus[1] * self.delta * self._gradlogpi(X + self.nus[1] * sq * Z) + self.ks[1] * sq * Z
        for j in range(2, self.s + 1):
            K, K_prev = (
                self.mus[j] * self.delta * self._gradlogpi(K)
                + self.nus[j] * K
                + self.ks[j] * K_prev,
                K,
            )
        return K

    def _build_step(self):
        gram = self._gram_ok()
        if gram and not hasattr(self, "_gram"):
            self._setup_gram()

        if self._pyramid_ok():
            prox = self._pyr_prox_fn()

            def gradlogpi_b(Xb):
                # Moreau-Yosida gradient per block: the stage points are
                # interior evaluations, so the non-Gram path re-runs the
                # block forward each stage (same as the flat layout)
                proxf = prox(Xb)
                gradg = self._pyr_gradg(Xb)
                return tuple(
                    ((p - x) / self.lmda) - g
                    for x, p, g in zip(Xb, proxf, gradg)
                )

            def chain_step_b(Xb, Zb):
                sq = jnp.sqrt(2 * self.delta)
                inner = tuple(
                    x + self.nus[1] * sq * z for x, z in zip(Xb, Zb)
                )
                G = gradlogpi_b(inner)
                K_prev = Xb
                K = tuple(
                    x + self.mus[1] * self.delta * g + self.ks[1] * sq * z
                    for x, g, z in zip(Xb, G, Zb)
                )
                for j in range(2, self.s + 1):
                    G = gradlogpi_b(K)
                    K, K_prev = (
                        tuple(
                            self.mus[j] * self.delta * g
                            + self.nus[j] * k
                            + self.ks[j] * kp
                            for g, k, kp in zip(G, K, K_prev)
                        ),
                        K,
                    )
                return K

            def step_pyr(state, key):
                Z = self._pyr_noise(key, state.X)
                X = chain_step_b(state.X, Z)
                preds = (
                    None if gram else self.forward.forward_internal_blocks(X)
                )
                return ChainState(X=X, preds=preds), ()

            return step_pyr

        def step(state, key):
            Z = self._noise(key, state.X.shape)
            X = self.chain_step(state.X, Z)  # _gradlogpi uses the gram path
            preds = None if gram else self.forward.forward_internal(X)
            return ChainState(X=X, preds=preds), ()

        return step

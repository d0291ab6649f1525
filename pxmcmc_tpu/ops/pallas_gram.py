r"""Hand-fused Pallas pipeline for the Gram-gradient hot loop.

The flagship MYULA step is 88% one GEMM pipeline (BENCH.md round-4
profiling): per wavelet scale a phi-DFT, a theta GEMM, the cross-scale
ascending accumulation into the (m >= 0, l) half-spectrum grid, the per-m
Gram apply, and the per-scale adjoint theta GEMM + phi synthesis.  Under
stock XLA each stage materialises its (chains, 2, L, L)-sized intermediate
in HBM (~134 MB each at L=256 / 256 chains) and the per-scale shapes are
too skinny for XLA to fuse across stages, leaving the MXU at ~20-40%
utilisation (the round-4 ceiling analysis).

This module fuses the *theta/Gram core* of that pipeline — everything
between the phi stages — into one Pallas kernel over a grid of
(m, chain-tile) programs:

    per m:   G[l]  = sum_j  qk_j[m] @ F_j[m]          (theta GEMMs, VMEM)
             H[l]  = gram[m] @ G                      (Gram apply, VMEM)
             Ft_j[m] = qk_j[m]^T @ H[:bl_j]           (adjoint theta GEMMs)

with the per-m working set (per-scale theta tables, the Gram slice, the
G/H accumulators) resident in VMEM — the full-grid G and H intermediates
never touch HBM.  The phi-direction DFTs stay XLA einsums (they contract
over the full phi axis, so a per-m kernel would re-read the whole map per
m); they read/write the per-scale (m, t, chains) arrays the kernel consumes
and produces, in separate re/im planes so no stack/transpose copies appear
anywhere in the chain.

Scales below ``PXMCMC_PALLAS_BIG_MIN`` (default 64) carry ~3% of the work
in sub-MXU-tile shapes; their forward contribution enters the kernel as a
precomputed (cut, cut, chains) grid and their adjoint reads the kernel's
H[:cut] output — both tiny XLA side computations.

Exactly the same linear operator as
:func:`pxmcmc_tpu.ops.wavelets.gram_gradient_real_blocks` (tested);
floating-point sums associate differently.  Reference behaviour spec: the
gradient chain at ``/root/reference/pxmcmc/forward.py:66-72`` composed with
the wavelet synthesis/adjoint at ``/root/reference/pxmcmc/transforms.py``.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import sht

__all__ = ["GramPallasPlan", "build_gram_pallas_plan", "gram_gradient_real_blocks_pallas"]


def _big_min() -> int:
    return int(os.environ.get("PXMCMC_PALLAS_BIG_MIN", "64"))


def _act_dtype():
    """Storage dtype for the pipeline's big intermediates and theta tables.

    The gradient is HBM-bound (measured: f32-vs-bf16 *compute* precision
    changes nothing, BENCH.md round 5), so halving the bytes of the per-scale
    (m, t, chains) planes and the theta/Gram tables is the lever that pays.
    ``PXMCMC_PALLAS_DTYPE`` overrides; defaults to bfloat16 exactly when the
    run already opted into bf16 matmul precision (PXMCMC_MATMUL_PRECISION),
    float32 otherwise.  Accumulation stays f32 in VMEM either way.
    """
    name = os.environ.get(
        "PXMCMC_PALLAS_DTYPE",
        "bfloat16"
        if os.environ.get("PXMCMC_MATMUL_PRECISION") == "bfloat16"
        else "float32",
    )
    return jnp.dtype(name)


@dataclass(frozen=True)
class GramPallasPlan:
    """Static metadata + device tables for one (wavelet basis, gram) pair."""

    L: int
    cut: int  # largest small-scale bandlimit (m/l bound of the small grid)
    big_idx: tuple  # scale indices fused in-kernel
    small_idx: tuple  # scale indices handled XLA-side
    big_bl: tuple
    small_bl: tuple
    qk_big: tuple  # per big scale: (bl(m>=0), bl(l), bl(t)) = q * kappa_l
    qk_small: tuple
    gram: jax.Array  # (L(m>=0), L(l), L(k))


jax.tree_util.register_dataclass(
    GramPallasPlan,
    data_fields=["qk_big", "qk_small", "gram"],
    meta_fields=["L", "cut", "big_idx", "small_idx", "big_bl", "small_bl"],
)


def build_gram_pallas_plan(wb, gram: jax.Array) -> GramPallasPlan | None:
    """Split scales at the big/small cutoff and fold kappa into the theta
    tables.  Returns None when the basis has no fusable (>= cutoff) scale or
    no small scale (the plain XLA path handles those)."""
    bls = [int(b) for b in wb.bandlimits]
    cutoff = _big_min()
    big = [j for j, b in enumerate(bls) if b >= cutoff]
    small = [j for j, b in enumerate(bls) if b < cutoff]
    if not big or not small:
        return None
    adt = _act_dtype()

    def qk(j):
        bl = bls[j]
        q = wb.bases[j].q[bl - 1 :].astype(jnp.float32)  # (bl(m>=0), l, t)
        return (q * wb.kappa_l[j].astype(jnp.float32)[None, :, None]).astype(adt)

    return GramPallasPlan(
        L=wb.L,
        cut=max(bls[j] for j in small),
        big_idx=tuple(big),
        small_idx=tuple(small),
        big_bl=tuple(bls[j] for j in big),
        small_bl=tuple(bls[j] for j in small),
        qk_big=tuple(qk(j) for j in big),
        qk_small=tuple(qk(j).astype(jnp.float32) for j in small),
        gram=gram.astype(adt),
    )


def _phi_analysis_mct(wmap, basis, scale):
    """Real map (c, t, p) -> separate re/im half spectra, each (m, c, t).

    Same math as :func:`pxmcmc_tpu.ops.sht.phi_analysis_r2`.  The (m, c, t)
    layout is the GEMM's *natural* output order — (m, p) x (p, c*t) ->
    (m, c*t) — so XLA emits no transpose/copy between the DFT and the
    kernel (the round-5 trace showed 4.2 ms/gradient of reshape+copy with
    an (m, t, c) layout; c-major removed it).
    """
    re = sht._mm(basis.cos_pm, wmap, "pm,ctp->mct") * scale
    im = -sht._mm(basis.sin_pm, wmap, "pm,ctp->mct") * scale
    return re, im


def _phi_synth_mct(ftre, ftim, basis, bl):
    """Separate re/im theta spectra (m, c, t) -> real map (c, t, p) / (2bl-1).

    Same math as :func:`pxmcmc_tpu.ops.sht.phi_synth_r2` (incl. the m=0
    single-count factor) with the adjoint's 1/(2bl-1) scaling folded in.
    The m-contraction streams the (m, c*t) operand transposed through the
    MXU — no materialised transpose.
    """
    cfac = jnp.full((bl,), 2.0, jnp.float32).at[0].set(1.0)
    Tr = ftre * cfac[:, None, None]
    Ti = ftim * cfac[:, None, None]
    f = sht._mm(basis.cos_pm, Tr, "pm,mct->ctp") - sht._mm(
        basis.sin_pm, Ti, "pm,mct->ctp"
    )
    return f / (2 * bl - 1)


def _small_forward(blocks, wb, plan, C):
    """Small scales' summed half-spectrum grid, re/im each (cut, C, cut)."""
    Gre = Gim = None
    prev = 0
    for k, (j, bl) in enumerate(zip(plan.small_idx, plan.small_bl)):
        basis = wb.bases[j]
        wmap = blocks[j].reshape(C, bl, 2 * bl - 1)
        re, im = _phi_analysis_mct(wmap, basis, 1.0 / (2 * bl - 1))
        qk = plan.qk_small[k]
        gre = jnp.einsum("mlt,mct->mcl", qk, re)
        gim = jnp.einsum("mlt,mct->mcl", qk, im)
        if Gre is None:
            Gre, Gim = gre, gim
        else:
            if bl > prev:
                pad = [(0, bl - prev), (0, 0), (0, bl - prev)]
                Gre = jnp.pad(Gre, pad)
                Gim = jnp.pad(Gim, pad)
            Gre = Gre + gre
            Gim = Gim + gim
        prev = bl
    return Gre, Gim


def _small_adjoint(hsr, hsi, wb, plan, C, out, grid=False):
    """Per-small-scale adjoint theta GEMM + phi synthesis from H[:, :cut]."""
    for k, (j, bl) in enumerate(zip(plan.small_idx, plan.small_bl)):
        basis = wb.bases[j]
        qk = plan.qk_small[k]
        ftre = jnp.einsum("mlt,mcl->mct", qk, hsr[:bl, :, :bl])
        ftim = jnp.einsum("mlt,mcl->mct", qk, hsi[:bl, :, :bl])
        f = _phi_synth_mct(ftre, ftim, basis, bl)
        out[j] = f if grid else f.reshape(C, bl * (2 * bl - 1))


def _make_kernel(L, cut, bls):
    """Kernel body for a static (L, cut, big-bandlimit list) signature."""
    S = len(bls)
    f32 = jnp.float32

    def kernel(*refs):
        gram_ref, gsr_ref, gsi_ref = refs[0:3]
        qk_refs = refs[3 : 3 + S]
        fre_refs = refs[3 + S : 3 + 2 * S]
        fim_refs = refs[3 + 2 * S : 3 + 3 * S]
        hsr_ref, hsi_ref = refs[3 + 3 * S : 5 + 3 * S]
        ftre_refs = refs[5 + 3 * S : 5 + 4 * S]
        ftim_refs = refs[5 + 4 * S : 5 + 5 * S]
        Gre_ref, Gim_ref = refs[5 + 5 * S :]

        m = pl.program_id(0)
        ct = Gre_ref.shape[0]

        # G grid for this m, c-major (ct, l): small-scale contribution
        # (zero above the cut), then the big scales' theta GEMMs
        # accumulated ascending.
        Gre_ref[:] = jnp.zeros((ct, L), f32)
        Gim_ref[:] = jnp.zeros((ct, L), f32)

        @pl.when(m < cut)
        def _():
            Gre_ref[:, 0:cut] = gsr_ref[0]
            Gim_ref[:, 0:cut] = gsi_ref[0]

        # theta GEMMs: G[c, l] += sum_t F[c, t] qk[l, t]
        tt = (((1,), (1,)), ((), ()))
        for j, bl in enumerate(bls):

            @pl.when(m < bl)
            def _(j=j, bl=bl):
                q = qk_refs[j][0]  # (l, t)
                Gre_ref[:, 0:bl] += jax.lax.dot_general(
                    fre_refs[j][0], q, tt, preferred_element_type=f32
                )
                Gim_ref[:, 0:bl] += jax.lax.dot_general(
                    fim_refs[j][0], q, tt, preferred_element_type=f32
                )

        # Gram apply: H[c, l] = sum_k G[c, k] gram[l, k]
        g = gram_ref[0]  # (L(l), L(k))
        Hre = jax.lax.dot_general(
            Gre_ref[:].astype(g.dtype), g, tt, preferred_element_type=f32
        )  # (ct, L)
        Him = jax.lax.dot_general(
            Gim_ref[:].astype(g.dtype), g, tt, preferred_element_type=f32
        )
        hsr_ref[0] = Hre[:, 0:cut]
        hsi_ref[0] = Him[:, 0:cut]

        # Adjoint theta GEMMs: Ft[c, t] = sum_l H[c, l] qk[l, t].  Written
        # for every m — rows m >= bl_j hold don't-care values from the
        # clamped input blocks and are sliced away by the phi-synthesis
        # stage; writing unconditionally sidesteps revisited-output-block
        # staleness (the two full-L scales dominate the flops, so the waste
        # is ~12%).
        for j, bl in enumerate(bls):
            q = qk_refs[j][0]
            odt = ftre_refs[j].dtype
            ftre_refs[j][0] = jnp.dot(
                Hre[:, 0:bl].astype(q.dtype), q, preferred_element_type=f32
            ).astype(odt)
            ftim_refs[j][0] = jnp.dot(
                Him[:, 0:bl].astype(q.dtype), q, preferred_element_type=f32
            ).astype(odt)

    return kernel


def _ctile(C: int) -> int:
    ct = int(os.environ.get("PXMCMC_PALLAS_CTILE", "256"))
    return ct if C % ct == 0 else C


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pipeline(blocks, wb, plan, interpret):
    L, cut = plan.L, plan.cut
    bls = plan.big_bl
    S = len(bls)
    f32 = jnp.float32
    adt = plan.qk_big[0].dtype  # activation/table storage dtype (see _act_dtype)

    all_bls = [int(b) for b in wb.bandlimits]
    grid_blocks = blocks[0].ndim >= 2 and blocks[0].shape[-2:] == (
        all_bls[0], 2 * all_bls[0] - 1
    )
    ncoef = 2 if grid_blocks else 1  # trailing coefficient axes per block
    batch = blocks[0].shape[:-ncoef]
    C = int(np.prod(batch)) if batch else 1
    # grid blocks are already (theta, phi) maps — merging the batch into one
    # leading axis is layout-free either way
    blocks = tuple(
        b.reshape((C,) + b.shape[b.ndim - ncoef :]).astype(f32) for b in blocks
    )
    CT = _ctile(C)
    Cp = ((C + CT - 1) // CT) * CT
    if Cp != C:
        blocks = tuple(
            jnp.pad(b, [(0, Cp - C)] + [(0, 0)] * ncoef) for b in blocks
        )

    # phi-DFT analysis for the fused scales, (m, Cp, t) re/im planes
    fre, fim = [], []
    for j, bl in zip(plan.big_idx, bls):
        wmap = blocks[j].reshape(Cp, bl, 2 * bl - 1)
        re, im = _phi_analysis_mct(wmap, wb.bases[j], 1.0 / (2 * bl - 1))
        fre.append(re.astype(adt))
        fim.append(im.astype(adt))
    gsr, gsi = _small_forward(blocks, wb, plan, Cp)
    gsr, gsi = gsr.astype(f32), gsi.astype(f32)

    grid = (L, Cp // CT)

    def clamp(bl):
        return lambda m, ci: (jnp.minimum(m, bl - 1), 0, 0)

    def clamp_c(bl):
        return lambda m, ci: (jnp.minimum(m, bl - 1), ci, 0)

    in_specs = (
        [pl.BlockSpec((1, L, L), lambda m, ci: (m, 0, 0))]
        + [pl.BlockSpec((1, CT, cut), clamp_c(cut))] * 2
        + [pl.BlockSpec((1, bl, bl), clamp(bl)) for bl in bls]
        + [pl.BlockSpec((1, CT, bl), clamp_c(bl)) for bl in bls] * 2
    )
    out_specs = (
        [pl.BlockSpec((1, CT, cut), lambda m, ci: (m, ci, 0))]
        * 2
        + [pl.BlockSpec((1, CT, bl), lambda m, ci: (m, ci, 0)) for bl in bls] * 2
    )
    out_shape = (
        [jax.ShapeDtypeStruct((L, Cp, cut), f32)] * 2
        + [jax.ShapeDtypeStruct((L, Cp, bl), adt) for bl in bls] * 2
    )
    outs = pl.pallas_call(
        _make_kernel(L, cut, bls),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((CT, L), f32)] * 2,
        interpret=interpret,
    )(plan.gram, gsr, gsi, *plan.qk_big, *fre, *fim)
    hsr, hsi = outs[0], outs[1]
    ftre = outs[2 : 2 + S]
    ftim = outs[2 + S : 2 + 2 * S]

    out = [None] * len(wb.bandlimits)
    for k, (j, bl) in enumerate(zip(plan.big_idx, bls)):
        f = _phi_synth_mct(ftre[k][:bl], ftim[k][:bl], wb.bases[j], bl)
        # grid blocks consume the (c, t, p) synth output as is — zero
        # reshapes anywhere on the fused scales' path
        out[j] = f if grid_blocks else f.reshape(Cp, bl * (2 * bl - 1))
    _small_adjoint(hsr, hsi, wb, plan, Cp, out, grid_blocks)
    return tuple(o[:C].reshape(batch + o.shape[1:]) for o in out)


def gram_gradient_real_blocks_pallas(blocks, wb, plan: GramPallasPlan):
    """Drop-in for :func:`..wavelets.gram_gradient_real_blocks` backed by the
    fused kernel.  ``blocks``: per-scale (..., ncoef_j) segments."""
    interpret = jax.default_backend() not in ("tpu", "axon")
    return _pipeline(blocks, wb, plan, interpret)

r"""Stacked-real Gram gradient for directional (dirs > 1) wavelet chains.

The round-4 directional bench rows were the slowest in the suite (265x vs
the flagship's 1,450x): ``synthesis_dir`` / ``synthesis_dir_adjoint`` run
complex-dtype per-order spin SHTs through the gather-ful generic path
(:func:`pxmcmc_tpu.ops.sht.forward`'s ``_to_ml``/``_from_ml`` index
gathers are scalar-unit work on TPU) plus complex ``Egamma`` einsums and a
full pixel round trip at the main bandlimit every gradient.

This module applies the same treatment that made the axisymmetric chain
fast (BENCH.md rounds 2-3) to the directional normal operator
``S^T S`` (S = directional synthesis, ref
``/root/reference/pxmcmc/transforms.py:84-98`` / ``forward.py:66-72``):

* re/im carried as a stacked real axis end to end — every op is a real
  matmul / pad / slice (no complex dtype, no gathers);
* the per-order chains run in the full-m (2bl-1, l) *grid* layout
  (contiguous centered slices instead of flat-lm gathers);
* the main-bandlimit pixel round trip ``inverse_adjoint(inverse(.))``
  collapses into the per-m Gram tables (``sht.get_gram``), mirrored to
  the full m range via Gram_{-m} = Gram_m (Lambda_{-m} = (-1)^m Lambda_m
  for spin 0);
* the gamma-direction DFT and its adjoint are tiny real matmuls built
  from Re/Im(Egamma).

Exactly the operator ``synthesis_dir_adjoint(synthesis_dir(X))`` for real
X (tested against the complex chain); sums associate differently.

Conjugate-pair fold: for real W the order pairs satisfy (verified exactly)
``g_{-n}[l,-m] = (-1)^m conj(g_n[l,m])`` and the n=0 contribution is
conjugate-symmetric, so only the n >= 0 order chains run; the negative
orders enter through one cheap mirror (flip + sign) of the accumulated
positive-order grid, and the adjoint consumes ``H + M(H)`` for n > 0 (M is
self-adjoint).  Cuts the per-order SHT work by (N-1)/(2N-1)... i.e. from
N parity-selected orders to (N+1)//2.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import real_dtype
from . import sht

__all__ = ["DirGramTables", "build_dir_gram_tables", "dir_gram_gradient", "dir_gram_gradient_blocks"]


@dataclass(frozen=True)
class DirGramTables:
    """Device tables for one (directional basis, main Gram) pair."""

    L: int
    G: int  # 2*dirs - 1 gamma samples
    bandlimits: tuple
    eta_l: jax.Array  # (bl0,) scaling-function window
    psi_l: tuple  # per wavelet scale: (N_orders, bl) directional windows
    einv_re: jax.Array  # (N_orders, G) gamma-DFT (analysis direction)
    einv_im: jax.Array
    gram_full: jax.Array  # (2L-1, L, L) mirrored per-m main Gram


jax.tree_util.register_dataclass(
    DirGramTables,
    data_fields=["eta_l", "psi_l", "einv_re", "einv_im", "gram_full"],
    meta_fields=["L", "G", "bandlimits"],
)


def build_dir_gram_tables(dwb, gram: jax.Array) -> DirGramTables:
    """``gram``: the (L(m>=0), L, L) spin-0 main Gram (``sht.get_gram``)."""
    dt = real_dtype()
    bls = [int(b) for b in dwb.bandlimits]
    # window values depend on l only; flat index l^2 is (l, m=-l)
    eta_l = dwb.eta_flm[jnp.asarray([l * l for l in range(bls[0])])]
    psi_l = tuple(
        p[:, jnp.asarray([l * l for l in range(bl)])]
        for p, bl in zip(dwb.psi, bls[1:])
    )
    G = 2 * dwb.dirs - 1
    einv = np.conj(np.asarray(jax.device_get(dwb.Egamma.real))
                   + 1j * np.asarray(jax.device_get(dwb.Egamma.imag))).T / G
    # mirror to the full signed-m range: Gram_{-m} = Gram_m (spin 0)
    gram_full = jnp.concatenate([jnp.flip(gram[1:], axis=0), gram], axis=0)
    return DirGramTables(
        L=dwb.L,
        G=G,
        bandlimits=tuple(bls),
        eta_l=eta_l.astype(dt),
        psi_l=tuple(p.astype(dt) for p in psi_l),
        einv_re=jnp.asarray(einv.real, dtype=dt),
        einv_im=jnp.asarray(einv.imag, dtype=dt),
        gram_full=gram_full.astype(dt),
    )


def _split_dir_np(X, bls, G):
    """Flat (..., ncoefs) -> per-scale segments (same layout as
    ``wavelets._split_dir``: [scaling | scale j gamma-major | ...])."""
    from . import sampling

    blocks = []
    n0 = sampling.sample_length(bls[0])
    blocks.append(X[..., :n0])
    start = n0
    for bl in bls[1:]:
        n = G * sampling.sample_length(bl)
        blocks.append(X[..., start : start + n])
        start += n
    return blocks


def _fwd_grid2(w2, basis, bl):
    """Stacked complex map (..., 2, t, p) -> full-m flm grid (..., 2, 2bl-1, l)
    via the forward spin SHT's q tables (grid form of ``sht.forward``)."""
    T2 = sht.phi_analysis_full2(w2, basis, 1.0 / (2 * bl - 1))
    return sht._mm(basis.q, T2, "mlt,...mt->...ml")


def _adj_grid2(H2, basis, bl):
    """Transpose of :func:`_fwd_grid2`: (..., 2, 2bl-1, l) -> (..., 2, t, p)."""
    Ft2 = sht._mm(basis.q, H2, "mlt,...ml->...mt")
    return sht.phi_synth_full2(Ft2, basis) / (2 * bl - 1)


def _sign_m(L, dtype):
    """((2L-1), 1) column of (-1)^m, m = -(L-1)..L-1."""
    m = np.abs(np.arange(-(L - 1), L))
    return jnp.asarray(((-1.0) ** m)[:, None], dtype=dtype)


def _mirror2(A2, sign_m):
    """Conjugate mirror on a stacked full-m grid: (Mg)[m] = (-1)^m conj(g[-m]).

    ``A2``: (..., 2, 2bl-1, l); ``sign_m``: ((2bl-1), 1) of (-1)^m."""
    re = jnp.flip(A2[..., 0, :, :], axis=-2) * sign_m
    im = -jnp.flip(A2[..., 1, :, :], axis=-2) * sign_m
    return jnp.stack([re, im], axis=-3)


def _core(smap, Ws, dwb, t):
    """The S^T S chain on shaped maps: ``smap`` (..., t0, p0) scaling map,
    ``Ws`` per wavelet scale (..., G, t, p).  Returns the same structure."""
    L = t.L
    bls = t.bandlimits
    bl0 = bls[0]
    ns = dwb.ns
    w2 = jnp.stack([smap, jnp.zeros_like(smap)], axis=-3)  # real scal field
    A0 = _fwd_grid2(w2, dwb.scal_basis, bl0) * t.eta_l  # conj-symmetric part
    Apos = jnp.zeros_like(A0)  # n > 0 orders (negatives via mirror)
    prev = bl0
    for j, bl in enumerate(bls[1:]):
        W = Ws[j]
        G0 = Gp = None
        for i, basis in enumerate(dwb.dir_bases[j]):
            if ns[i] < 0:
                continue  # negative orders enter via the conjugate mirror
            # gamma-direction DFT: order-i complex field from real W, as
            # real contractions over the (tiny) gamma axis
            w2 = jnp.stack(
                [
                    jnp.einsum("g,...gtp->...tp", t.einv_re[i], W),
                    jnp.einsum("g,...gtp->...tp", t.einv_im[i], W),
                ],
                axis=-3,
            )  # (..., 2, t, p)
            g = _fwd_grid2(w2, basis, bl) * t.psi_l[j][i]
            if ns[i] == 0:
                G0 = g if G0 is None else G0 + g
            else:
                Gp = g if Gp is None else Gp + g
        pads = [(bl - prev, bl - prev), (0, bl - prev)] if bl > prev else None
        if pads is not None:
            A0 = jnp.pad(A0, [(0, 0)] * (A0.ndim - 2) + pads)
            Apos = jnp.pad(Apos, [(0, 0)] * (Apos.ndim - 2) + pads)
        if G0 is not None:
            A0 = A0 + G0
        if Gp is not None:
            Apos = Apos + Gp
        prev = bl
    if prev < L:
        pads = [(L - prev, L - prev), (0, L - prev)]
        A0 = jnp.pad(A0, [(0, 0)] * (A0.ndim - 2) + pads)
        Apos = jnp.pad(Apos, [(0, 0)] * (Apos.ndim - 2) + pads)
    sign_L = _sign_m(L, A0.dtype)
    F2 = A0 + Apos + _mirror2(Apos, sign_L)

    # ---- main-bandlimit Gram apply (replaces the pixel round trip) ----
    H2 = sht._mm(t.gram_full, F2, "mlk,...mk->...ml")
    # n > 0 orders consume H + M(H) (M self-adjoint; see module docstring)
    Hm = H2 + _mirror2(H2, sign_L)

    # ---- adjoint: per-scale centered slices back to shaped maps ----
    Hs = H2[..., L - bl0 : L + bl0 - 1, :bl0] * t.eta_l
    s2 = _adj_grid2(Hs, dwb.scal_basis, bl0)
    out = [s2[..., 0, :, :]]
    for j, bl in enumerate(bls[1:]):
        Hj = H2[..., L - bl : L + bl - 1, :bl]
        Hjm = Hm[..., L - bl : L + bl - 1, :bl]
        W = None
        for i, basis in enumerate(dwb.dir_bases[j]):
            if ns[i] < 0:
                continue
            src = Hj if ns[i] == 0 else Hjm
            w = _adj_grid2(src * t.psi_l[j][i], basis, bl)  # (..., 2, t, p)
            # adjoint of the gamma DFT (real-linear transpose)
            Wi = (
                t.einv_re[i][:, None, None] * w[..., 0, :, :][..., None, :, :]
                + t.einv_im[i][:, None, None] * w[..., 1, :, :][..., None, :, :]
            )  # (..., G, t, p)
            W = Wi if W is None else W + Wi
        out.append(W)
    return out


@jax.jit
def dir_gram_gradient(X: jax.Array, dwb, t: DirGramTables) -> jax.Array:
    """``S^T S X`` for real directional coefficients X (..., ncoefs).

    Scale the result by the scalar inverse noise variance and subtract the
    precomputed ``S^T invcov y`` to get the fidelity gradient (the same
    contract as the axisymmetric ``gram_gradient_real``).
    """
    dt = real_dtype()
    bls = t.bandlimits
    bl0 = bls[0]
    blocks = _split_dir_np(X.astype(dt), bls, t.G)
    smap = blocks[0].reshape(blocks[0].shape[:-1] + (bl0, 2 * bl0 - 1))
    Ws = [
        b.reshape(b.shape[:-1] + (t.G, bl, 2 * bl - 1))
        for b, bl in zip(blocks[1:], bls[1:])
    ]
    out = _core(smap, Ws, dwb, t)
    flat = [out[0].reshape(out[0].shape[:-2] + (-1,))]
    flat += [o.reshape(o.shape[:-3] + (-1,)) for o in out[1:]]
    return jnp.concatenate(flat, axis=-1)


def dir_gram_gradient_blocks(blocks, dwb, t: DirGramTables):
    """Per-scale-block form (the directional pyramid/grid state layout):
    ``blocks`` = [scal (..., t0, p0) | per scale (..., G, t, p)], or their
    flat (..., seg) equivalents — output matches the input layout."""
    dt = real_dtype()
    bls = t.bandlimits
    bl0 = bls[0]
    grid = blocks[0].ndim >= 2 and blocks[0].shape[-2:] == (bl0, 2 * bl0 - 1)
    if grid:
        smap, Ws = blocks[0].astype(dt), [b.astype(dt) for b in blocks[1:]]
    else:
        smap = blocks[0].reshape(
            blocks[0].shape[:-1] + (bl0, 2 * bl0 - 1)
        ).astype(dt)
        Ws = [
            b.reshape(b.shape[:-1] + (t.G, bl, 2 * bl - 1)).astype(dt)
            for b, bl in zip(blocks[1:], bls[1:])
        ]
    out = _core(smap, Ws, dwb, t)
    if grid:
        return tuple(out)
    flat = [out[0].reshape(out[0].shape[:-2] + (-1,))]
    flat += [o.reshape(o.shape[:-3] + (-1,)) for o in out[1:]]
    return tuple(flat)

r"""Axisymmetric scale-discretised wavelets on the sphere (S2LET equivalent).

TPU-native replacement for the C library S2LET, which the reference reaches
through ``pys2let.analysis_px2wav / synthesis_wav2px`` and their adjoints
(`/root/reference/pxmcmc/transforms.py:89-98`) and ``pys2let.wavelet_tiling``
(`/root/reference/pxmcmc/prior.py:121,132`, ``utils.py:117``).

Construction (Leistedt et al. 2013, scale-discretised wavelets):

    s(t)    = exp(-1/(1-t^2))                      on (-1, 1), else 0
    s_B(t)  = s( 2B/(B-1) (t - 1/B) - 1 )          smooth bump on (1/B, 1)
    k_B(t)  = int_t^1 s_B(u)^2/u du  /  int_{1/B}^1 s_B(u)^2/u du
    kappa_B(t)   = sqrt( k_B(t/B) - k_B(t) )       wavelet generator
    kappa^j_l    = kappa_B(l / B^j),   j = J_min..J_max,  J_max = ceil(log_B(L-1))
    eta_l        = sqrt( k_B(l / B^{J_min}) )      scaling function

which telescopes into the exact admissibility identity
``eta_l^2 + sum_j (kappa^j_l)^2 = 1`` for every l < L — so analysis followed
by synthesis is *exactly* the identity, independent of how accurately the
k_B integral is evaluated.

With harmonic tiling in hand, multiresolution (``upsample=0``) analysis is a
chain of diagonal harmonic multiplies between SHTs: wavelet scale j lives at
its own bandlimit ``bl_j`` (the largest l where kappa^j_l != 0, mirroring
``/root/reference/pxmcmc/utils.py:116-125``), so its pixel map has only
``bl_j (2 bl_j - 1)`` samples.  Coefficient vectors are flat
``[scaling | wavelet j=J_min | ... | wavelet J_max]`` — the layout produced
by the reference's ``flatten_mlm`` (`/root/reference/pxmcmc/utils.py:11-22`).

Everything below the tiling precompute is JAX (jit/vmap-able, batch dims
lead); the hot path is the batched-matmul SHT of :mod:`pxmcmc_tpu.ops.sht`.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..config import real_dtype
from . import sampling, sht

__all__ = [
    "j_max",
    "tiling",
    "wavelet_tiling",
    "multires_bandlimits",
    "WaveletBasis",
    "get_wavelet_basis",
    "analysis",
    "synthesis",
    "analysis_adjoint",
    "synthesis_adjoint",
]


def j_max(B: float, L: int, J_min: int = 0) -> int:
    """Largest wavelet scale: ceil(log_B(L-1)).  pys2let.pys2let_j_max parity
    (`/root/reference/pxmcmc/transforms.py:75`); J_min is accepted for
    signature compatibility but does not enter the formula."""
    return int(np.ceil(np.log(L - 1) / np.log(B)))


def _k_interp(B: float, npts: int = 1 << 14):
    """Cumulative integral giving k_B(t) by interpolation on [1/B, 1]."""
    u = np.linspace(1.0 / B, 1.0, npts)
    arg = 2.0 * B / (B - 1.0) * (u - 1.0 / B) - 1.0
    with np.errstate(divide="ignore", over="ignore"):
        s = np.where(np.abs(arg) < 1.0, np.exp(-1.0 / np.maximum(1.0 - arg ** 2, 1e-300)), 0.0)
    integrand = s ** 2 / u
    # cumulative from the right: c[i] = int_{u_i}^1 integrand du
    du = u[1] - u[0]
    seg = 0.5 * (integrand[1:] + integrand[:-1]) * du
    c = np.concatenate([np.cumsum(seg[::-1])[::-1], [0.0]])
    total = c[0]

    def k(t):
        t = np.asarray(t, dtype=float)
        val = np.interp(t, u, c / total, left=1.0, right=0.0)
        return np.where(t <= 1.0 / B, 1.0, np.where(t >= 1.0, 0.0, val))

    return k


def tiling(B: float, L: int, J_min: int) -> tuple[np.ndarray, np.ndarray]:
    """Raw harmonic tiling: (eta_l of shape (L,), kappa^j_l of shape (J, L)).

    These are the *convolution* kernels used by the transforms; the
    pys2let-convention harmonic coefficients carry an extra
    sqrt((2l+1)/4pi) (see :func:`wavelet_tiling`).
    """
    J = j_max(B, L)
    k = _k_interp(B)
    ls = np.arange(L, dtype=float)
    eta = np.sqrt(np.maximum(k(ls / B ** J_min), 0.0))
    kappas = np.zeros((J - J_min + 1, L))
    for i, j in enumerate(range(J_min, J + 1)):
        kappas[i] = np.sqrt(np.maximum(k(ls / B ** (j + 1)) - k(ls / B ** j), 0.0))
    return eta, kappas


def tiling_direction(L: int, N: int) -> np.ndarray:
    """Directionality harmonic coefficients s[l, n + N - 1], n = -(N-1)..N-1.

    Harmonic split of the directional wavelet (McEwen et al. 2015, the
    construction S2LET's ``s2let_tiling_direction`` realises): for each l,
    ``s_ln`` is supported on ``|n| <= gamma_l``, ``n == gamma_l (mod 2)``
    with ``gamma_l`` the largest integer ``<= min(l, N-1)`` of parity
    opposite to N, and

        s_ln = sqrt( binom(gamma_l, (gamma_l - n)/2) / 2^gamma_l ),

    so that ``sum_n s_ln^2 = 1`` exactly (binomial theorem) — the identity
    that makes directional analysis+synthesis exactly invertible for any N.
    Negative orders carry ``s_{l,-n} = (-1)^n s_{l,n}``, which makes the
    gamma-sampled wavelet coefficients of a real signal real (derived from
    ``d^l_{-m,-n} = (-1)^{m-n} d^l_{mn}``; tested).  N=1 reduces to
    ``s_l0 = 1`` (axisymmetric).
    """
    from scipy.special import comb

    s = np.zeros((L, 2 * N - 1))
    for el in range(L):
        gamma = min(el, N - 1)
        if (N + gamma) % 2 == 0:  # need (N + n) odd, n == gamma (mod 2)
            gamma -= 1
        if gamma < 0:
            continue  # no directional support (even N at l = 0)
        for n in range(-gamma, gamma + 1, 2):
            val = np.sqrt(comb(gamma, (gamma - n) // 2) / 2.0 ** gamma)
            s[el, n + N - 1] = val if n >= 0 else (-1.0) ** n * val
    return s


def wavelet_tiling(B: float, L: int, dirs: int = 1, J_min: int = 0, spin: int = 0):
    """pys2let.wavelet_tiling-compatible output: (phi_l, psi_lm).

    phi_l: (L,) scaling-function harmonic coefficients
    sqrt((2l+1)/4pi) eta_l; psi_lm: (L^2, J) wavelet coefficients — for
    dirs=1 only the axisymmetric m=0 entries are populated; for dirs>1 the
    |m| < dirs entries carry the directionality split
    (:func:`tiling_direction`).  Used by the power-weighted prior
    (`/root/reference/pxmcmc/prior.py:121,132`) and multires bandlimits
    (``utils.py:116-125``).
    """
    eta, kappas = tiling(B, L, J_min)
    norm = np.sqrt((2 * np.arange(L) + 1) / (4.0 * np.pi))
    phi_l = norm * eta
    J = kappas.shape[0]
    psi_lm = np.zeros((L * L, J), dtype=complex)
    s = tiling_direction(L, dirs)
    for j in range(J):
        for el in range(L):
            for n in range(-min(el, dirs - 1), min(el, dirs - 1) + 1):
                v = norm[el] * kappas[j, el] * s[el, n + dirs - 1]
                if v != 0.0:
                    psi_lm[el * el + el + n, j] = v
    return phi_l, psi_lm


def multires_bandlimits(L: int, B: float, J_min: int, dirs: int = 1, spin: int = 0) -> np.ndarray:
    """Per-scale effective bandlimits [scaling, j=J_min, ..., J_max].

    Max nonzero l of each tiling function + 1, capped at L — the empirical
    rule of ``/root/reference/pxmcmc/utils.py:116-125``.
    """
    eta, kappas = tiling(B, L, J_min)
    gammas = np.vstack([eta, kappas])
    bls = np.zeros(gammas.shape[0], dtype=int)
    for i, g in enumerate(gammas):
        nz = np.nonzero(g > 0)[0]
        bls[i] = int(nz.max()) + 1 if nz.size else 1
    return bls


# ---------------------------------------------------------------------------
# Multiresolution transform basis
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class WaveletBasis:
    """Device-resident wavelet transform for one (L, B, J_min, spin)."""

    L: int
    B: float
    J_min: int
    J_max: int
    spin: int
    bandlimits: tuple  # (nscales+1,) ints: [scaling, j=J_min..J_max]
    kappa_flm: tuple  # per scale: (bl^2,) real — kappa_l broadcast over m
    kappa_l: tuple  # per scale: (bl,) real — kappa as a function of l only
    bases: tuple  # per scale: SHTBasis at that scale's bandlimit
    main: sht.SHTBasis  # SHTBasis at L

    @property
    def nscales(self) -> int:
        return self.J_max - self.J_min + 1

    @property
    def nscal(self) -> int:
        return sampling.sample_length(self.bandlimits[0])

    @property
    def nwav(self) -> int:
        return sum(sampling.sample_length(b) for b in self.bandlimits[1:])

    @property
    def ncoefs(self) -> int:
        return self.nscal + self.nwav

    @property
    def npix(self) -> int:
        return sampling.sample_length(self.L)


jax.tree_util.register_dataclass(
    WaveletBasis,
    data_fields=["kappa_flm", "kappa_l", "bases", "main"],
    meta_fields=["L", "B", "J_min", "J_max", "spin", "bandlimits"],
)

_WB_CACHE: dict = {}


def get_wavelet_basis(
    L: int, B: float, J_min: int, spin: int = 0, dtype=None, use_disk_cache: bool = True
) -> WaveletBasis:
    dtype = dtype or real_dtype()
    key = (L, float(B), J_min, spin, jnp.dtype(dtype).name)
    if key in _WB_CACHE:
        return _WB_CACHE[key]
    eta, kappas = tiling(B, L, J_min)
    gammas = np.vstack([eta, kappas])
    bls = tuple(int(b) for b in multires_bandlimits(L, B, J_min, spin=spin))
    kappa_flm = []
    kappa_l = []
    bases = []
    for g, bl in zip(gammas, bls):
        ls = np.floor(np.sqrt(np.arange(bl * bl))).astype(int)
        kappa_flm.append(jnp.asarray(g[ls], dtype=dtype))
        kappa_l.append(jnp.asarray(g[:bl], dtype=dtype))
        bases.append(sht.get_basis(bl, spin, dtype=dtype, use_disk_cache=use_disk_cache))
    wb = WaveletBasis(
        L=L,
        B=float(B),
        J_min=J_min,
        J_max=j_max(B, L),
        spin=spin,
        bandlimits=bls,
        kappa_flm=tuple(kappa_flm),
        kappa_l=tuple(kappa_l),
        bases=tuple(bases),
        main=sht.get_basis(L, spin, dtype=dtype, use_disk_cache=use_disk_cache),
    )
    _WB_CACHE[key] = wb
    return wb


def _split_scales(X: jax.Array, wb: WaveletBasis):
    """Split a flat coefficient vector into per-scale pixel blocks."""
    blocks = []
    start = 0
    for bl in wb.bandlimits:
        n = sampling.sample_length(bl)
        blocks.append(X[..., start : start + n])
        start += n
    return blocks


def _use_real_path(x: jax.Array, wb: WaveletBasis) -> bool:
    """Real (spin-0) inputs take the conjugate-symmetry fast path: half the
    matmul work, rfft instead of fft, real outputs.  Values are identical to
    the complex path (see sht.py real-path docstrings)."""
    return wb.spin == 0 and not jnp.issubdtype(x.dtype, jnp.complexfloating)


def _sht_fns(real: bool):
    if real:
        return (
            sht.forward_real,
            sht.inverse_real,
            sht.forward_adjoint_real,
            sht.inverse_adjoint_real,
        )
    return sht.forward, sht.inverse, sht.forward_adjoint, sht.inverse_adjoint


@jax.jit
def analysis(f: jax.Array, wb: WaveletBasis) -> jax.Array:
    """Pixel map -> multiresolution wavelet coefficients.

    Equivalent of ``pys2let.analysis_px2wav`` + ``flatten_mlm``
    (`/root/reference/pxmcmc/transforms.py:102-112`): per scale,
    W^j_{lm} = f_{lm} kappa^j_l rendered at the scale's own bandlimit.

    :param f: (..., L(2L-1)) flat MW map; real input takes the real fast path
        and yields real coefficients (same values as the reference's complex
        output)
    :return: (..., ncoefs), [scaling | j=J_min | ...]
    """
    fwd, inv, _, _ = _sht_fns(_use_real_path(f, wb))
    L = wb.L
    fmap = f.reshape(f.shape[:-1] + (L, 2 * L - 1))
    flm = fwd(fmap, wb.main)
    out = []
    for kap, basis, bl in zip(wb.kappa_flm, wb.bases, wb.bandlimits):
        coefs_lm = flm[..., : bl * bl] * kap
        wmap = inv(coefs_lm, basis)
        out.append(wmap.reshape(wmap.shape[:-2] + (-1,)))
    return jnp.concatenate(out, axis=-1)


@jax.jit
def synthesis(X: jax.Array, wb: WaveletBasis) -> jax.Array:
    """Multiresolution wavelet coefficients -> pixel map.

    Equivalent of ``expand_mlm`` + ``pys2let.synthesis_wav2px``
    (`/root/reference/pxmcmc/transforms.py:114-127`).  Exact inverse of
    :func:`analysis` by the admissibility identity.
    """
    return synthesis_blocks(tuple(_split_scales(X, wb)), wb)


def _as_wmap(blk: jax.Array, bl: int) -> tuple:
    """View a per-scale block as its (theta, phi) map.

    Blocks arrive flat (..., bl*(2bl-1)) or already grid-shaped
    (..., bl, 2bl-1) (the sampler's zero-reshape pyramid layout — see
    ``PxMCMC._grid_blocks_ok``).  Returns (wmap, was_grid).
    """
    if blk.ndim >= 2 and blk.shape[-2:] == (bl, 2 * bl - 1):
        return blk, True
    return blk.reshape(blk.shape[:-1] + (bl, 2 * bl - 1)), False


def _from_wmap(wmap: jax.Array, grid: bool) -> jax.Array:
    """Inverse of :func:`_as_wmap`: flatten unless the caller runs grid
    blocks."""
    return wmap if grid else wmap.reshape(wmap.shape[:-2] + (-1,))


@jax.jit
def synthesis_blocks(blocks, wb: WaveletBasis) -> jax.Array:
    """Per-scale-block form of :func:`synthesis` (same math; input already
    split into per-scale segments, so no flat-vector slicing)."""
    fwd, inv, _, _ = _sht_fns(_use_real_path(blocks[0], wb))
    L = wb.L
    flm = None
    for blk, kap, basis, bl in zip(blocks, wb.kappa_flm, wb.bases, wb.bandlimits):
        wmap, _ = _as_wmap(blk, int(bl))
        wlm = fwd(wmap, basis) * kap
        pad = L * L - bl * bl
        wlm_full = jnp.pad(wlm, [(0, 0)] * (wlm.ndim - 1) + [(0, pad)])
        flm = wlm_full if flm is None else flm + wlm_full
    f = inv(flm, wb.main)
    return f.reshape(f.shape[:-2] + (-1,))


@jax.jit
def synthesis_adjoint(f: jax.Array, wb: WaveletBasis) -> jax.Array:
    """Adjoint of :func:`synthesis`: pixel map -> coefficient space.

    Equivalent of ``pys2let.synthesis_adjoint_px2wav``
    (`/root/reference/pxmcmc/transforms.py:129-139`) — the map the synthesis
    -setting gradient flows through (``forward.py:71-72``).
    """
    return jnp.concatenate(synthesis_adjoint_blocks(f, wb), axis=-1)


@jax.jit
def synthesis_adjoint_blocks(f: jax.Array, wb: WaveletBasis) -> tuple:
    """Per-scale-block form of :func:`synthesis_adjoint`: returns the
    coefficient pyramid as a tuple of per-scale flat segments (no
    concatenate — block consumers, e.g. the analysis-setting prox, use the
    tuple as is)."""
    _, _, fwd_adj, inv_adj = _sht_fns(_use_real_path(f, wb))
    L = wb.L
    fmap = f.reshape(f.shape[:-1] + (L, 2 * L - 1))
    glm = inv_adj(fmap, wb.main)
    out = []
    for kap, basis, bl in zip(wb.kappa_flm, wb.bases, wb.bandlimits):
        wlm = glm[..., : bl * bl] * kap
        wmap = fwd_adj(wlm, basis)
        out.append(wmap.reshape(wmap.shape[:-2] + (-1,)))
    return tuple(out)


@jax.jit
def analysis_adjoint(X: jax.Array, wb: WaveletBasis) -> jax.Array:
    """Adjoint of :func:`analysis`: coefficient space -> pixel map.

    Equivalent of ``pys2let.analysis_adjoint_wav2px``
    (`/root/reference/pxmcmc/transforms.py:96`).
    """
    _, _, fwd_adj, inv_adj = _sht_fns(_use_real_path(X, wb))
    L = wb.L
    blocks = _split_scales(X, wb)
    flm = None
    for blk, kap, basis, bl in zip(blocks, wb.kappa_flm, wb.bases, wb.bandlimits):
        wmap = blk.reshape(blk.shape[:-1] + (bl, 2 * bl - 1))
        wlm = inv_adj(wmap, basis) * kap
        pad = L * L - bl * bl
        wlm_full = jnp.pad(wlm, [(0, 0)] * (wlm.ndim - 1) + [(0, pad)])
        flm = wlm_full if flm is None else flm + wlm_full
    f = fwd_adj(flm, wb.main)
    return f.reshape(f.shape[:-2] + (-1,))


# ---------------------------------------------------------------------------
# Normal-operator (Gram) gradient fast path — real chains, synthesis setting,
# square identity measurement, scalar noise.  The pixel-space round trip of
# the data-fidelity gradient collapses into per-m Gram matmuls
# (see sht.get_gram): grad = c * A^T(Gram(A(X))) - b with A the scale-side
# harmonic assembly, skipping both phi transforms and the pixel map at L.
# ---------------------------------------------------------------------------

def synthesis_lm_real(X: jax.Array, wb: WaveletBasis) -> jax.Array:
    """Coefficient pyramid -> summed harmonic coefficients (no final inverse).

    The harmonic half of :func:`synthesis`: per-scale forward SHT, kappa
    multiply, zero-padded sum.  Real input only.
    """
    L = wb.L
    blocks = _split_scales(X, wb)
    flm = None
    for blk, kap, basis, bl in zip(blocks, wb.kappa_flm, wb.bases, wb.bandlimits):
        wmap = blk.reshape(blk.shape[:-1] + (bl, 2 * bl - 1))
        wlm = sht.forward_real(wmap, basis) * kap
        pad = L * L - bl * bl
        wlm_full = jnp.pad(wlm, [(0, 0)] * (wlm.ndim - 1) + [(0, pad)])
        flm = wlm_full if flm is None else flm + wlm_full
    return flm


def adjoint_scales_real(glm: jax.Array, wb: WaveletBasis) -> jax.Array:
    """Harmonic coefficients -> coefficient pyramid (adjoint scale side).

    The scale half of :func:`synthesis_adjoint`: per-scale kappa multiply and
    adjoint forward SHT.  Real (conjugate-symmetric) input only.
    """
    out = []
    for kap, basis, bl in zip(wb.kappa_flm, wb.bases, wb.bandlimits):
        wlm = glm[..., : bl * bl] * kap
        wmap = sht.forward_adjoint_real(wlm, basis)
        out.append(wmap.reshape(wmap.shape[:-2] + (-1,)))
    return jnp.concatenate(out, axis=-1)


def gram_gradient_real(X: jax.Array, wb: WaveletBasis, gram: jax.Array) -> jax.Array:
    """S^T S X in coefficient space via the Gram tables (S = synthesis).

    Exactly equals ``synthesis_adjoint(synthesis(X))`` for real X; scale the
    result by the (scalar) inverse noise variance and subtract the
    precomputed ``S^T invcov y`` to get the fidelity gradient.

    The whole chain stays in the (m >= 0, l) half-spectrum *grid* layout:
    the flat-lm representation of :func:`synthesis_lm_real` /
    ``sht.gram_apply_real`` round-trips through ``_from_ml_pos`` /
    ``_to_ml_pos`` index gathers at every stage, and gathers are scalar-unit
    work on TPU.  Grid form replaces them with contiguous pads/slices: the
    per-scale truncation ``flm[..., :bl^2]`` equals the grid slice
    ``[..., :bl, :bl]`` (flat index l^2+l+m covers exactly l < bl), and
    ``_from_ml_pos`` followed by ``_to_ml_pos`` is the identity on the
    grid — so this is the same linear operator (tested equal to the flat
    chain and to the pixel-space chain).

    Two further HBM-traffic savings (grid bench 14.8k it/s at L=256/256
    chains before these): real/imag parts are carried as a stacked-real
    leading axis end to end (no complex materialisation between stages),
    and the cross-scale accumulation grows ascending bandlimits (pad the
    running sum up to the next scale) instead of padding every scale to
    (L, L) — sum(bl_j^2) traffic instead of nscales * L^2.
    """
    Ggrid = synthesis_grid2(X, wb)
    H = sht._mm(gram, Ggrid, "mlk,...mk->...ml")  # (..., 2, m, l)
    return adjoint_scales_grid2(H, wb)


def gram_gradient_real_blocks(blocks, wb: WaveletBasis, gram: jax.Array):
    """Per-scale-block form of :func:`gram_gradient_real`.

    ``blocks`` is a tuple of per-scale flat coefficient segments
    (``_split_scales`` layout); returns the gradient as the same tuple
    structure.  Used by the pyramid-state sampler layout: keeping the
    coefficient pyramid as separate per-scale arrays removes the
    concatenate (reshape + dynamic-update-slice copies, ~15% of the MYULA
    step in the round-3 profiler trace) and the misaligned flat-vector
    slices from the hot loop entirely.
    """
    grid = blocks[0].ndim >= 2 and blocks[0].shape[-1] == 2 * int(wb.bandlimits[0]) - 1
    Ggrid = synthesis_grid2_blocks(blocks, wb)
    H = sht._mm(gram, Ggrid, "mlk,...mk->...ml")
    return adjoint_scales_grid2_blocks(H, wb, grid=grid)


def build_gram_qg(wb: WaveletBasis, gram: jax.Array) -> tuple:
    """Precompose the Gram apply into each scale's adjoint theta table.

    The unfused chain computes ``H_{ml} = sum_k gram_{mlk} G_{mk}`` once
    (an m-batched GEMV over the full half-spectrum grid) and then, per
    scale, ``Ft_{mt} = sum_l q_{mlt} kappa_l H_{ml}``.  Associativity
    folds the two:

        Ft_{mt} = sum_k [ sum_l q_{mlt} kappa_l gram_{mlk} ] G_{mk}
                = sum_k QG_{mkt} G_{mk}

    with the per-scale ``QG`` built once at setup — the Gram GEMV and the
    full-grid ``H`` intermediate (~134 MB/step of HBM round-trip at
    L=256/256 chains) disappear from the hot loop; each scale's adjoint
    GEMM contracts over the full-L ``k`` axis instead of its own ``l``.

    :return: tuple of per-scale (m<bl, k<=L, t) tables
    """
    out = []
    for kap_l, basis, bl in zip(_kappa_grids(wb), wb.bases, wb.bandlimits):
        q = basis.q[bl - 1 :]  # (m<bl, l<bl, t)
        qk = q * kap_l[None, :, None]
        out.append(
            jnp.einsum(
                "mlt,mlk->mkt", qk, gram[:bl, :bl, :],
                preferred_element_type=q.dtype,
            )
        )
    return tuple(out)


def gram_gradient_real_blocks_fused(blocks, wb: WaveletBasis, qg: tuple):
    """:func:`gram_gradient_real_blocks` with the Gram apply precomposed
    into the adjoint theta tables (see :func:`build_gram_qg`).  Same
    linear operator; floating-point sums associate differently."""
    grid = blocks[0].ndim >= 2 and blocks[0].shape[-1] == 2 * int(wb.bandlimits[0]) - 1
    Ggrid = synthesis_grid2_blocks(blocks, wb)
    out = []
    for QG, basis, bl in zip(qg, wb.bases, wb.bandlimits):
        Ft = sht._mm(QG, Ggrid[..., :bl, :], "mkt,...mk->...mt")
        wmap = sht.phi_synth_r2(Ft, basis) / (2 * bl - 1)
        out.append(_from_wmap(wmap, grid))
    return tuple(out)


def synthesis_grid2(X: jax.Array, wb: WaveletBasis) -> jax.Array:
    """Coefficient pyramid (real) -> stacked-real half-spectrum grid.

    (..., ncoefs) -> (..., 2, L(m>=0), L(l)): the summed harmonic
    coefficients of :func:`synthesis` in the (m >= 0, l) grid layout with a
    re/im axis at -3 — the gather-free, complex-free representation the hot
    paths run in (ascending-bandlimit accumulation; see
    :func:`gram_gradient_real` docstring for why).  Values equal
    ``sht._to_ml_pos(synthesis_lm_real(X, wb))`` exactly.
    """
    return synthesis_grid2_blocks(_split_scales(X, wb), wb)


def synthesis_grid2_blocks(blocks, wb: WaveletBasis) -> jax.Array:
    """Per-scale-block form of :func:`synthesis_grid2` (same math, input
    already split into per-scale segments — no flat-vector slicing)."""
    Ggrid = None
    prev_bl = 0
    for blk, kap_g, basis, bl in zip(
        blocks, _kappa_grids(wb), wb.bases, wb.bandlimits
    ):
        wmap, _ = _as_wmap(blk, int(bl))
        Fm2 = sht.phi_analysis_r2(wmap, basis, 1.0 / (2 * bl - 1))  # (..., 2, m, t)
        G = sht._mm(basis.q[bl - 1 :], Fm2, "mlt,...mt->...ml") * kap_g
        if Ggrid is None:
            Ggrid = G
        else:
            if bl > prev_bl:
                pad = [(0, 0)] * (Ggrid.ndim - 2) + [(0, bl - prev_bl)] * 2
                Ggrid = jnp.pad(Ggrid, pad)
            Ggrid = Ggrid + G
        prev_bl = bl
    return Ggrid


def adjoint_scales_grid2(H: jax.Array, wb: WaveletBasis) -> jax.Array:
    """Stacked-real half-spectrum grid -> coefficient pyramid (real).

    (..., 2, L(m>=0), L(l)) -> (..., ncoefs).  The exact real-linear
    transpose of :func:`synthesis_grid2` (the scale half of
    ``synthesis_adjoint`` in grid form).
    """
    return jnp.concatenate(adjoint_scales_grid2_blocks(H, wb), axis=-1)


def adjoint_scales_grid2_blocks(H: jax.Array, wb: WaveletBasis, grid=False) -> tuple:
    """Per-scale-block form of :func:`adjoint_scales_grid2`: returns the
    coefficient pyramid as a tuple of per-scale segments (flat, or (theta,
    phi) grids with ``grid=True`` — no concatenate either way; the
    pyramid-state hot path consumes the tuple as is)."""
    out = []
    for kap_g, basis, bl in zip(_kappa_grids(wb), wb.bases, wb.bandlimits):
        Hj = H[..., :bl, :bl] * kap_g
        Ft = sht._mm(basis.q[bl - 1 :], Hj, "mlt,...ml->...mt")
        wmap = sht.phi_synth_r2(Ft, basis) / (2 * bl - 1)
        out.append(_from_wmap(wmap, grid))
    return tuple(out)


def _kappa_grids(wb: WaveletBasis):
    """Per-scale kappa as (bl(l),) vectors broadcastable over the (m, l)
    grid (precomputed at basis build — no in-trace gathers)."""
    return wb.kappa_l


# ---------------------------------------------------------------------------
# Directional wavelets (dirs = N > 1).  Reference surface: pys2let's
# N/dirs parameter threaded through `/root/reference/pxmcmc/transforms.py:84`
# and `forward.py:98-106`.  TPU-native design: the directional coefficients
# of scale j live on an SO(3) MW grid (2N-1 gamma samples x bl x 2bl-1); the
# gamma direction is a small exact DFT over the azimuthal orders n (|n| < N,
# (N+n) odd), and each order-n component is a spin-(-n) SHT — the existing
# batched-matmul machinery of :mod:`pxmcmc_tpu.ops.sht` with its exact
# per-m left inverses, so analysis/synthesis stay exactly inverse and all
# adjoint dot-tests carry over.  Real input -> real coefficients (see
# :func:`tiling_direction`).
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DirectionalWaveletBasis:
    """Device-resident directional wavelet transform (dirs = N >= 2)."""

    L: int
    B: float
    J_min: int
    J_max: int
    dirs: int
    spin: int
    bandlimits: tuple  # (nscales+1,): [scaling, j=J_min..J_max]
    ns: tuple  # allowed azimuthal orders n (length N)
    eta_flm: jax.Array  # (bl0^2,) scaling tiling over lm
    scal_basis: sht.SHTBasis
    psi: tuple  # per wavelet scale: (N, bl^2) real kappa_j(l) s_{ln} over lm
    dir_bases: tuple  # per wavelet scale: tuple over n of SHTBasis(bl, -n)
    Egamma: jax.Array  # (2N-1, N) complex: e^{i n gamma_g}
    main: sht.SHTBasis

    @property
    def nscal(self) -> int:
        return sampling.sample_length(self.bandlimits[0])

    @property
    def nwav(self) -> int:
        G = 2 * self.dirs - 1
        return sum(G * sampling.sample_length(b) for b in self.bandlimits[1:])

    @property
    def ncoefs(self) -> int:
        return self.nscal + self.nwav

    @property
    def npix(self) -> int:
        return sampling.sample_length(self.L)


jax.tree_util.register_dataclass(
    DirectionalWaveletBasis,
    data_fields=["eta_flm", "scal_basis", "psi", "dir_bases", "Egamma", "main"],
    meta_fields=["L", "B", "J_min", "J_max", "dirs", "spin", "bandlimits", "ns"],
)

_DWB_CACHE: dict = {}


def get_directional_basis(
    L: int, B: float, J_min: int, dirs: int, spin: int = 0, dtype=None,
    use_disk_cache: bool = True
) -> DirectionalWaveletBasis:
    """Directional basis; ``spin != 0`` analyses a spin-``spin`` signal
    (the reference threads ``spin`` through pys2let's directional variants at
    ``/root/reference/pxmcmc/transforms.py:84-98``).  The tiling functions are
    spin-independent; spin enters only through which SHT reads the input
    signal (``main``/``scal_basis`` at spin s), so the admissibility identity
    — and hence exact invertibility — is unchanged."""
    assert dirs >= 2, "use get_wavelet_basis for the axisymmetric case"
    dtype = dtype or real_dtype()
    key = (L, float(B), J_min, dirs, spin, jnp.dtype(dtype).name)
    if key in _DWB_CACHE:
        return _DWB_CACHE[key]
    N = dirs
    eta, kappas = tiling(B, L, J_min)
    bls = tuple(int(b) for b in multires_bandlimits(L, B, J_min))
    if spin != 0:
        # every scale's SHT needs bl > |spin| (coefficients with l < |spin|
        # vanish for a spin-s signal)
        bls = tuple(max(b, abs(spin) + 1) for b in bls)
    s = tiling_direction(L, N)
    ns = tuple(n for n in range(-(N - 1), N) if (N + n) % 2 == 1)
    bl0 = bls[0]
    ls0 = np.floor(np.sqrt(np.arange(bl0 * bl0))).astype(int)
    psi = []
    dir_bases = []
    for j, bl in enumerate(bls[1:]):
        ls = np.floor(np.sqrt(np.arange(bl * bl))).astype(int)
        psi.append(jnp.asarray(
            np.stack([kappas[j][ls] * s[ls, n + N - 1] for n in ns]), dtype=dtype
        ))
        dir_bases.append(tuple(
            sht.get_basis(bl, -n, dtype=dtype, use_disk_cache=use_disk_cache)
            for n in ns
        ))
    gammas = 2 * np.pi * np.arange(2 * N - 1) / (2 * N - 1)
    E = np.exp(1j * np.outer(gammas, np.asarray(ns)))
    dwb = DirectionalWaveletBasis(
        L=L, B=float(B), J_min=J_min, J_max=j_max(B, L), dirs=N, spin=spin,
        bandlimits=bls, ns=ns,
        eta_flm=jnp.asarray(eta[ls0], dtype=dtype),
        scal_basis=sht.get_basis(bl0, spin, dtype=dtype, use_disk_cache=use_disk_cache),
        psi=tuple(psi),
        dir_bases=tuple(dir_bases),
        Egamma=config.to_device(
            E, dtype=jnp.complex128 if dtype == jnp.float64 else jnp.complex64
        ),
        main=sht.get_basis(L, spin, dtype=dtype, use_disk_cache=use_disk_cache),
    )
    _DWB_CACHE[key] = dwb
    return dwb


def _dir_real(x, dwb=None) -> bool:
    """Real output/fast-path applies only to spin-0 real arrays (spin-s
    signals are intrinsically complex)."""
    if dwb is not None and dwb.spin != 0:
        return False
    return not jnp.issubdtype(x.dtype, jnp.complexfloating)


@jax.jit
def analysis_dir(f: jax.Array, dwb: DirectionalWaveletBasis) -> jax.Array:
    """Pixel map -> directional multires coefficients.

    (..., L(2L-1)) -> (..., ncoefs), layout [scaling | scale j: gamma-major
    (2N-1, bl, 2bl-1) flattened | ...].  Real input gives real coefficients.
    """
    real = _dir_real(f, dwb)
    L = dwb.L
    fmap = f.reshape(f.shape[:-1] + (L, 2 * L - 1))
    flm = sht.forward_real(fmap, dwb.main) if real else sht.forward(fmap, dwb.main)
    out = []
    bl0 = dwb.bandlimits[0]
    scal = sht.inverse(flm[..., : bl0 * bl0] * dwb.eta_flm, dwb.scal_basis)
    out.append(scal.real if real else scal)
    for psi, bases, bl in zip(dwb.psi, dwb.dir_bases, dwb.bandlimits[1:]):
        wn = jnp.stack(
            [sht.inverse(flm[..., : bl * bl] * psi[i], basis)
             for i, basis in enumerate(bases)],
            axis=-3,
        )  # (..., N, bl, 2bl-1)
        W = jnp.einsum("gn,...ntp->...gtp", dwb.Egamma, wn.astype(dwb.Egamma.dtype))
        W = W.real if real else W
        out.append(W)
    return jnp.concatenate(
        [o.reshape(o.shape[: f.ndim - 1] + (-1,)) for o in out], axis=-1
    )


def _split_dir(X: jax.Array, dwb: DirectionalWaveletBasis):
    G = 2 * dwb.dirs - 1
    blocks = []
    start = 0
    n0 = sampling.sample_length(dwb.bandlimits[0])
    blocks.append(X[..., :n0])
    start = n0
    for bl in dwb.bandlimits[1:]:
        n = G * sampling.sample_length(bl)
        blocks.append(X[..., start : start + n])
        start += n
    return blocks


@jax.jit
def synthesis_dir(X: jax.Array, dwb: DirectionalWaveletBasis) -> jax.Array:
    """Directional multires coefficients -> pixel map (exact inverse of
    :func:`analysis_dir` by the admissibility identity eta^2 + sum_{j}
    kappa_j^2 sum_n s_ln^2 = 1)."""
    real = _dir_real(X, dwb)
    L = dwb.L
    G = 2 * dwb.dirs - 1
    blocks = _split_dir(X, dwb)
    bl0 = dwb.bandlimits[0]
    smap = blocks[0].reshape(blocks[0].shape[:-1] + (bl0, 2 * bl0 - 1))
    slm = sht.forward(smap, dwb.scal_basis) * dwb.eta_flm
    flm = jnp.pad(slm, [(0, 0)] * (slm.ndim - 1) + [(0, L * L - bl0 * bl0)])
    Einv = jnp.conj(dwb.Egamma).T / G  # exact: columns of Egamma orthogonal
    for blk, psi, bases, bl in zip(
        blocks[1:], dwb.psi, dwb.dir_bases, dwb.bandlimits[1:]
    ):
        W = blk.reshape(blk.shape[:-1] + (G, bl, 2 * bl - 1))
        wn = jnp.einsum("ng,...gtp->...ntp", Einv, W.astype(Einv.dtype))
        wlm = None
        for i, basis in enumerate(bases):
            g = sht.forward(wn[..., i, :, :], basis) * psi[i]
            wlm = g if wlm is None else wlm + g
        flm = flm + jnp.pad(
            wlm, [(0, 0)] * (wlm.ndim - 1) + [(0, L * L - bl * bl)]
        )
    f = sht.inverse(flm, dwb.main)
    f = f.real if real else f
    return f.reshape(f.shape[:-2] + (-1,))


@jax.jit
def synthesis_dir_adjoint(f: jax.Array, dwb: DirectionalWaveletBasis) -> jax.Array:
    """Adjoint of :func:`synthesis_dir`: pixel map -> coefficient space."""
    real = _dir_real(f, dwb)
    L = dwb.L
    fmap = f.reshape(f.shape[:-1] + (L, 2 * L - 1))
    glm = sht.inverse_adjoint(fmap.astype(dwb.Egamma.dtype), dwb.main)
    out = []
    bl0 = dwb.bandlimits[0]
    scal = sht.forward_adjoint(glm[..., : bl0 * bl0] * dwb.eta_flm, dwb.scal_basis)
    out.append(scal.real if real else scal)
    G = 2 * dwb.dirs - 1
    EinvH = dwb.Egamma / G  # adjoint of Einv
    for psi, bases, bl in zip(dwb.psi, dwb.dir_bases, dwb.bandlimits[1:]):
        wn = jnp.stack(
            [sht.forward_adjoint(glm[..., : bl * bl] * psi[i], basis)
             for i, basis in enumerate(bases)],
            axis=-3,
        )  # (..., N, bl, 2bl-1)
        W = jnp.einsum("gn,...ntp->...gtp", EinvH, wn.astype(EinvH.dtype))
        W = W.real if real else W
        out.append(W)
    return jnp.concatenate(
        [o.reshape(o.shape[: f.ndim - 1] + (-1,)) for o in out], axis=-1
    )


@jax.jit
def analysis_dir_adjoint(X: jax.Array, dwb: DirectionalWaveletBasis) -> jax.Array:
    """Adjoint of :func:`analysis_dir`: coefficient space -> pixel map."""
    real = _dir_real(X, dwb)
    L = dwb.L
    G = 2 * dwb.dirs - 1
    blocks = _split_dir(X, dwb)
    bl0 = dwb.bandlimits[0]
    smap = blocks[0].reshape(blocks[0].shape[:-1] + (bl0, 2 * bl0 - 1))
    slm = sht.inverse_adjoint(smap.astype(dwb.Egamma.dtype), dwb.scal_basis) * dwb.eta_flm
    flm = jnp.pad(slm, [(0, 0)] * (slm.ndim - 1) + [(0, L * L - bl0 * bl0)])
    EH = jnp.conj(dwb.Egamma).T  # adjoint of the analysis gamma-assembly
    for blk, psi, bases, bl in zip(
        blocks[1:], dwb.psi, dwb.dir_bases, dwb.bandlimits[1:]
    ):
        W = blk.reshape(blk.shape[:-1] + (G, bl, 2 * bl - 1))
        wn = jnp.einsum("ng,...gtp->...ntp", EH, W.astype(EH.dtype))
        wlm = None
        for i, basis in enumerate(bases):
            g = sht.inverse_adjoint(wn[..., i, :, :], basis) * psi[i]
            wlm = g if wlm is None else wlm + g
        flm = flm + jnp.pad(
            wlm, [(0, 0)] * (wlm.ndim - 1) + [(0, L * L - bl * bl)]
        )
    f = sht.forward_adjoint(flm, dwb.main)
    f = f.real if real else f
    return f.reshape(f.shape[:-2] + (-1,))


# ---------------------------------------------------------------------------
# Harmonic-space multiresolution transforms (pys2let analysis_lm2lmn /
# synthesis_lmn2lm equivalents, axisymmetric: W^j_lm = kappa^j_l f_lm).
# The operator is block-diagonal and real, so synthesis is exactly the
# transpose of analysis: forward_adjoint == synthesis, inverse_adjoint ==
# analysis, and synthesis(analysis(f)) == f by admissibility.
# ---------------------------------------------------------------------------

def analysis_lm(flm: jax.Array, wb: WaveletBasis) -> jax.Array:
    """Harmonic coefficients -> multires wavelet harmonic pyramid.

    (..., L^2) -> (..., sum_j bl_j^2), [scaling | j=J_min | ...].
    Equivalent of ``pys2let.analysis_lm2lmn`` (ref ``transforms.py:90``).
    """
    out = [
        flm[..., : bl * bl] * kap
        for kap, bl in zip(wb.kappa_flm, wb.bandlimits)
    ]
    return jnp.concatenate(out, axis=-1)


def synthesis_lm(X: jax.Array, wb: WaveletBasis) -> jax.Array:
    """Multires wavelet harmonic pyramid -> harmonic coefficients.

    Exact inverse of :func:`analysis_lm` (and its transpose).
    Equivalent of ``pys2let.synthesis_lmn2lm`` (ref ``transforms.py:92``).
    """
    L = wb.L
    flm = None
    start = 0
    for kap, bl in zip(wb.kappa_flm, wb.bandlimits):
        n = bl * bl
        wlm = X[..., start : start + n] * kap
        pad = L * L - n
        wlm_full = jnp.pad(wlm, [(0, 0)] * (wlm.ndim - 1) + [(0, pad)])
        flm = wlm_full if flm is None else flm + wlm_full
        start += n
    return flm


# ---------------------------------------------------------------------------
# Directional harmonic-space transforms (pys2let analysis_lm2lmn with N > 1,
# `/root/reference/pxmcmc/transforms.py:89-93`): per scale j and azimuthal
# order n, W^{jn}_{lm} = f_lm kappa^j_l s_{ln} — a real block-diagonal
# multiply (no SHTs at all), so synthesis is exactly the transpose of
# analysis and synthesis(analysis(f)) == f by the directional admissibility
# identity eta^2 + sum_j kappa_j^2 sum_n s_ln^2 = 1.  Layout:
# [scaling (bl0^2) | scale j: n-major (N, bl_j^2) flattened | ...].
# Valid for any spin (the tiling is spin-independent; spin only selects
# which SHT produced/consumes the flm vector).
# ---------------------------------------------------------------------------

def ncoefs_dir_lm(dwb: DirectionalWaveletBasis) -> tuple[int, int]:
    """(nscal, nwav) of the harmonic directional pyramid."""
    nscal = int(dwb.bandlimits[0]) ** 2
    nwav = sum(len(dwb.ns) * int(b) ** 2 for b in dwb.bandlimits[1:])
    return nscal, nwav


def analysis_dir_lm(flm: jax.Array, dwb: DirectionalWaveletBasis) -> jax.Array:
    """Harmonic coefficients -> directional multires harmonic pyramid.

    (..., L^2) -> (..., nscal + nwav) with the layout above.
    """
    bl0 = dwb.bandlimits[0]
    out = [flm[..., : bl0 * bl0] * dwb.eta_flm]
    for psi, bl in zip(dwb.psi, dwb.bandlimits[1:]):
        # psi: (N, bl^2) real; broadcast over the order axis then flatten
        w = flm[..., None, : bl * bl] * psi
        out.append(w.reshape(w.shape[:-2] + (-1,)))
    return jnp.concatenate(out, axis=-1)


def synthesis_dir_lm(X: jax.Array, dwb: DirectionalWaveletBasis) -> jax.Array:
    """Directional multires harmonic pyramid -> harmonic coefficients.

    Exact inverse (and transpose) of :func:`analysis_dir_lm`.
    """
    L = dwb.L
    N = len(dwb.ns)
    bl0 = dwb.bandlimits[0]
    start = bl0 * bl0
    slm = X[..., :start] * dwb.eta_flm
    flm = jnp.pad(slm, [(0, 0)] * (slm.ndim - 1) + [(0, L * L - bl0 * bl0)])
    for psi, bl in zip(dwb.psi, dwb.bandlimits[1:]):
        n = N * bl * bl
        W = X[..., start : start + n].reshape(X.shape[:-1] + (N, bl * bl))
        wlm = jnp.einsum("...nk,nk->...k", W, psi)
        flm = flm + jnp.pad(wlm, [(0, 0)] * (wlm.ndim - 1) + [(0, L * L - bl * bl)])
        start += n
    return flm

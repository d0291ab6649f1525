r"""Spin spherical harmonic transforms on MW sampling as batched matmuls.

TPU-native replacement for SSHT (the C library the reference reaches through
``pyssht.forward/inverse[_adjoint]`` at
``/root/reference/pxmcmc/measurements.py:223-239``,
``/root/reference/pxmcmc/plotting.py:189-193`` and the tests).

Design
------
A spin-s harmonic coefficient vector ``flm`` (length L^2, indexed
``ind = l^2 + l + m``) maps to an MW pixel map ``f`` of shape (L, 2L-1) via

    f(theta_t, phi_p) = sum_m [ sum_l s_lambda_{lm}(theta_t) f_{lm} ] e^{i m phi_p}

i.e. per-m *real* (L x L) matmuls along theta (MXU) followed by an FFT along
phi (XLA FFT).  The forward (analysis) transform runs the FFT the other way
and applies per-m left inverses ``Q_m = pinv(Lambda_m)`` so that
``forward(inverse(flm)) == flm`` holds *exactly* on bandlimited signals — the
same guarantee the MW sampling theorem gives SSHT.  (SSHT realises a specific
left inverse through Fourier-domain quadrature; we realise the least-squares
left inverse through precomputed pseudo-inverses.  Both are exact on the
bandlimited subspace; they differ only in how out-of-band content — e.g.
pixel noise — is projected, and each is paired with its own exact adjoint so
all operator dot-tests hold.)

Adjoints are exact conjugate-transposes of the linear maps above and are what
the gradient of the Gaussian data fidelity flows through
(`/root/reference/pxmcmc/forward.py:66-72`).

All matrices are precomputed once (host, float64, cached on disk) and stored
on device in the runtime dtype.  Batch (chain) dimensions lead and flow
through `vmap`/`einsum` untouched.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import cache_dir, complex_dtype, real_dtype
from . import sampling
from .wigner import spin_lambda_table

__all__ = [
    "SHTBasis",
    "get_basis",
    "elm2ind",
    "ind2elm",
    "inverse",
    "forward",
    "inverse_adjoint",
    "forward_adjoint",
]


def elm2ind(el: int, m: int) -> int:
    """Harmonic index ind = l^2 + l + m (pyssht.elm2ind convention)."""
    return el * el + el + m


def ind2elm(ind: int) -> tuple[int, int]:
    el = int(np.floor(np.sqrt(ind)))
    return el, ind - el * el - el


def _precompute(L: int, spin: int) -> tuple[np.ndarray, np.ndarray]:
    """Host-side f64 tables: lam[mi, t, l] and its per-m pseudo-inverse q[mi, l, t].

    The per-m pseudo-inverses are independent SVD problems; a thread pool
    parallelises them across cores (LAPACK releases the GIL), which matters
    at L=512 (1023 x 512^2 SVDs).
    """
    from concurrent.futures import ThreadPoolExecutor

    thetas, _ = sampling.sample_positions(L)
    lam = spin_lambda_table(L, spin, thetas)  # (2L-1, L, L)
    q = np.zeros((2 * L - 1, L, L), dtype=np.float64)

    def invert(mi):
        q[mi] = np.linalg.pinv(lam[mi], rcond=1e-12)

    with ThreadPoolExecutor() as ex:
        list(ex.map(invert, range(2 * L - 1)))
    return lam, q


def _cache_path(L: int, spin: int) -> str:
    return os.path.join(cache_dir(), f"sht_L{L}_spin{spin}.npz")


@dataclass(frozen=True)
class SHTBasis:
    """Device-resident transform matrices for one (L, spin) pair."""

    L: int
    spin: int
    lam: jax.Array  # (2L-1, L, L) real, [m + L - 1, theta, l]
    q: jax.Array  # (2L-1, L, L) real, [m + L - 1, l, theta]
    gather_ml: jax.Array  # (2L-1, L) int32: flm index (or L^2 sentinel) per (mi, l)
    flm_mi: jax.Array  # (L^2,) int32
    flm_l: jax.Array  # (L^2,) int32
    # real-path (conjugate-symmetry) helpers, spin 0 only:
    flm_absm: jax.Array  # (L^2,) int32: |m| per flm index
    flm_isneg: jax.Array  # (L^2,) bool: m < 0
    flm_sign: jax.Array  # (L^2,) real: (-1)^m where m < 0, else 1
    # phi-direction DFT matrices (MXU alternative to odd-length FFTs):
    cos_pm: jax.Array  # (2L-1, L) real: cos(m phi_p), [p, m >= 0]
    sin_pm: jax.Array  # (2L-1, L) real: sin(m phi_p)

    @property
    def nlm(self) -> int:
        return self.L * self.L

    @property
    def npix(self) -> int:
        return sampling.sample_length(self.L)


jax.tree_util.register_dataclass(
    SHTBasis,
    data_fields=[
        "lam", "q", "gather_ml", "flm_mi", "flm_l",
        "flm_absm", "flm_isneg", "flm_sign", "cos_pm", "sin_pm",
    ],
    meta_fields=["L", "spin"],
)

_BASIS_CACHE: dict = {}


def tables_mode() -> str:
    """Where the big (lam, q) tables are built: 'host' (f64 numpy + pinv,
    uploaded) or 'device' (Wigner scan + Cholesky pinv on the accelerator,
    zero bulk transfer — see :mod:`pxmcmc_tpu.ops.device_tables`).
    PXMCMC_SHT_TABLES overrides; 'auto' picks 'device' on TPU backends, where
    the multi-GB upload (not the math) dominates setup.
    """
    mode = os.environ.get("PXMCMC_SHT_TABLES", "auto")
    if mode == "auto":
        return "device" if jax.default_backend() == "tpu" else "host"
    return mode


def forward_convention() -> str:
    """Which left inverse the forward (analysis) transform realises:
    'pinv' (least-squares pseudo-inverse, the default) or 'quadrature'
    (SSHT's Fourier-quadrature convention, :mod:`pxmcmc_tpu.ops.quadrature`).
    Identical on bandlimited signals; they differ in how out-of-band (noise)
    content is projected — measured in PARITY.md.  PXMCMC_SHT_FORWARD
    overrides."""
    return os.environ.get("PXMCMC_SHT_FORWARD", "pinv")


def get_basis(L: int, spin: int = 0, dtype=None, use_disk_cache: bool = True,
              tables: str | None = None, forward_conv: str | None = None) -> SHTBasis:
    """Build (or fetch) the transform basis for (L, spin).

    Precompute is float64 on host (``tables='host'``) or generated on device
    (``tables='device'``); tables land on device in ``dtype``
    (default: f64 under x64, else f32; PXMCMC_SHT_DTYPE=bfloat16 opts the
    matmul tables into bf16 for 2x MXU rate at ~1e-2 relative error).
    ``forward_conv='quadrature'`` swaps the analysis tables for SSHT's
    quadrature left inverse (host-built; see :func:`forward_convention`).
    """
    env_dt = os.environ.get("PXMCMC_SHT_DTYPE")
    dtype = dtype or (jnp.dtype(env_dt) if env_dt else None) or real_dtype()
    mode = tables or tables_mode()
    fconv = forward_conv or forward_convention()
    if fconv not in ("pinv", "quadrature"):
        raise ValueError("forward_conv must be 'pinv' or 'quadrature'")
    key = (L, spin, jnp.dtype(dtype).name, mode, fconv)
    if key in _BASIS_CACHE:
        return _BASIS_CACHE[key]

    need_pinv = fconv == "pinv"
    if mode == "device":
        from .device_tables import pinv_from_lambda_device, spin_lambda_device

        gen_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        lam64 = spin_lambda_device(L, spin, dtype=gen_dtype)
        q64 = pinv_from_lambda_device(lam64) if need_pinv else None
    elif need_pinv and use_disk_cache and os.path.exists(_cache_path(L, spin)):
        with np.load(_cache_path(L, spin)) as z:
            lam64, q64 = z["lam"], z["q"]
    elif need_pinv:
        lam64, q64 = _precompute(L, spin)
        if use_disk_cache and L >= 64:
            tmp = _cache_path(L, spin) + ".tmp.npz"
            np.savez(tmp, lam=lam64, q=q64)
            os.replace(tmp, _cache_path(L, spin))
    else:
        thetas, _ = sampling.sample_positions(L)
        lam64 = spin_lambda_table(L, spin, thetas)
    if not need_pinv:
        from .quadrature import quadrature_analysis_tables

        q64 = quadrature_analysis_tables(L, spin, use_disk_cache=use_disk_cache)

    ls = np.arange(L)
    ms = np.arange(-(L - 1), L)
    # (mi, l) -> flm index; invalid slots (|m| > l) point at the zero sentinel L^2.
    gather = np.full((2 * L - 1, L), L * L, dtype=np.int32)
    for mi, m in enumerate(ms):
        valid = ls >= abs(m)
        gather[mi, valid] = ls[valid] ** 2 + ls[valid] + m
    inds = np.arange(L * L)
    flm_l = np.floor(np.sqrt(inds)).astype(np.int32)
    flm_m = (inds - flm_l.astype(np.int64) ** 2 - flm_l).astype(np.int32)
    flm_mi = flm_m + (L - 1)

    sign = np.where(flm_m < 0, (-1.0) ** np.abs(flm_m), 1.0)
    phis = 2 * np.pi * np.arange(2 * L - 1) / (2 * L - 1)
    mphi = np.outer(phis, np.arange(L))  # (2L-1, L)
    basis = SHTBasis(
        L=L,
        spin=spin,
        lam=jnp.asarray(lam64, dtype=dtype),
        q=jnp.asarray(q64, dtype=dtype),
        gather_ml=jnp.asarray(gather),
        flm_mi=jnp.asarray(flm_mi),
        flm_l=jnp.asarray(flm_l),
        flm_absm=jnp.asarray(np.abs(flm_m)),
        flm_isneg=jnp.asarray(flm_m < 0),
        flm_sign=jnp.asarray(sign, dtype=dtype),
        cos_pm=jnp.asarray(np.cos(mphi), dtype=dtype),
        sin_pm=jnp.asarray(np.sin(mphi), dtype=dtype),
    )
    _BASIS_CACHE[key] = basis
    return basis


_LAM_CACHE: dict = {}


def get_lambda(L: int, spin: int, dtype=None, tables: str | None = None) -> jax.Array:
    """Just the (2L-1, L, L) spin-lambda theta table — no pseudo-inverse.

    The stacked-real weak-lensing chain (ops/lensing.py) synthesises gamma
    with the spin-2 lambda only; fetching it alone skips the (compile-heavy)
    per-m pinv of :func:`get_basis`.
    """
    dtype = dtype or real_dtype()
    mode = tables or tables_mode()
    key = (L, spin, jnp.dtype(dtype).name, mode)
    if key in _LAM_CACHE:
        return _LAM_CACHE[key]
    bkey = (L, spin, jnp.dtype(dtype).name, mode, "pinv")
    if bkey in _BASIS_CACHE:  # reuse an already-built full basis
        lam = _BASIS_CACHE[bkey].lam
    elif mode == "device":
        from .device_tables import spin_lambda_device

        gen_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        lam = spin_lambda_device(L, spin, dtype=gen_dtype).astype(dtype)
    else:
        thetas, _ = sampling.sample_positions(L)
        lam = jnp.asarray(spin_lambda_table(L, spin, thetas), dtype=dtype)
    _LAM_CACHE[key] = lam
    return lam


# ---------------------------------------------------------------------------
# Layout helpers (flm vector <-> (m, l) matrix)
# ---------------------------------------------------------------------------

def _to_ml(flm: jax.Array, basis: SHTBasis) -> jax.Array:
    """(..., L^2) -> (..., 2L-1, L) with zeros at |m| > l."""
    pad = jnp.zeros(flm.shape[:-1] + (1,), dtype=flm.dtype)
    flmp = jnp.concatenate([flm, pad], axis=-1)
    return flmp[..., basis.gather_ml]


def _from_ml(F: jax.Array, basis: SHTBasis) -> jax.Array:
    """(..., 2L-1, L) -> (..., L^2)."""
    return F[..., basis.flm_mi, basis.flm_l]


def _real_mat_complex_vec(spec: str, mat: jax.Array, z: jax.Array) -> jax.Array:
    """einsum of a real matrix with a complex operand via two real matmuls.

    Avoids XLA materialising a complex copy of the (large) basis matrices and
    runs both halves through the MXU.  ``spec`` must route the stacked
    real/imag axis through '...'.  bf16 tables (``get_basis(dtype=bfloat16)``
    or PXMCMC_SHT_DTYPE=bfloat16) run the MXU at double rate with f32
    accumulation — opt-in, ~1e-2 relative transform error.
    """
    bf16 = mat.dtype == jnp.bfloat16
    if not jnp.issubdtype(z.dtype, jnp.complexfloating):
        if bf16:
            return jnp.einsum(
                spec, mat, z.astype(jnp.bfloat16), preferred_element_type=jnp.float32
            )
        return jnp.einsum(spec, mat, z)
    zr = jnp.stack([z.real, z.imag], axis=0)
    if bf16:
        out = jnp.einsum(
            spec, mat, zr.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
    else:
        out = jnp.einsum(spec, mat, zr)
    return jax.lax.complex(out[0], out[1])



def _phi_mats_full(basis: SHTBasis):
    """Signed-m DFT matrices (p, 2L-1): cos(m phi_p), sin(m phi_p) for
    m = -(L-1)..L-1, built from the stored m>=0 halves."""
    c = basis.cos_pm
    s = basis.sin_pm
    C = jnp.concatenate([jnp.flip(c[:, 1:], axis=1), c], axis=1)
    S = jnp.concatenate([-jnp.flip(s[:, 1:], axis=1), s], axis=1)
    return C, S


def _phi_synth_cplx(T: jax.Array, basis: SHTBasis, scale: float) -> jax.Array:
    """Full-spectrum T (..., 2L-1(m), L(t)) -> map (..., L(t), 2L-1(p)):
    f[t,p] = scale * sum_m T[m,t] e^{i m phi_p} (DFT-matmul phi mode)."""
    C, S = _phi_mats_full(basis)
    Tr, Ti = T.real, T.imag
    re = _mm(C, Tr, "pm,...mt->...tp") - _mm(S, Ti, "pm,...mt->...tp")
    im = _mm(C, Ti, "pm,...mt->...tp") + _mm(S, Tr, "pm,...mt->...tp")
    return jax.lax.complex(re, im) * scale


def _phi_analysis_cplx(f: jax.Array, basis: SHTBasis, scale: float) -> jax.Array:
    """Map (..., L(t), 2L-1(p)) -> full spectrum (..., 2L-1(m), L(t)):
    T[m,t] = scale * sum_p f[t,p] e^{-i m phi_p}."""
    C, S = _phi_mats_full(basis)
    fr, fi = f.real, f.imag
    re = _mm(C, fr, "pm,...tp->...mt") + _mm(S, fi, "pm,...tp->...mt")
    im = _mm(C, fi, "pm,...tp->...mt") - _mm(S, fr, "pm,...tp->...mt")
    return jax.lax.complex(re, im) * scale


# ---------------------------------------------------------------------------
# Transforms.  All accept leading batch dimensions.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("reality",))
def inverse(flm: jax.Array, basis: SHTBasis, reality: bool = False) -> jax.Array:
    """Inverse (synthesis) spin SHT: (..., L^2) complex -> (..., L, 2L-1) map.

    Equivalent of ``pyssht.inverse(flm, L, Spin=spin)``; with ``reality=True``
    the (real part of the) map is returned as a real array.
    """
    L = basis.L
    N = 2 * L - 1
    F = _to_ml(flm.astype(complex_dtype()), basis)  # (..., N, L)
    T = _real_mat_complex_vec("mtl,...ml->...mt", basis.lam, F)  # (..., N(m), L(t))
    if PHI_MODE == "dft":
        f = _phi_synth_cplx(T, basis, 1.0)  # (..., L(t), N(p))
    else:
        A = jnp.roll(T, -(L - 1), axis=-2)
        f = N * jnp.fft.ifft(A, axis=-2)  # (..., N(p), L(t))
        f = jnp.swapaxes(f, -1, -2)  # (..., L, 2L-1)
    return f.real if reality else f


@partial(jax.jit, static_argnames=())
def forward(f: jax.Array, basis: SHTBasis) -> jax.Array:
    """Forward (analysis) spin SHT: (..., L, 2L-1) map -> (..., L^2) complex.

    Equivalent of ``pyssht.forward(f, L, Spin=spin)`` — exact on bandlimited
    maps (see module docstring for the out-of-band convention).
    """
    L = basis.L
    N = 2 * L - 1
    f = f.astype(complex_dtype())
    if PHI_MODE == "dft":
        Fm = _phi_analysis_cplx(f, basis, 1.0 / N)  # (..., N(m), L(t))
    else:
        Fk = jnp.fft.fft(f, axis=-1) / N  # (..., L(t), N(k))
        Fm = jnp.roll(Fk, L - 1, axis=-1)  # k -> mi
        Fm = jnp.swapaxes(Fm, -1, -2)  # (..., N(m), L(t))
    G = _real_mat_complex_vec("mlt,...mt->...ml", basis.q, Fm)  # (..., N(m), L(l))
    return _from_ml(G, basis)


@partial(jax.jit, static_argnames=())
def inverse_adjoint(f: jax.Array, basis: SHTBasis) -> jax.Array:
    """Adjoint of :func:`inverse`: (..., L, 2L-1) map -> (..., L^2) coefficients.

    Equivalent of ``pyssht.inverse_adjoint`` in the role it plays in the
    reference gradient chain (``/root/reference/pxmcmc/measurements.py:237``).
    """
    L = basis.L
    f = f.astype(complex_dtype())
    if PHI_MODE == "dft":
        T = _phi_analysis_cplx(f, basis, 1.0)  # adjoint of N*ifft: unscaled
    else:
        Tp = jnp.swapaxes(f, -1, -2)  # (..., N(p), L(t))
        A = jnp.fft.fft(Tp, axis=-2)  # adjoint of N*ifft
        T = jnp.roll(A, L - 1, axis=-2)  # (..., N(m), L(t))
    G = _real_mat_complex_vec("mtl,...mt->...ml", basis.lam, T)  # lam^T contraction
    return _from_ml(G, basis)


@partial(jax.jit, static_argnames=())
def forward_adjoint(flm: jax.Array, basis: SHTBasis) -> jax.Array:
    """Adjoint of :func:`forward`: (..., L^2) coefficients -> (..., L, 2L-1) map.

    Equivalent of ``pyssht.forward_adjoint`` (``measurements.py:239``).
    """
    L = basis.L
    N = 2 * L - 1
    F = _to_ml(flm.astype(complex_dtype()), basis)  # (..., N(m), L(l))
    Ft = _real_mat_complex_vec("mlt,...ml->...mt", basis.q, F)  # q^T: (..., N(m), L(t))
    if PHI_MODE == "dft":
        return _phi_synth_cplx(Ft, basis, 1.0 / N)  # adjoint of fft/N
    B = jnp.swapaxes(Ft, -1, -2)  # (..., L(t), N(m))
    B = jnp.roll(B, -(L - 1), axis=-1)  # m -> k
    f = jnp.fft.ifft(B, axis=-1)  # adjoint of fft/N
    return f


# ---------------------------------------------------------------------------
# Real-field fast path (spin 0): conjugate symmetry f_{l,-m} = (-1)^m f_{lm}*
# halves the m-range of the matmuls and replaces fft with rfft.  Each function
# computes *exactly* the same linear operator as its complex counterpart
# restricted to real maps / conjugate-symmetric coefficients, so all adjoint
# relations and tests of the complex path carry over unchanged.
# ---------------------------------------------------------------------------

def _to_ml_pos(flm: jax.Array, basis: SHTBasis) -> jax.Array:
    """(..., L^2) complex -> (..., L, L) [m >= 0, l] half-spectrum."""
    pad = jnp.zeros(flm.shape[:-1] + (1,), dtype=flm.dtype)
    flmp = jnp.concatenate([flm, pad], axis=-1)
    return flmp[..., basis.gather_ml[basis.L - 1 :]]


def _from_ml_pos(Gpos: jax.Array, basis: SHTBasis) -> jax.Array:
    """Half-spectrum (..., L(m>=0), L(l)) -> full (..., L^2) via conjugate
    symmetry (spin 0): f_{l,-m} = (-1)^m conj(f_{lm})."""
    vals = Gpos[..., basis.flm_absm, basis.flm_l]
    mirrored = jnp.conj(vals) * basis.flm_sign
    return jnp.where(basis.flm_isneg, mirrored, vals)



def _mm(mat: jax.Array, x: jax.Array, spec: str) -> jax.Array:
    """Real einsum honouring bf16 tables (bf16 x bf16 -> f32 accumulate)."""
    if mat.dtype == jnp.bfloat16:
        return jnp.einsum(spec, mat, x.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.einsum(spec, mat, x)


#: phi-transform implementation for the real path: 'fft' uses rfft/irfft
#: (odd length 2L-1 — slow radix on TPU), 'dft' uses cos/sin matmuls on the
#: MXU.  Identical results; pick per hardware with PXMCMC_SHT_PHI.
PHI_MODE = os.environ.get("PXMCMC_SHT_PHI", "dft")


def _phi_synth_real(T: jax.Array, basis: SHTBasis) -> jax.Array:
    """Half-spectrum theta-major T (..., L(m), L(t)) -> real map (..., L, 2L-1).

    f[t,p] = Re( T[0,t] + 2 sum_{m>0} T[m,t] e^{i m phi_p} ).
    """
    L = basis.L
    N = 2 * L - 1
    if PHI_MODE == "fft":
        f = N * jnp.fft.irfft(T, n=N, axis=-2)  # (..., N(p), L(t))
        return jnp.swapaxes(f, -1, -2)
    c = jnp.ones((L,), dtype=jnp.float32).at[1:].set(2.0)
    Tr = T.real * c[..., :, None]
    Ti = T.imag * c[..., :, None]
    f = _mm(basis.cos_pm, Tr, "pm,...mt->...tp") - _mm(
        basis.sin_pm, Ti, "pm,...mt->...tp"
    )
    return f


def _phi_analysis_real(f: jax.Array, basis: SHTBasis, scale: float) -> jax.Array:
    """Real map (..., L, 2L-1) -> half-spectrum (..., L(m), L(t)):
    T[m,t] = scale * sum_p f[t,p] e^{-i m phi_p}."""
    L = basis.L
    if PHI_MODE == "fft":
        A = jnp.fft.rfft(f, axis=-1) * scale  # (..., L(t), L(m))
        return jnp.swapaxes(A, -1, -2)
    re = _mm(basis.cos_pm, f, "pm,...tp->...mt") * scale
    im = -_mm(basis.sin_pm, f, "pm,...tp->...mt") * scale
    return jax.lax.complex(re, im)


def inverse_real(flm: jax.Array, basis: SHTBasis) -> jax.Array:
    """Real-output synthesis: equals ``inverse(flm).real`` for conjugate
    -symmetric flm, at half the matmul cost.  (..., L^2) -> (..., L, 2L-1) real.
    """
    assert basis.spin == 0, "real path is spin-0 only"
    L = basis.L
    F = _to_ml_pos(flm.astype(complex_dtype()), basis)  # (..., L(m), L(l))
    T = _real_mat_complex_vec("mtl,...ml->...mt", basis.lam[L - 1 :], F)
    return _phi_synth_real(T, basis)


def forward_real(f: jax.Array, basis: SHTBasis) -> jax.Array:
    """Analysis of a real map: equals ``forward(f)`` for real f.
    (..., L, 2L-1) real -> (..., L^2) complex (conjugate-symmetric)."""
    assert basis.spin == 0
    L = basis.L
    N = 2 * L - 1
    Fm = _phi_analysis_real(f, basis, 1.0 / N)  # (..., L(m), L(t))
    G = _real_mat_complex_vec("mlt,...mt->...ml", basis.q[L - 1 :], Fm)
    return _from_ml_pos(G, basis)


def inverse_adjoint_real(f: jax.Array, basis: SHTBasis) -> jax.Array:
    """Equals ``inverse_adjoint(f)`` for real f; half-cost.
    (..., L, 2L-1) real -> (..., L^2) complex (conjugate-symmetric)."""
    assert basis.spin == 0
    L = basis.L
    T = _phi_analysis_real(f, basis, 1.0)  # adjoint of N*ifft: unscaled
    G = _real_mat_complex_vec("mtl,...mt->...ml", basis.lam[L - 1 :], T)
    return _from_ml_pos(G, basis)


def forward_adjoint_real(flm: jax.Array, basis: SHTBasis) -> jax.Array:
    """Equals ``forward_adjoint(flm).real`` for conjugate-symmetric flm.
    (..., L^2) -> (..., L, 2L-1) real."""
    assert basis.spin == 0
    L = basis.L
    N = 2 * L - 1
    F = _to_ml_pos(flm.astype(complex_dtype()), basis)
    Ft = _real_mat_complex_vec("mlt,...ml->...mt", basis.q[L - 1 :], F)
    return _phi_synth_real(Ft, basis) / N  # 1/N matches the ifft scaling


# ---------------------------------------------------------------------------
# Stacked-real phi transforms.  Complex values are carried as a re/im axis at
# position -3 (..., 2, m|t, t|p) so every op below is a *real* matmul on the
# MXU — no complex arrays anywhere (TPU backends mishandle or pessimise
# complex elementwise/scatter ops; measured in BENCH.md round 2).
# ---------------------------------------------------------------------------

def phi_analysis_r2(f: jax.Array, basis: SHTBasis, scale: float) -> jax.Array:
    """Real map (..., t, p) -> stacked half spectrum (..., 2, m, t)."""
    if PHI_MODE == "fft":
        A = jnp.fft.rfft(f, axis=-1) * scale  # (..., t, m)
        A = jnp.swapaxes(A, -1, -2)
        return jnp.stack([A.real, A.imag], axis=-3)
    re = _mm(basis.cos_pm, f, "pm,...tp->...mt") * scale
    im = -_mm(basis.sin_pm, f, "pm,...tp->...mt") * scale
    return jnp.stack([re, im], axis=-3)


def phi_synth_r2(T2: jax.Array, basis: SHTBasis) -> jax.Array:
    """Stacked half spectrum (..., 2, m, t) -> real map (..., t, p).

    f[t,p] = Re( T[0,t] + 2 sum_{m>0} T[m,t] e^{i m phi_p} ).
    """
    L = basis.L
    N = 2 * L - 1
    if PHI_MODE == "fft":
        T = jax.lax.complex(T2[..., 0, :, :], T2[..., 1, :, :])
        f = N * jnp.fft.irfft(T, n=N, axis=-2)  # (..., p, t)
        return jnp.swapaxes(f, -1, -2)
    c = jnp.ones((L,), dtype=jnp.float32).at[1:].set(2.0)
    Tr = T2[..., 0, :, :] * c[:, None]
    Ti = T2[..., 1, :, :] * c[:, None]
    return _mm(basis.cos_pm, Tr, "pm,...mt->...tp") - _mm(
        basis.sin_pm, Ti, "pm,...mt->...tp"
    )


def phi_synth_full2(T2: jax.Array, basis: SHTBasis) -> jax.Array:
    """Stacked full spectrum (..., 2, 2L-1(m), t) -> stacked map (..., 2, t, p).

    Stacked-real equivalent of :func:`_phi_synth_cplx` (scale 1).
    """
    L = basis.L
    Tr, Ti = T2[..., 0, :, :], T2[..., 1, :, :]
    if PHI_MODE == "fft":
        T = jax.lax.complex(Tr, Ti)
        A = jnp.roll(T, -(L - 1), axis=-2)
        f = (2 * L - 1) * jnp.fft.ifft(A, axis=-2)  # (..., p, t)
        f = jnp.swapaxes(f, -1, -2)
        return jnp.stack([f.real, f.imag], axis=-3)
    C, S = _phi_mats_full(basis)
    re = _mm(C, Tr, "pm,...mt->...tp") - _mm(S, Ti, "pm,...mt->...tp")
    im = _mm(C, Ti, "pm,...mt->...tp") + _mm(S, Tr, "pm,...mt->...tp")
    return jnp.stack([re, im], axis=-3)


def phi_analysis_full2(f2: jax.Array, basis: SHTBasis, scale: float) -> jax.Array:
    """Stacked map (..., 2, t, p) -> stacked full spectrum (..., 2, m, t).

    Stacked-real equivalent of :func:`_phi_analysis_cplx`; with ``scale=1``
    it is the exact real-linear transpose of :func:`phi_synth_full2`.
    """
    L = basis.L
    fr, fi = f2[..., 0, :, :], f2[..., 1, :, :]
    if PHI_MODE == "fft":
        f = jax.lax.complex(fr, fi)
        Fk = jnp.fft.fft(f, axis=-1) * scale
        Fm = jnp.roll(Fk, L - 1, axis=-1)
        Fm = jnp.swapaxes(Fm, -1, -2)
        return jnp.stack([Fm.real, Fm.imag], axis=-3)
    C, S = _phi_mats_full(basis)
    re = (_mm(C, fr, "pm,...tp->...mt") + _mm(S, fi, "pm,...tp->...mt")) * scale
    im = (_mm(C, fi, "pm,...tp->...mt") - _mm(S, fr, "pm,...tp->...mt")) * scale
    return jnp.stack([re, im], axis=-3)


# ---------------------------------------------------------------------------
# Normal-operator (Gram) tables: inverse_adjoint(inverse(.)) per m
# ---------------------------------------------------------------------------

_GRAM_CACHE: dict = {}


def get_gram(L: int, spin: int = 0, dtype=None, use_disk_cache: bool = True,
             tables: str | None = None) -> jax.Array:
    """Per-m Gram matrices of the synthesis operator: G_m = N * Lambda_m^T Lambda_m.

    For a *scalar* pixel weighting c, the composition
    ``inverse_adjoint(c * inverse(flm))`` equals the per-m matmul
    ``c * G_m @ flm_m`` exactly (the phi-DFT is unitary up to N:
    V^H V = N I), so gradient chains through a square identity measurement
    skip pixel space entirely.  m >= 0 half only (real path); (L, L, L).
    """
    dtype = dtype or real_dtype()
    mode = tables or tables_mode()
    key = (L, spin, jnp.dtype(dtype).name, mode)
    if key in _GRAM_CACHE:
        return _GRAM_CACHE[key]
    if mode == "device":
        from .device_tables import gram_from_lambda_device, spin_lambda_device

        gen_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        lam_pos = spin_lambda_device(L, spin, dtype=gen_dtype)[L - 1 :]
        g = gram_from_lambda_device(lam_pos).astype(dtype)
        _GRAM_CACHE[key] = g
        return g
    path = os.path.join(cache_dir(), f"sht_gram_L{L}_spin{spin}.npz")
    if use_disk_cache and os.path.exists(path):
        with np.load(path) as z:
            g64 = z["gram"]
    else:
        basis = get_basis(L, spin, dtype=jnp.float64 if jax.config.jax_enable_x64 else None,
                          use_disk_cache=use_disk_cache)
        lam64, _ = (None, None)
        # recompute in f64 on host for precision
        from .wigner import spin_lambda_table

        thetas, _p = sampling.sample_positions(L)
        lam_full = spin_lambda_table(L, spin, thetas)
        lam_pos = lam_full[L - 1 :]  # (L, L(t), L(l))
        N = 2 * L - 1
        g64 = N * np.einsum("mtl,mtk->mlk", lam_pos, lam_pos)
        if use_disk_cache and L >= 64:
            tmp = path + ".tmp.npz"
            np.savez(tmp, gram=g64)
            os.replace(tmp, path)
    g = jnp.asarray(g64, dtype=dtype)
    _GRAM_CACHE[key] = g
    return g


def gram_apply_real(flm: jax.Array, gram: jax.Array, basis: SHTBasis) -> jax.Array:
    """inverse_adjoint(inverse(flm)) for conjugate-symmetric flm via Gram matmuls.

    Exactly equal to ``inverse_adjoint_real(inverse_real(flm))`` at a third
    of the flops (no phi transforms, no pixel materialisation).
    """
    F = _to_ml_pos(flm.astype(complex_dtype()), basis)  # (..., L(m), L(l))
    H = _real_mat_complex_vec("mlk,...mk->...ml", gram, F)
    return _from_ml_pos(H, basis)

r"""Wigner small-d functions — the theta-dependence of spin spherical harmonics.

This is the TPU build's native-math replacement for the role SSHT's C core
plays in the reference (reached via ``pyssht.forward/inverse`` at
``/root/reference/pxmcmc/measurements.py:223-239`` etc.).  Instead of
translating SSHT's Fourier-domain algorithm, we tabulate

    s_lambda_{l m}(theta) = (-1)^s sqrt((2l+1)/(4 pi)) d^l_{m,-s}(theta)

on the MW theta rings so that the spin-s spherical harmonic

    sY_{l m}(theta, phi) = s_lambda_{l m}(theta) e^{i m phi}

separates into a *real* matrix along theta (hits the MXU as a batched matmul)
and a complex exponential along phi (an FFT).  See :mod:`pxmcmc_tpu.ops.sht`.

The d-functions are evaluated with the standard three-term recursion in l
(stable upwards, the generalisation of the associated-Legendre recursion):

    l sqrt((l+1)^2-m^2) sqrt((l+1)^2-n^2) d^{l+1}_{mn}
      = (2l+1) [ l (l+1) x - m n ] d^l_{mn}
        - (l+1) sqrt(l^2-m^2) sqrt(l^2-n^2) d^{l-1}_{mn},       x = cos(theta)

seeded at l0 = max(|m|, |n|) with the closed forms

    d^a_{ a,n} = C(a,n) c^{a+n} (-sb)^{a-n}     (a = |m| >= |n|, m = +a)
    d^a_{-a,n} = C(a,n) c^{a-n}   sb^{a+n}      (m = -a)
    d^b_{m, b} = C(b,m) c^{b+m}   sb^{b-m}      (b = |n| >  |m|, n = +b)
    d^b_{m,-b} = C(b,m) c^{b-m} (-sb)^{b+m}     (n = -b)

where c = cos(theta/2), sb = sin(theta/2) and
C(j,k) = sqrt( (2j)! / ((j+k)!(j-k)!) ).

Everything is float64 numpy: this runs once at operator-construction time and
the resulting tables are cached (see :mod:`pxmcmc_tpu.ops.sht`).
"""
from __future__ import annotations

import numpy as np
from scipy.special import gammaln


def _log_binom_norm(j: np.ndarray, k: np.ndarray) -> np.ndarray:
    """log C(j,k) = 0.5*(log (2j)! - log (j+k)! - log (j-k)!)."""
    return 0.5 * (
        gammaln(2 * j + 1) - gammaln(j + k + 1) - gammaln(j - k + 1)
    )


def wigner_d_table(L: int, n: int, thetas: np.ndarray) -> np.ndarray:
    """Tabulate d^l_{m,n}(theta) for all l < L, |m| < L at the given angles.

    :param L: bandlimit (l and m run over 0..L-1 and -(L-1)..L-1)
    :param n: fixed second index (= -spin for spin harmonics)
    :param thetas: 1D array of angles, shape (T,)
    :return: array of shape (2L-1, T, L) indexed [m + L - 1, t, l];
        entries with l < max(|m|, |n|) are zero.
    """
    thetas = np.asarray(thetas, dtype=np.float64)
    T = thetas.size
    ms = np.arange(-(L - 1), L)  # (2L-1,)
    x = np.cos(thetas)  # (T,)
    c = np.cos(thetas / 2.0)
    sb = np.sin(thetas / 2.0)
    # Avoid log(0) at theta = 0 or pi (MW rings exclude both, but be safe).
    logc = np.log(np.maximum(np.abs(c), 1e-300))
    logsb = np.log(np.maximum(np.abs(sb), 1e-300))

    out = np.zeros((2 * L - 1, T, L), dtype=np.float64)

    absm = np.abs(ms)
    an = abs(n)
    l0 = np.maximum(absm, an)  # (2L-1,) starting degree per m

    # ----- seeds d^{l0}_{m,n}(theta), computed in log space for stability ----
    # Shapes: per-m scalar coefficient x per-theta powers -> (2L-1, T)
    seed = np.zeros((2 * L - 1, T), dtype=np.float64)
    for i, m in enumerate(ms):
        a = abs(m)
        if a >= an:
            j, k = a, n
            if m >= 0:
                pc, ps, sgn = a + n, a - n, (-1.0) ** (a - n)
            else:
                pc, ps, sgn = a - n, a + n, 1.0
        else:
            j, k = an, m
            if n >= 0:
                pc, ps, sgn = an + m, an - m, 1.0
            else:
                pc, ps, sgn = an - m, an + m, (-1.0) ** (an + m)
        logC = _log_binom_norm(np.float64(j), np.float64(k))
        seed[i] = sgn * np.exp(logC + pc * logc + ps * logsb)
        # sign of c^pc when c<0 cannot occur for theta in (0, pi); sb >= 0.
    # --------------------------------------------------------------------
    # Upward recursion in l, vectorised over (m, theta).
    # State: d_lm1 = d^{l-1}, d_l = d^l.
    d_lm1 = np.zeros((2 * L - 1, T), dtype=np.float64)
    d_l = np.zeros((2 * L - 1, T), dtype=np.float64)
    for l in range(0, L):
        starting = l0 == l
        if np.any(starting):
            d_l[starting] = seed[starting]
            d_lm1[starting] = 0.0
        active = l0 <= l
        out[active, :, l] = d_l[active]
        if l == L - 1:
            break
        # advance l -> l+1 for rows with l0 <= l
        if l == 0:
            # Only the (m=0, n=0) row can be active at l=0 and the general
            # recursion is 0/0 there; use d^1_{00} = cos(theta) * d^0_{00}.
            d_next = x[None, :] * d_l
        else:
            m_f = ms.astype(np.float64)[:, None]  # (2L-1, 1)
            lf = float(l)
            a_num = (2 * lf + 1) * (lf * (lf + 1) * x[None, :] - m_f * n)
            b_num = (lf + 1) * np.sqrt(
                np.maximum(lf ** 2 - m_f ** 2, 0.0)
            ) * np.sqrt(max(lf ** 2 - n ** 2, 0.0))
            denom = lf * np.sqrt(
                np.maximum((lf + 1) ** 2 - m_f ** 2, 0.0)
            ) * np.sqrt((lf + 1) ** 2 - n ** 2)
            with np.errstate(divide="ignore", invalid="ignore"):
                d_next = np.where(
                    denom > 0,
                    (a_num * d_l - b_num * d_lm1) / np.where(denom > 0, denom, 1.0),
                    0.0,
                )
        step = active
        d_lm1 = np.where(step[:, None], d_l, d_lm1)
        d_l = np.where(step[:, None], d_next, d_l)
    return out


def spin_lambda_table(
    L: int, spin: int, thetas: np.ndarray, use_native: bool = True
) -> np.ndarray:
    """s_lambda_{l m}(theta) = (-1)^s sqrt((2l+1)/4pi) d^l_{m,-s}(theta).

    Shape (2L-1, T, L) indexed [m + L - 1, t, l]; real.  Uses the C++/OpenMP
    core from :mod:`pxmcmc_tpu.native` when available.
    """
    d = None
    if use_native:
        try:
            from ..native import wigner_d_table_native

            d = wigner_d_table_native(L, -spin, np.asarray(thetas, dtype=np.float64))
        except ImportError:
            pass
    if d is None:
        d = wigner_d_table(L, -spin, thetas)
    ls = np.arange(L)
    norm = (-1.0) ** spin * np.sqrt((2 * ls + 1) / (4.0 * np.pi))
    return d * norm[None, None, :]

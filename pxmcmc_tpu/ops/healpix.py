r"""Minimal healpix support: FITS map reading and ring-based map2alm/alm2map.

The reference experiments read healpix-format inputs through healpy (ETOPO1
topography at ``/root/reference/experiments/earthtopography/main.py:79-82``,
Takahashi kappa at ``weaklensing/main.py:23-39``).  healpy is a C++ extension
and may be absent; this module provides the needed subset in pure
numpy — host-side input conversion, run once at setup (SURVEY.md §2a keeps
healpix strictly off the hot path).

Implements:
* a small FITS binary-table reader for healpix maps (RING or NESTED),
* RING-ordering pixel geometry (iso-latitude rings),
* approximate spherical harmonic analysis ``map2alm`` via per-ring FFTs +
  Legendre sums with equal-area quadrature weights (first-order accurate,
  plus optional Jacobi refinement iterations like healpy's ``iter``),
* synthesis ``alm2map``.

alm output/input uses this package's flm layout (ind = l^2 + l + m).
"""
from __future__ import annotations

import numpy as np

from .wigner import spin_lambda_table

__all__ = ["read_healpix_fits", "ring_info", "map2alm", "alm2map", "npix_to_nside"]


# ---------------------------------------------------------------------------
# FITS reading
# ---------------------------------------------------------------------------

_BLOCK = 2880


def _read_header(f):
    cards = {}
    while True:
        block = f.read(_BLOCK)
        if len(block) < _BLOCK:
            raise ValueError("truncated FITS header")
        for i in range(0, _BLOCK, 80):
            card = block[i : i + 80].decode("ascii", errors="replace")
            key = card[:8].strip()
            if key == "END":
                return cards
            if "=" in card[8:10]:
                val = card[10:].split("/")[0].strip()
                if val.startswith("'"):
                    val = val.strip("' ")
                cards[key] = val


_TFORM_DTYPES = {
    "E": (">f4", 4),
    "D": (">f8", 8),
    "J": (">i4", 4),
    "K": (">i8", 8),
    "I": (">i2", 2),
    "B": ("u1", 1),
}


def read_healpix_fits(path):
    """Read a healpix map from a FITS binary table.

    :return: (map as float64 array in RING ordering, nside)
    """
    with open(path, "rb") as f:
        hdr = _read_header(f)  # primary
        naxis = int(hdr.get("NAXIS", 0))
        # skip primary data (usually none)
        size = 0
        if naxis:
            size = abs(int(hdr.get("BITPIX", 8))) // 8
            for i in range(1, naxis + 1):
                size *= int(hdr[f"NAXIS{i}"])
        f.seek((size + _BLOCK - 1) // _BLOCK * _BLOCK, 1)

        ext = _read_header(f)
        if ext.get("XTENSION", "").strip() != "BINTABLE":
            raise ValueError("expected BINTABLE extension")
        row_bytes = int(ext["NAXIS1"])
        nrows = int(ext["NAXIS2"])
        tform = ext.get("TFORM1", "1E").strip()
        # parse e.g. '1024E'
        code = tform[-1]
        repeat = int(tform[:-1] or 1)
        dtype, itemsize = _TFORM_DTYPES[code]
        if repeat * itemsize != row_bytes:
            # multi-column table: only read the first column per row
            data = np.empty((nrows, repeat), dtype=dtype)
            raw = f.read(row_bytes * nrows)
            for r in range(nrows):
                start = r * row_bytes
                data[r] = np.frombuffer(
                    raw, dtype=dtype, count=repeat, offset=start
                )
            m = data.reshape(-1).astype(np.float64)
        else:
            m = np.fromfile(f, dtype=dtype, count=nrows * repeat).astype(np.float64)
        ordering = ext.get("ORDERING", "RING").strip().upper()
        nside = int(ext.get("NSIDE", npix_to_nside(m.size)))
    if ordering == "NESTED":
        m = m[nest2ring_index(nside)]
    bad = ~np.isfinite(m) | (m < -1.63e30)  # healpix UNSEEN sentinel
    if bad.any():
        m = np.where(bad, np.nanmean(m[~bad]), m)
    return m, nside


def npix_to_nside(npix: int) -> int:
    nside = int(round(np.sqrt(npix / 12.0)))
    if 12 * nside * nside != npix:
        raise ValueError(f"{npix} is not a valid healpix size")
    return nside


# ---------------------------------------------------------------------------
# RING geometry
# ---------------------------------------------------------------------------

def ring_info(nside: int):
    """Iso-latitude ring decomposition of RING ordering.

    :return: list of (start_index, nph, theta, phi0) per ring, north to south.
    """
    rings = []
    start = 0
    # north polar cap: rings i = 1..nside-1, nph = 4i
    for i in range(1, nside):
        nph = 4 * i
        z = 1.0 - i * i / (3.0 * nside * nside)
        rings.append((start, nph, np.arccos(z), np.pi / nph))
        start += nph
    # equatorial belt: rings i = nside..3*nside, nph = 4*nside
    for i in range(nside, 3 * nside + 1):
        nph = 4 * nside
        z = 4.0 / 3.0 - 2.0 * i / (3.0 * nside)
        s = (i - nside + 1) % 2  # phase alternates
        rings.append((start, nph, np.arccos(z), s * np.pi / nph))
        start += nph
    # south polar cap
    for i in range(nside - 1, 0, -1):
        nph = 4 * i
        z = -(1.0 - i * i / (3.0 * nside * nside))
        rings.append((start, nph, np.arccos(z), np.pi / nph))
        start += nph
    return rings


def _nest2ring_single(nside, ipnest):
    """NESTED -> RING index for one pixel (standard bit-deinterleave)."""
    npface = nside * nside
    face = ipnest // npface
    ipf = ipnest % npface
    # deinterleave bits of ipf into x (even bits) and y (odd bits)
    x = y = 0
    bit = 0
    while ipf:
        x |= (ipf & 1) << bit
        ipf >>= 1
        y |= (ipf & 1) << bit
        ipf >>= 1
        bit += 1
    jrt = x + y
    jpt = x - y
    # face row/column offsets
    jrll = [2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4]
    jpll = [1, 3, 5, 7, 0, 2, 4, 6, 1, 3, 5, 7]
    jr = jrll[face] * nside - jrt - 1  # ring number counted from north
    if jr < nside:  # north cap
        nr = jr
        kshift = 0
        n_before = 2 * nr * (nr - 1)
    elif jr > 3 * nside:  # south cap
        nr = 4 * nside - jr
        kshift = 0
        n_before = 12 * nside * nside - 2 * nr * (nr + 1)
    else:  # equatorial
        nr = nside
        kshift = (jr - nside) & 1
        n_before = 2 * nside * (nside - 1) + (jr - nside) * 4 * nside
    jp = (jpll[face] * nr + jpt + 1 + kshift) // 2
    nphr = 4 * nr if jr < nside or jr > 3 * nside else 4 * nside
    if jp > nphr:
        jp -= nphr
    if jp < 1:
        jp += nphr
    return n_before + jp - 1


def nest2ring_index(nside: int) -> np.ndarray:
    """RING position of each NESTED index: ring_map = nested_map[ring2nest]...
    returns array ix such that m_ring[ix[p]] = m_nest[p] inverted for use as
    ``m_ring = m_nest[argsort]``; here we return the gather giving
    ``m_ring[i] = m_nest[inv[i]]``."""
    npix = 12 * nside * nside
    ring_of_nest = np.fromiter(
        (_nest2ring_single(nside, p) for p in range(npix)), dtype=np.int64, count=npix
    )
    inv = np.empty(npix, dtype=np.int64)
    inv[ring_of_nest] = np.arange(npix)
    return inv


# ---------------------------------------------------------------------------
# Harmonic analysis / synthesis
# ---------------------------------------------------------------------------

def _ring_fourier(m_ring, rings, L):
    """Per-ring Fourier coefficients F[r, m] for m = 0..L-1 with phase offset."""
    nrings = len(rings)
    F = np.zeros((nrings, L), dtype=complex)
    ms = np.arange(L)
    for r, (start, nph, _theta, phi0) in enumerate(rings):
        vals = m_ring[start : start + nph]
        fk = np.fft.fft(vals)  # k = 0..nph-1
        # F_m = sum_p f_p e^{-im phi_p}, phi_p = phi0 + 2 pi p / nph
        # = e^{-i m phi0} * fft_k with k = m mod nph
        k = ms % nph
        F[r] = fk[k] * np.exp(-1j * ms * phi0)
        # aliasing: if m >= nph the fft coefficient repeats; fine for m < L << 4nside
    return F


def map2alm(m_ring, L, niter: int = 3):
    """Approximate spherical harmonic analysis of a RING healpix map.

    Equal-area quadrature (Omega = 4pi/npix) with ``niter`` Jacobi
    refinements (the same scheme healpy's map2alm uses).  Accurate to ~1e-5
    relative for L <= 2*nside and smooth maps.

    :return: flm (L^2,) complex, conjugate-symmetric, our layout
    """
    m_ring = np.asarray(m_ring, dtype=np.float64)
    nside = npix_to_nside(m_ring.size)
    rings = ring_info(nside)
    thetas = np.array([r[2] for r in rings])
    lam = spin_lambda_table(L, 0, thetas)  # (2L-1, nrings, L)
    lam_pos = lam[L - 1 :]  # m >= 0: (L, nrings, L)
    omega = 4.0 * np.pi / m_ring.size

    def analysis(mm):
        F = _ring_fourier(mm, rings, L)  # (nrings, L(m))
        # alm[m, l] = omega * sum_r lam[m, r, l] * F[r, m]
        G = np.einsum("mrl,rm->ml", lam_pos, F) * omega
        flm = np.zeros(L * L, dtype=complex)
        for el in range(L):
            for mi in range(el + 1):
                flm[el * el + el + mi] = G[mi, el]
                if mi:
                    flm[el * el + el - mi] = (-1) ** mi * np.conj(G[mi, el])
        return flm

    def synthesis(flm):
        return alm2map(flm, nside)

    flm = analysis(m_ring)
    for _ in range(niter):
        resid = m_ring - synthesis(flm)
        flm = flm + analysis(resid)
    return flm


def alm2map(flm, nside: int):
    """Spherical harmonic synthesis onto a RING healpix map (exact)."""
    flm = np.asarray(flm, dtype=complex)
    L = int(round(np.sqrt(flm.size)))
    rings = ring_info(nside)
    thetas = np.array([r[2] for r in rings])
    lam = spin_lambda_table(L, 0, thetas)
    lam_pos = lam[L - 1 :]  # (L(m), nrings, L(l))
    # half-spectrum G[m, l]
    G = np.zeros((L, L), dtype=complex)
    for el in range(L):
        for mi in range(el + 1):
            G[mi, el] = flm[el * el + el + mi]
    T = np.einsum("mrl,ml->rm", lam_pos, G)  # (nrings, L(m))
    out = np.empty(12 * nside * nside, dtype=np.float64)
    ms = np.arange(L)
    for r, (start, nph, _theta, phi0) in enumerate(rings):
        phase = T[r] * np.exp(1j * ms * phi0)
        # f_p = Re( T0 + 2 sum_{m>0} T_m e^{i m phi_p} ) via inverse fft bins
        buf = np.zeros(nph, dtype=complex)
        for mi in range(L):
            k = mi % nph
            buf[k] += phase[mi]
        vals = np.fft.ifft(buf) * nph
        ring_vals = vals.real
        if L > 1:
            # add the conjugate (negative m) half
            buf2 = np.zeros(nph, dtype=complex)
            for mi in range(1, L):
                k = (-mi) % nph
                buf2[k] += np.conj(phase[mi])
            ring_vals = (vals + np.fft.ifft(buf2) * nph).real
        out[start : start + nph] = ring_vals
    return out

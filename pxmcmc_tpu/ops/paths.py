r"""Great-circle path matrices for surface-wave tomography.

Replacement for the ``greatcirclepaths`` package the reference's phasevel
experiment uses (`/root/reference/experiments/phasevel/main.py:41-59`) — a
host-side precompute producing the (npaths, npix) measurement matrix; the hot
path at sample time is only the dense matvec (TPU MXU).

Each row is the "average" weighting of the minor great-circle arc between two
points: dense samples along the arc are binned into MW pixels and normalised
so the row sums to one (the datum is then a path-averaged velocity).

A C++/OpenMP implementation of the inner loop lives in
:mod:`pxmcmc_tpu.native`; this numpy version is the always-available fallback
and the correctness oracle.
"""
from __future__ import annotations

import numpy as np

from . import sampling


def _latlon_to_unit(lat_deg, lon_deg):
    lat = np.radians(lat_deg)
    lon = np.radians(lon_deg)
    return np.array(
        [np.cos(lat) * np.cos(lon), np.cos(lat) * np.sin(lon), np.sin(lat)]
    )


def _pixel_index(theta, phi, L):
    """Nearest MW pixel (flat index) of colatitude/longitude arrays."""
    t_idx = np.clip(
        np.round((theta * (2 * L - 1) / np.pi - 1) / 2), 0, L - 1
    ).astype(int)
    p_idx = np.mod(np.round(phi * (2 * L - 1) / (2 * np.pi)), 2 * L - 1).astype(int)
    return t_idx * (2 * L - 1) + p_idx


def great_circle_path(start, stop, L, points_per_rad=160):
    """Weight vector over MW pixels for one great-circle path.

    :param start: (lat, lon) in degrees
    :param stop: (lat, lon) in degrees
    :param L: bandlimit of the MW grid
    :return: (L(2L-1),) row that sums to 1 ("average" weighting)
    """
    a = _latlon_to_unit(*start)
    b = _latlon_to_unit(*stop)
    dot = np.clip(a @ b, -1.0, 1.0)
    alpha = np.arccos(dot)  # arc length
    npts = max(int(np.ceil(points_per_rad * alpha)), 2)
    t = np.linspace(0.0, 1.0, npts)
    sa = np.sin((1 - t) * alpha)
    sb = np.sin(t * alpha)
    denom = np.sin(alpha) if alpha > 1e-12 else 1.0
    pts = (a[:, None] * sa + b[:, None] * sb) / denom  # (3, npts) slerp
    pts /= np.linalg.norm(pts, axis=0, keepdims=True)
    theta = np.arccos(np.clip(pts[2], -1.0, 1.0))
    phi = np.mod(np.arctan2(pts[1], pts[0]), 2 * np.pi)
    idx = _pixel_index(theta, phi, L)
    row = np.bincount(idx, minlength=sampling.sample_length(L)).astype(float)
    return row / npts


def build_path_matrix(starts, stops, L, points_per_rad=160, use_native=True):
    """(npaths, npix) matrix of great-circle rows.

    Uses the C++/OpenMP kernel from :mod:`pxmcmc_tpu.native` when built,
    falling back to numpy.
    """
    starts = np.atleast_2d(np.asarray(starts, dtype=float))
    stops = np.atleast_2d(np.asarray(stops, dtype=float))
    if use_native:
        try:
            from ..native import path_matrix_native

            return path_matrix_native(starts, stops, L, points_per_rad)
        except Exception:
            pass
    rows = [
        great_circle_path(s, e, L, points_per_rad) for s, e in zip(starts, stops)
    ]
    return np.stack(rows)

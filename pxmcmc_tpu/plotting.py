r"""Plotting of MW spherical maps and chain evolution.

Parity with ``/root/reference/pxmcmc/plotting.py``; the Mollweide projection
the reference gets from ``pyssht.mollweide_projection`` is implemented here
directly (inverse Mollweide rasterisation + nearest-MW-pixel lookup), and
spectrum oversampling uses our own SHT.  healpy's ``mollview`` and cartopy
coastlines are host-side visual extras and are gated on availability.
"""
from __future__ import annotations

import copy

import numpy as np

try:  # pragma: no cover
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MPL = True
except Exception:  # pragma: no cover
    HAVE_MPL = False

from .ops import sht
from .ops.wavelets import multires_bandlimits
from .ops.sampling import sample_length, sample_shape
from .ops import wavelets as _wavelets


def mollweide_projection(f, L, resolution=500):
    """Rasterise an MW map onto a Mollweide-projected image.

    Replacement for ``pyssht.mollweide_projection`` (used at
    ``/root/reference/pxmcmc/plotting.py:63``).  Returns (image, mask) where
    points outside the projection ellipse are NaN.
    """
    f = np.asarray(f).reshape(sample_shape(L))
    ny = resolution
    nx = 2 * resolution
    ys = np.linspace(-np.sqrt(2), np.sqrt(2), ny)
    xs = np.linspace(-2 * np.sqrt(2), 2 * np.sqrt(2), nx)
    X, Y = np.meshgrid(xs, ys)
    with np.errstate(invalid="ignore"):
        t = np.arcsin(Y / np.sqrt(2))
        lat = np.arcsin((2 * t + np.sin(2 * t)) / np.pi)
        lon = np.pi * X / (2 * np.sqrt(2) * np.cos(t))
    valid = np.abs(lon) <= np.pi
    theta = np.pi / 2 - lat  # colatitude
    phi = np.mod(lon + 2 * np.pi, 2 * np.pi)
    t_idx = np.clip(np.round((theta * (2 * L - 1) / np.pi - 1) / 2), 0, L - 1).astype(int)
    p_idx = np.mod(np.round(phi * (2 * L - 1) / (2 * np.pi)), 2 * L - 1).astype(int)
    img = np.full((ny, nx), np.nan)
    img[valid] = f.real[t_idx[valid], p_idx[valid]]
    return img, ~valid


def _mollweide_forward(lat_deg, lon_deg):
    """Forward Mollweide projection (lat, lon) degrees -> (x, y).

    Newton iteration on 2t + sin 2t = pi sin(lat); inverse of the map in
    :func:`mollweide_projection`.
    """
    lat = np.radians(np.asarray(lat_deg, dtype=float))
    lon = np.radians(np.asarray(lon_deg, dtype=float))
    t = lat.copy()
    for _ in range(8):
        f = 2 * t + np.sin(2 * t) - np.pi * np.sin(lat)
        t = t - f / np.maximum(2 + 2 * np.cos(2 * t), 1e-9)
    x = 2 * np.sqrt(2) / np.pi * lon * np.cos(t)
    y = np.sqrt(2) * np.sin(t)
    return x, y


def _coastline_pixels(resolution=500):
    """Bundled coastline polyline in the image pixel coordinates of
    :func:`mollweide_projection` (NaN rows break segments).

    The polyline is the elevation-0 contour of the bandlimited ETOPO1
    topography (see ``scripts/make_coastlines.py``) — a cartopy-free
    replacement for the reference's coastlines overlay
    (`/root/reference/pxmcmc/plotting.py:79-83`).
    """
    import os

    path = os.path.join(os.path.dirname(__file__), "data", "coastlines.npz")
    with np.load(path) as z:
        lonlat = z["lonlat"]
    x, y = _mollweide_forward(lonlat[:, 1], lonlat[:, 0])
    ny, nx = resolution, 2 * resolution
    px = (x + 2 * np.sqrt(2)) / (4 * np.sqrt(2)) * (nx - 1)
    py = (y + np.sqrt(2)) / (2 * np.sqrt(2)) * (ny - 1)
    # break segments that wrap around the +-180 degree seam
    jump = np.abs(np.diff(px, prepend=px[:1])) > nx / 4
    px[jump] = np.nan
    return px, py


def _oversample(f, L=256):
    """Zero-pad the spectrum to bandlimit L (ref ``plotting.py:189-193``)."""
    f = np.asarray(f)
    L_in = f.shape[0]
    basis_in = sht.get_basis(L_in, 0)
    flm = np.asarray(sht.forward(f.astype(complex), basis_in))
    flm_pad = np.concatenate([flm, np.zeros(L * L - L_in * L_in, dtype=flm.dtype)])
    basis_out = sht.get_basis(L, 0)
    return np.asarray(sht.inverse(flm_pad, basis_out)).real


def plot_map(
    f,
    title=None,
    cbar=True,
    cmap="turbo",
    vmin=None,
    vmax=None,
    cbar_label="",
    oversample=True,
    centre0=False,
    coasts=False,
    mask=None,
):
    """Plot a single MW map in Mollweide projection (ref ``plotting.py:17-84``)."""
    if not HAVE_MPL:
        raise RuntimeError("matplotlib unavailable")
    cmap = copy.copy(plt.get_cmap(cmap))
    cmap.set_bad(alpha=0)
    f = np.asarray(f).real

    if oversample and f.shape[0] < 256:
        L = 256
        f = _oversample(f, L)
    else:
        L = f.shape[0]

    if centre0:
        cbar_end = max(f.max(), abs(f.min()))
        vmax, vmin = cbar_end, -cbar_end

    f = f.copy()
    if mask is not None:
        f[np.asarray(mask, dtype=bool)] = np.nan
    f_plt, _ = mollweide_projection(f, L)
    fig = plt.figure(figsize=(20, 10))
    if not cbar:
        ax = fig.add_subplot(1, 1, 1)
        ax.imshow(f_plt, origin="lower", cmap=cmap, vmin=vmin, vmax=vmax)
    else:
        gs = fig.add_gridspec(nrows=1, ncols=2, width_ratios=[40, 1], wspace=0.05)
        ax = fig.add_subplot(gs[:, :-1])
        cax = fig.add_subplot(gs[:, -1])
        im = ax.imshow(f_plt, origin="lower", cmap=cmap, vmin=vmin, vmax=vmax)
        cb = fig.colorbar(im, cax=cax)
        cb.set_label(cbar_label, fontsize=24)
        cb.ax.tick_params(labelsize="xx-large")
    ax.axis("off")
    ax.set_title(title, fontsize=24)
    if coasts:
        # bundled ETOPO1 zero-contour coastline in the same projection —
        # no cartopy dependency (ref plotting.py:79-83 uses cartopy)
        px, py = _coastline_pixels()
        ax.plot(px, py, color="k", linewidth=1.2)
    return fig


def plot_wavelet_maps(f, L, B, J_min, dirs=1, spin=0, same_scale=True, **map_args):
    """Per-scale wavelet maps of an MW image (ref ``plotting.py:87-125``)."""
    import jax.numpy as jnp

    bls = multires_bandlimits(L, B, J_min, dirs, spin)
    wb = _wavelets.get_wavelet_basis(L, B, J_min, spin=spin)
    coefs = np.asarray(_wavelets.analysis(jnp.asarray(np.asarray(f).flatten()), wb))
    figs = []
    base_title = map_args.pop("title", "")
    nscal = sample_length(int(bls[0]))
    figs.append(
        plot_map(
            coefs[:nscal].real.reshape(sample_shape(int(bls[0]))),
            title=f"{base_title} Scaling function",
            **map_args,
        )
    )
    if same_scale:
        map_args["vmax"] = coefs[nscal:].real.max()
    start = nscal
    for i, bl in enumerate(bls[1:], 1):
        bl = int(bl)
        n = sample_length(bl)
        figs.append(
            plot_map(
                coefs[start : start + n].real.reshape(sample_shape(bl)),
                title=f"{base_title} Wavelet scale {i}",
                **map_args,
            )
        )
        start += n
    return figs


def plot_evolution(logposteriors, L2s, L1s, figsize=(10, 8)):
    """Chain-evolution three-panel plot (ref ``plotting.py:139-169``)."""
    if not HAVE_MPL:
        raise RuntimeError("matplotlib unavailable")
    logposteriors = np.asarray(logposteriors).ravel()
    L2s, L1s = np.asarray(L2s).ravel(), np.asarray(L1s).ravel()
    MAP_idx = int(np.argmax(logposteriors))
    fig = plt.figure(figsize=figsize)
    for i, (series, label) in enumerate(
        [(-logposteriors, "-log(posterior)"), (L2s, "L2"), (L1s, "L1")], 1
    ):
        plt.subplot(3, 1, i)
        plt.plot(series)
        plt.axvline(MAP_idx, linestyle="--", c="r")
        # log scale like the reference (plotting.py:155) when possible;
        # symlog keeps the plot valid when values cross zero
        finite = series[np.isfinite(series)]
        plt.yscale("log" if finite.size and (finite > 0).all() else "symlog")
        plt.ylabel(label)
    return fig


def plot_chain_sample(X, figsize=(10, 8)):
    """Real/imaginary parts of one sample (ref ``plotting.py:172-186``)."""
    if not HAVE_MPL:
        raise RuntimeError("matplotlib unavailable")
    X = np.asarray(X)
    fig = plt.figure(figsize=figsize)
    plt.subplot(2, 1, 1)
    plt.plot(X.real)
    plt.subplot(2, 1, 2)
    plt.plot(X.imag)
    return fig


def mollview(image, figsize=(10, 8), **kwargs):  # pragma: no cover
    """healpy mollview wrapper (ref ``plotting.py:128-136``); needs healpy."""
    import healpy as hp

    i = np.random.randint(1000)
    fig = plt.figure(num=i, figsize=figsize)
    hp.mollview(image, fig=i, **kwargs)
    hp.graticule(30)
    return fig

"""Generate the bundled coastline polyline (pxmcmc_tpu/data/coastlines.npz).

The reference overlays coastlines via cartopy
(`/root/reference/pxmcmc/plotting.py:79-83`), which is not a dependency of
this package.  Instead we derive the coastline once from the ETOPO1
topography used by the earthtopography experiment: bandlimit to L=128 on MW
sampling, contour at elevation 0, store the (lat, lon) vertices (NaN row
breaks between segments) compressed.  ~100 KB; ``plotting.plot_map(
coasts=True)`` projects it with the package's own Mollweide forward map.

Usage:  python scripts/make_coastlines.py /path/to/ETOPO1_Ice_hpx_256.fits
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pxmcmc_tpu.ops import healpix, sht
from pxmcmc_tpu.ops.sampling import sample_positions


def main(fits_path, L=128, out=None):
    out = out or os.path.join(
        os.path.dirname(__file__), os.pardir, "pxmcmc_tpu", "data", "coastlines.npz"
    )
    topo_hp, _nside = healpix.read_healpix_fits(fits_path)
    alm = healpix.map2alm(topo_hp, L)
    basis = sht.get_basis(L, 0)
    topo = np.asarray(sht.inverse_real(jnp.asarray(alm), basis))
    thetas, phis = sample_positions(L)
    lats = np.degrees(np.pi / 2 - thetas)
    lons = np.degrees(phis)
    lons = np.where(lons > 180.0, lons - 360.0, lons)
    order = np.argsort(lons)
    cs = plt.contour(lons[order], lats, topo[:, order], levels=[0.0])
    verts = []
    from matplotlib.path import Path as MplPath

    for path in cs.get_paths():
        # a contour Path holds many disconnected polylines (MOVETO codes);
        # split on them or spurious chords join unrelated coastlines
        v, codes = path.vertices, path.codes
        starts = (
            np.nonzero(codes == MplPath.MOVETO)[0]
            if codes is not None else np.array([0])
        )
        bounds = list(starts) + [v.shape[0]]
        for a, b in zip(bounds[:-1], bounds[1:]):
            seg = v[a:b]
            if seg.shape[0] < 8:  # drop specks
                continue
            verts.append(seg)
            verts.append(np.full((1, 2), np.nan))
    allv = np.concatenate(verts).astype(np.float32)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, lonlat=allv)
    print(f"{allv.shape[0]} vertices -> {out} ({os.path.getsize(out)/1024:.0f} KB)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "/root/reference/experiments/earthtopography/ETOPO1_Ice_hpx_256.fits")

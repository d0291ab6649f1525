"""Download and convert a Takahashi et al. (2017) full-sky weak-lensing
convergence map for the weaklensing experiment.

Port of ``/root/reference/experiments/weaklensing/download_takahasi.py``:
fetches one allskymap realisation from the public Takahashi HSC simulation
archive and converts the Fortran-chunked binary format (documented by the
archive's public read.py) to a healpix fits map (requires healpy) or .npy.

Usage:
    python download_takahasi.py --nres 12 --r 0 --zs 16
"""
import argparse
import os
import sys
import urllib.request

import numpy as np

# Fortran unformatted stream chunk boundaries of the archive format
_SKIP = [0, 536870908, 1073741818, 1610612728, 2147483638, 2684354547, 3221225457]
_LOAD_BLOCKS = [_SKIP[i + 1] - _SKIP[i] for i in range(6)]


def download(nres, r, zs, outpath):
    url = (
        "http://cosmo.phys.hirosaki-u.ac.jp/takahasi/allsky_raytracing/"
        f"sub1/nres{nres}/allskymap_nres{nres}r{r:03d}.zs{zs}.mag.dat"
    )
    print(f"downloading {url}")
    urllib.request.urlretrieve(url, outpath)
    return outpath


def _read_field(f, npix):
    """One healpix field: float32 chunks separated by 2 uint32 record marks."""
    parts = []
    remaining = npix
    for i, block in enumerate(_LOAD_BLOCKS):
        n = min(block, remaining)
        parts.append(np.fromfile(f, dtype="float32", count=n))
        np.fromfile(f, dtype="uint32", count=2)
        remaining -= n
        if remaining == 0:
            break
        if remaining > 0 and i == len(_LOAD_BLOCKS) - 1:
            parts.append(np.fromfile(f, dtype="float32", count=remaining))
            np.fromfile(f, dtype="uint32", count=2)
    return np.concatenate(parts)


def read_maps(path, fields=("kappa",)):
    """Read (kappa[, gamma1, gamma2, omega]) healpix maps from the binary."""
    all_fields = ["kappa", "gamma1", "gamma2", "omega"]
    with open(path, "rb") as f:
        np.fromfile(f, dtype="uint32", count=1)
        nside = int(np.fromfile(f, dtype="int32", count=1)[0])
        npix = int(np.fromfile(f, dtype="int64", count=1)[0])
        np.fromfile(f, dtype="uint32", count=2)
        print(f"nside:{nside} npix:{npix}")
        out = {}
        for name in all_fields:
            data = _read_field(f, npix)
            if name in fields:
                out[name] = data
            if set(out) == set(fields):
                break
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nres", type=int, default=12, choices=[12, 13, 14])
    ap.add_argument("--r", type=int, default=0, help="realisation (0..107)")
    ap.add_argument("--zs", type=int, default=16, help="source redshift id (1..66)")
    ap.add_argument("--outfile", type=str, default=None)
    ap.add_argument("--keep_raw", action="store_true")
    args = ap.parse_args()

    raw = f"allskymap_nres{args.nres}r{args.r:03d}.zs{args.zs}.mag.dat"
    outfile = args.outfile or (
        f"takahasi_{2 ** args.nres}_{args.r:03d}_zs{args.zs}_kappa.fits"
    )
    if os.path.exists(outfile):
        print(f"{outfile} already found!")
        return
    if not os.path.exists(raw):
        download(args.nres, args.r, args.zs, raw)
    kappa = read_maps(raw)["kappa"]

    if outfile.endswith(".npy"):
        np.save(outfile, kappa)
    else:
        try:
            import healpy as hp
        except ModuleNotFoundError:
            print("healpy unavailable; writing .npy instead")
            np.save(outfile + ".npy", kappa)
            sys.exit(0)
        hp.write_map(outfile, kappa, overwrite=True)
    if not args.keep_raw:
        os.remove(raw)
    print(f"wrote {outfile}")


if __name__ == "__main__":
    main()

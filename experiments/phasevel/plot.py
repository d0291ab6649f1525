"""Summary plots for phasevel runs.

Port of ``/root/reference/experiments/phasevel/plot.py``: evolution, MAP and
mean maps (centre-zero seismic colormap), overall and per-wavelet-scale
credible-interval maps, SNR and relative-squared-error prints.
"""
import argparse
import os
import sys

import numpy as np
from scipy import sparse

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from pxmcmc_tpu.config import to_device, to_host
from pxmcmc_tpu import plotting, uncertainty
from pxmcmc_tpu.measurements import PathIntegral
from pxmcmc_tpu.ops.sampling import sample_shape
from pxmcmc_tpu.saving import load_mcmc
from pxmcmc_tpu.transforms import SphericalWaveletTransform
from pxmcmc_tpu.utils import norm, snr

parser = argparse.ArgumentParser()
parser.add_argument("datafile", type=str)
parser.add_argument("directory", type=str)
parser.add_argument("--suffix", type=str, default="")
parser.add_argument("--burn", type=int, default=0)
parser.add_argument("--save_npy", action="store_true")
parser.add_argument("--truthfile", type=str, default=None,
                    help=".npy MW map of the ground truth (optional)")
parser.add_argument("--infile", type=str, default="synthetic_GDM40_0S254_L28.txt")
parser.add_argument("--pathsfile", type=str, default="0S254L28.npz")
args = parser.parse_args()


def filename(name, ext="png"):
    return f"{args.directory}/{name}{args.suffix}.{ext}"


os.makedirs(args.directory, exist_ok=True)
data, params = load_mcmc(args.datafile)
L, B, J_min = int(params["L"]), float(params["B"]), int(params["J_min"])
setting = params.get("setting", "synthesis")
mw_shape = sample_shape(L)
wvlttrans = SphericalWaveletTransform(L, B, J_min)

logpi = data["logposterior"]
plotting.plot_evolution(logpi, data["L2s"], data["priors"]).savefig(
    filename("evolution")
)

chain = data["chain"]
if chain.ndim == 3:
    logpi = logpi.reshape(-1)
    chain = chain.reshape(-1, chain.shape[-1])
MAP_idx = int(np.argmax(logpi))
MAP_X = chain[MAP_idx]
MAP = (
    to_host(wvlttrans.inverse(MAP_X)).real
    if setting == "synthesis"
    else MAP_X.real
).reshape(mw_shape)
plotting.plot_map(MAP, title="Maximum a posteriori solution",
                  cmap="seismic_r", centre0=True).savefig(filename("MAP"))

samples = chain[args.burn:]
chain_pix = (
    to_host(wvlttrans.inverse(samples)).real
    if setting == "synthesis"
    else samples.real
)

alpha = 0.01
quantiles = np.quantile(chain_pix, (alpha / 2, 1 - alpha / 2), axis=0)
ci_range = np.diff(quantiles, axis=0)[0].reshape(mw_shape)
plotting.plot_map(ci_range, title="95% credible interval range",
                  cmap="viridis", vmin=0).savefig(filename("ci_map"))

wav_ci_ranges = uncertainty.wavelet_credible_interval_range(
    samples.real, L, B, J_min
)
vmax = max(np.max(w) for w in wav_ci_ranges)
for i, wav_ci_range in enumerate(wav_ci_ranges):
    title = "95% credible interval range " + (
        "Scaling function" if i == 0 else f"Wavelet scale {i}"
    )
    plotting.plot_map(wav_ci_range, title=title, cmap="viridis",
                      vmin=0, vmax=vmax).savefig(filename(f"ci_map_scale{i}"))

mean = chain_pix.mean(axis=0).reshape(mw_shape)
plotting.plot_map(mean, title="Mean solution", cmap="seismic_r",
                  centre0=True).savefig(filename("mean"))
for i, fig in enumerate(
    plotting.plot_wavelet_maps(mean, L, B, J_min, title="Mean solution",
                               cmap="seismic_r", centre0=True)
):
    fig.savefig(filename(f"mean_scale{i}"))

if args.truthfile and os.path.exists(args.truthfile):
    truth = np.load(args.truthfile).reshape(mw_shape)
    diff, diff_mean = truth - MAP, truth - mean
    print(f"MAP SNR: {float(snr(truth, diff)):.2f} dB")
    print(f"Mean SNR: {float(snr(truth, diff_mean)):.2f} dB")

if os.path.exists(args.pathsfile) and os.path.exists(args.infile):
    pathint = PathIntegral(sparse.load_npz(args.pathsfile))
    data_obs = np.loadtxt(args.infile)[:, 4]
    for name, m in [("MAP", MAP), ("Mean", mean)]:
        preds = to_host(pathint.forward(to_device(m.flatten())))
        r2e = (float(norm(preds - data_obs)) / float(norm(data_obs))) ** 2
        print(f"{name} R2E: {r2e:.2e}")

if args.save_npy:
    np.save(filename("mean", "npy"), mean)
    np.save(filename("MAP", "npy"), MAP)
    np.save(filename("CI", "npy"), ci_range)

print(f"Filename: {args.datafile}")
for attr, val in params.items():
    print(f"{attr}: {val}")

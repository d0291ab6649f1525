"""Summary plots for weaklensing runs.

Port of ``/root/reference/experiments/weaklensing/plot.py``: evolution,
MAP/mean/CI maps masked to the observed sky, SNR and predictive R2E prints.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from pxmcmc_tpu.config import to_device, to_host
from pxmcmc_tpu import plotting, uncertainty
from pxmcmc_tpu.measurements import WeakLensing
from pxmcmc_tpu.ops.sampling import sample_shape
from pxmcmc_tpu.saving import load_mcmc
from pxmcmc_tpu.transforms import SphericalWaveletTransform
from pxmcmc_tpu.utils import build_mask, norm, snr

parser = argparse.ArgumentParser()
parser.add_argument("datafile", type=str)
parser.add_argument("directory", type=str)
parser.add_argument("--suffix", type=str, default="")
parser.add_argument("--burn", type=int, default=0)
parser.add_argument("--save_npy", action="store_true")
parser.add_argument("--truthfile", type=str, default=None,
                    help=".npy MW kappa ground-truth map (optional)")
args = parser.parse_args()


def filename(name, ext="png"):
    return f"{args.directory}/{name}{args.suffix}.{ext}"


os.makedirs(args.directory, exist_ok=True)
data, params = load_mcmc(args.datafile)
L, B, J_min = int(params["L"]), float(params["B"]), int(params["J_min"])
setting = params.get("setting", "synthesis")
mw_shape = sample_shape(L)
wvlttrans = SphericalWaveletTransform(L, B, J_min)
mask = build_mask(L, size=10).astype(bool)

logpi = data["logposterior"]
plotting.plot_evolution(logpi, data["L2s"], data["priors"]).savefig(
    filename("evolution")
)

def _truth_section(MAP, mean):
    """SNR + predictive R2E against the ground-truth kappa (if given)."""
    if not (args.truthfile and os.path.exists(args.truthfile)):
        return
    truth = np.load(args.truthfile).reshape(mw_shape)
    diff_mean = truth - mean
    plotting.plot_map(np.abs(diff_mean), title="|True - mean|", cmap="binary",
                      vmin=0).savefig(filename("diffmean"))
    if MAP is not None:
        print(f"MAP SNR: {float(snr(truth[mask], (truth - MAP)[mask])):.2f} dB")
    print(f"Mean SNR: {float(snr(truth[mask], diff_mean[mask])):.2f} dB")
    wl = WeakLensing(L, mask)
    data_obs = to_host(wl.forward(to_device(truth.flatten())))
    rows = [("Mean", mean)] + ([("MAP", MAP)] if MAP is not None else [])
    for name, m in rows:
        preds = to_host(wl.forward(to_device(m.flatten())))
        r2e = (float(norm(preds - data_obs)) / float(norm(data_obs))) ** 2
        print(f"{name} R2E: {r2e:.2e}")


if "chain" not in data:
    # track='summary' production run: streamed pixel products, no chain
    mean = None
    if "posterior_mean_pix" in data:
        mean = np.asarray(data["posterior_mean_pix"]).real.reshape(mw_shape)
    elif "posterior_mean" in data:
        pm = np.asarray(data["posterior_mean"])
        pm = pm.mean(axis=0) if pm.ndim == 2 else pm
        mean = (
            to_host(wvlttrans.inverse(pm)).real if setting == "synthesis"
            else pm.real
        ).reshape(mw_shape)
    if mean is not None:
        plotting.plot_map(mean, title="Mean solution", cmap="cividis").savefig(
            filename("mean"))
    if "ci_range_pix" in data:
        ci_range = np.asarray(data["ci_range_pix"]).reshape(mw_shape)
        plotting.plot_map(ci_range, title="95% credible interval range",
                          cmap="viridis", vmin=0).savefig(filename("ci_map"))
    MAP = None
    if "MAP" in data:
        MAP_X = np.asarray(data["MAP"])
        MAP = (
            to_host(wvlttrans.inverse(MAP_X)).real
            if setting == "synthesis" else MAP_X.real
        ).reshape(mw_shape)
        plotting.plot_map(MAP, title="Maximum a posteriori solution",
                          cmap="cividis").savefig(filename("MAP"))
    if mean is not None:
        _truth_section(MAP, mean)
    if args.save_npy:
        if mean is not None:
            np.save(filename("mean", "npy"), mean)
        if "ci_range_pix" in data:
            np.save(filename("CI", "npy"), ci_range)
        if MAP is not None:
            np.save(filename("MAP", "npy"), MAP)
    sys.exit(0)

chain = data["chain"]
if chain.ndim == 3:
    logpi = logpi.reshape(-1)
    chain = chain.reshape(-1, chain.shape[-1])
MAP_idx = int(np.argmax(logpi))
MAP_X = chain[MAP_idx]
if setting == "synthesis":
    MAP = to_host(wvlttrans.inverse(MAP_X)).real
    MAP_wvlt = np.copy(MAP_X)
else:
    MAP = MAP_X.real
    MAP_wvlt = to_host(wvlttrans.forward(to_device(MAP_X)))
MAP = MAP.reshape(mw_shape)
plotting.plot_map(MAP, title="Maximum a posteriori solution",
                  cmap="cividis").savefig(filename("MAP"))
plotting.plot_chain_sample(MAP_wvlt).savefig(filename("MAP_wvlt"))

samples = chain[args.burn:]
chain_pix = (
    to_host(wvlttrans.inverse(samples)).real
    if setting == "synthesis"
    else samples.real
)

ci_range = uncertainty.credible_interval_range(chain_pix).reshape(mw_shape)
plotting.plot_map(ci_range, title="95% credible interval range",
                  cmap="viridis", vmin=0).savefig(filename("ci_map"))

mean = chain_pix.mean(axis=0).reshape(mw_shape)
plotting.plot_map(mean, title="Mean solution", cmap="cividis").savefig(
    filename("mean")
)

_truth_section(MAP, mean)

if args.save_npy:
    np.save(filename("mean", "npy"), mean)
    np.save(filename("MAP", "npy"), MAP)
    np.save(filename("CI", "npy"), ci_range)

print(f"Filename: {args.datafile}")
for attr, val in params.items():
    print(f"{attr}: {val}")

"""Summary plots for earthtopography runs.

Port of ``/root/reference/experiments/earthtopography/plot.py``: evolution,
truth/MAP/mean/diff maps, credible-interval map, SNR prints.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from pxmcmc_tpu.config import to_device, to_host
from pxmcmc_tpu import plotting, uncertainty
from pxmcmc_tpu.ops.sampling import sample_length, sample_shape
from pxmcmc_tpu.saving import load_mcmc
from pxmcmc_tpu.transforms import SphericalWaveletTransform
from pxmcmc_tpu.utils import snr

from main import load_topo  # noqa: E402  (same-directory import, as in reference)

parser = argparse.ArgumentParser()
parser.add_argument("datafile", type=str, help=".hdf5 results file")
parser.add_argument("directory", type=str, help="directory for plots")
parser.add_argument("--suffix", type=str, default="")
parser.add_argument("--burn", type=int, default=0)
parser.add_argument("--save_npy", action="store_true")
parser.add_argument("--infile", type=str, default="ETOPO1_Ice_hpx_256.fits",
                    help="original input data (synthetic fallback if missing)")
args = parser.parse_args()


def filename(name, ext="png"):
    return f"{args.directory}/{name}{args.suffix}.{ext}"


os.makedirs(args.directory, exist_ok=True)
data, params = load_mcmc(args.datafile)
# big run metadata spills from attrs to datasets (saving.py); read either
_noise = params["noise"] if "noise" in params else data.get("noise")
L, B, J_min = int(params["L"]), float(params["B"]), int(params["J_min"])
setting = params.get("setting", "synthesis")
mw_shape = sample_shape(L)
wvlttrans = SphericalWaveletTransform(L, B, J_min)

logpi = data["logposterior"]
evo = plotting.plot_evolution(logpi, data["L2s"], data["priors"])
evo.savefig(filename("evolution"))

truth = load_topo(args.infile, L).reshape(mw_shape) / 1000
plotting.plot_map(truth, title="Truth").savefig(filename("truth"))

if "chain" not in data:
    # track='summary' run: no stored chain.  The streamed products carry
    # everything the chain branch below derives:
    #   - posterior mean map: pixel summary if tracked, else the synthesis
    #     of the coefficient mean (mean commutes with the linear synthesis)
    #   - CI-range map: pixel-space P^2 sketches ('summary_pixel' track)
    #   - MAP map + SNR: running device-side argmax ('map' track)
    mean = diff_mean = None
    if "posterior_mean_pix" in data:
        mean = np.asarray(data["posterior_mean_pix"]).real.reshape(mw_shape)
    elif "posterior_mean" in data:
        pm = np.asarray(data["posterior_mean"])
        pm = pm.mean(axis=0) if pm.ndim == 2 else pm
        mean = (
            to_host(wvlttrans.inverse(pm)).real if setting == "synthesis" else pm.real
        ).reshape(mw_shape)
    if mean is not None:  # map-only runs carry no summary datasets
        plotting.plot_map(mean, title="Mean solution").savefig(filename("mean"))
        diff_mean = truth - mean
        cbar_end = max(abs(diff_mean.min()), diff_mean.max())
        plotting.plot_map(diff_mean, title="True - mean", cmap="PuOr",
                          vmin=-cbar_end, vmax=cbar_end).savefig(filename("diff_mean"))
    if "ci_range_pix" in data:
        ci_range = np.asarray(data["ci_range_pix"]).reshape(mw_shape)
        plotting.plot_map(ci_range, title="95% credible interval range",
                          cmap="viridis", vmin=0).savefig(filename("ci_map"))
    if "MAP" in data:
        MAP_X = np.asarray(data["MAP"])
        MAP = (
            to_host(wvlttrans.inverse(MAP_X)).real
            if setting == "synthesis" else MAP_X.real
        ).reshape(mw_shape)
        plotting.plot_map(MAP, title="Maximum a posteriori solution").savefig(
            filename("MAP"))
        diff = truth - MAP
        cbar_end = max(abs(diff.min()), diff.max())
        plotting.plot_map(diff, title="True - MAP", cmap="PuOr",
                          vmin=-cbar_end, vmax=cbar_end).savefig(filename("diff"))
        print(f"MAP SNR: {float(snr(truth, diff)):.2f} dB")
    if _noise is not None and np.any(_noise):
        noise = np.asarray(_noise).reshape(mw_shape) / 1000
        plotting.plot_map(noise, title="Added noise", cmap="binary",
                          oversample=False).savefig(filename("noise"))
        print(f"Input SNR: {float(snr(truth, noise)):.2f} dB")
    if diff_mean is not None:
        print(f"Mean SNR: {float(snr(truth, diff_mean)):.2f} dB")
    if args.save_npy:
        if mean is not None:
            np.save(filename("mean", "npy"), mean)
        if "ci_range_pix" in data:
            np.save(filename("CI", "npy"), ci_range)
        if "MAP" in data:
            np.save(filename("MAP", "npy"), MAP)
    sys.exit(0)

chain = data["chain"]
if chain.ndim == 3:  # multi-chain run: fold chains into samples
    logpi = logpi.reshape(-1)
    chain = chain.reshape(-1, chain.shape[-1])
MAP_idx = int(np.argmax(logpi))
MAP_X = chain[MAP_idx]
if setting == "synthesis":
    MAP = to_host(wvlttrans.inverse(MAP_X)).real
    MAP_wvlt = np.copy(MAP_X)
else:
    MAP = np.copy(MAP_X).real
    MAP_wvlt = to_host(wvlttrans.forward(to_device(MAP_X)))
MAP = MAP.reshape(mw_shape)
plotting.plot_map(MAP, title="Maximum a posteriori solution").savefig(filename("MAP"))

diff = truth - MAP
cbar_end = max(abs(diff.min()), diff.max())
plotting.plot_map(diff, title="True - MAP", cmap="PuOr",
                  vmin=-cbar_end, vmax=cbar_end).savefig(filename("diff"))
plotting.plot_chain_sample(MAP_wvlt).savefig(filename("MAP_wvlt"))

samples = chain[args.burn:]
if setting == "synthesis":
    # chunked synthesis: production chains (thousands of samples x 256-chain
    # folds) would blow the single-call working set
    chain_pix = np.concatenate([
        to_host(wvlttrans.inverse(samples[i : i + 256])).real
        for i in range(0, samples.shape[0], 256)
    ])
else:
    chain_pix = samples.real
ci_range = uncertainty.credible_interval_range(chain_pix).reshape(mw_shape)
plotting.plot_map(ci_range, title="95% credible interval range",
                  cmap="viridis", vmin=0).savefig(filename("ci_map"))

mean = chain_pix.mean(axis=0).reshape(mw_shape)
plotting.plot_map(mean, title="Mean solution").savefig(filename("mean"))
diff_mean = truth - mean
cbar_end = max(abs(diff_mean.min()), diff_mean.max())
plotting.plot_map(diff_mean, title="True - mean", cmap="PuOr",
                  vmin=-cbar_end, vmax=cbar_end).savefig(filename("diff_mean"))

if _noise is not None and np.any(_noise):
    noise = np.asarray(_noise).reshape(mw_shape) / 1000
    plotting.plot_map(noise, title="Added noise", cmap="binary",
                      oversample=False).savefig(filename("noise"))
    print(f"Input SNR: {float(snr(truth, noise)):.2f} dB")

print(f"Mean SNR: {float(snr(truth, diff_mean)):.2f} dB")
print(f"MAP SNR: {float(snr(truth, diff)):.2f} dB")

if args.save_npy:
    np.save(filename("mean", "npy"), mean)
    np.save(filename("MAP", "npy"), MAP)
    np.save(filename("CI", "npy"), ci_range)
    np.save(filename("diff", "npy"), diff)
    np.save(filename("diff_mean", "npy"), diff_mean)

print(f"Filename: {args.datafile}")
for attr, val in params.items():
    print(f"{attr}: {val}")

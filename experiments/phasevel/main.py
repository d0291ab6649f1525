"""
Global Rayleigh-wave phase-velocity tomography: inverts path-averaged
measurements for a global phase-velocity map (replicates Marignier et al.
2023, RASTI, doi:10.1093/rasti/rzac010).

TPU-native port of ``/root/reference/experiments/phasevel/main.py`` with the
same CLI surface.  The great-circle path matrix is built by the C++/OpenMP
core in ``pxmcmc_tpu/native`` (numpy fallback) instead of the
greatcirclepaths package + multiprocessing.Pool of the reference
(``main.py:50-59``), and is cached as .npz.  If the input datafile is absent
a synthetic random-path dataset over a synthetic velocity map is generated so
the experiment runs end-to-end.
"""
import argparse
import datetime
import os
import sys
from warnings import warn

import numpy as np
from scipy import sparse

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from pxmcmc_tpu.config import to_device, to_host
from pxmcmc_tpu.forward import PathIntegralOperator
from pxmcmc_tpu.mcmc import MYULA, SKROCK, PxMALA, PxMCMCParams
from pxmcmc_tpu.ops import sht
from pxmcmc_tpu.ops.paths import build_path_matrix
from pxmcmc_tpu.prior import S2_Wavelets_L1_Power_Weights
from pxmcmc_tpu.saving import save_mcmc


def read_datafile(datafile):
    """Columns: start_lat, start_lon, stop_lat, stop_lon, data, error,
    minor/major, n_similar (degrees).  Ref ``phasevel/main.py:23-38``."""
    start_lat, start_lon, stop_lat, stop_lon, data, sig_d, mima, nsim = np.loadtxt(
        datafile, unpack=True
    )
    start = np.stack([start_lat, start_lon], axis=1)
    stop = np.stack([stop_lat, stop_lon], axis=1)
    if np.any(sig_d < 0):
        warn("Some of the data errors read in are negative. Forcing positivity.")
        sig_d = np.abs(sig_d)
    return start, stop, data, sig_d, mima, nsim


def get_path_matrix(start, stop, L=32):
    """Great-circle path matrix = the measurement operator (C++/OpenMP)."""
    return sparse.csr_matrix(build_path_matrix(start, stop, L))


def synthetic_dataset(L, npaths=500, seed=11):
    """Random station pairs over a random bandlimited slowness map."""
    rng = np.random.default_rng(seed)
    start = np.stack([rng.uniform(-85, 85, npaths), rng.uniform(-180, 180, npaths)], 1)
    stop = np.stack([rng.uniform(-85, 85, npaths), rng.uniform(-180, 180, npaths)], 1)
    flm = np.zeros(L * L, dtype=complex)
    for el in range(L):
        amp = 1.0 / (1.0 + el) ** 1.2
        flm[sht.elm2ind(el, 0)] = rng.standard_normal() * amp
        for m in range(1, el + 1):
            a = (rng.standard_normal() + 1j * rng.standard_normal()) * amp
            flm[sht.elm2ind(el, m)] = a
            flm[sht.elm2ind(el, -m)] = (-1) ** m * np.conj(a)
    basis = sht.get_basis(L, 0)
    vel = to_host(sht.inverse(to_device(flm), basis)).real.reshape(-1)
    A = build_path_matrix(start, stop, L)
    sig_d = np.full(npaths, 0.05)
    data = A @ vel + rng.normal(0, sig_d)
    nsim = np.ones(npaths)
    return start, stop, data, sig_d, np.zeros(npaths), nsim, vel


def gdm40_dataset(truth_path, L, npaths=3000, seed=11):
    """Path-averaged data synthesised from the real GDM40 phase-velocity map.

    Mirrors the reference's replication protocol (the shipped
    ``synthetic_GDM40_0S254_L28.txt`` is path data generated from
    ``GDM40_L28.npy``, loaded as the truth at
    ``/root/reference/experiments/phasevel/plot.py:79``): great-circle
    station pairs, path-averaged values of the truth map through the same
    path operator used in the inversion, Gaussian errors, and an n-similar
    count for the ``--nsim`` weighting (``main.py:130-139``).
    """
    rng = np.random.default_rng(seed)
    truth = np.load(truth_path).reshape(-1)  # (L, 2L-1) MW map
    start = np.stack(
        [rng.uniform(-85, 85, npaths), rng.uniform(-180, 180, npaths)], 1
    )
    stop = np.stack(
        [rng.uniform(-85, 85, npaths), rng.uniform(-180, 180, npaths)], 1
    )
    A = build_path_matrix(start, stop, L)
    sig_d = np.full(npaths, 0.05 * np.abs(truth).mean())
    data = A @ truth + rng.normal(0, sig_d)
    # duplicate measurements on similar paths, as in the real catalogue
    nsim = rng.integers(1, 5, npaths).astype(float)
    return start, stop, data, sig_d, np.zeros(npaths), nsim, truth


#: the reference's committed GDM40 truth map (Marignier et al. 2023)
GDM40_PATH = os.environ.get(
    "PXMCMC_GDM40", "/root/reference/experiments/phasevel/GDM40_L28.npy"
)


def main(args):
    L, B, J_min = args.L, 2, 2
    setting = args.setting

    if os.path.exists(args.infile):
        start, stop, data, sig_d, _, nsim = read_datafile(args.infile)
    elif L == 28 and os.path.exists(GDM40_PATH):
        print(f"[gdm40] {args.infile} not found; synthesising path data "
              f"from the real GDM40 truth map {GDM40_PATH}")
        start, stop, data, sig_d, _, nsim, vel_truth = gdm40_dataset(
            GDM40_PATH, L
        )
        os.makedirs(args.outdir, exist_ok=True)
        np.save(os.path.join(args.outdir, f"vel_truth_L{L}.npy"), vel_truth)
    else:
        print(f"[synthetic] {args.infile} not found; generating synthetic paths")
        start, stop, data, sig_d, _, nsim, vel_truth = synthetic_dataset(L)
        # keep the ground truth next to the outputs so plot.py can print
        # SNR/R2E (real-data runs have no truth map)
        os.makedirs(args.outdir, exist_ok=True)
        np.save(os.path.join(args.outdir, f"vel_truth_L{L}.npy"), vel_truth)

    if os.path.exists(args.pathsfile):
        path_matrix = sparse.load_npz(args.pathsfile)
    else:
        path_matrix = get_path_matrix(start, stop, L)
        sparse.save_npz(args.pathsfile, path_matrix)
    assert path_matrix.shape[0] == len(data)

    if args.nsim:
        sig_d = sig_d * np.sqrt(nsim)

    forwardop = PathIntegralOperator(path_matrix, data, sig_d, setting, L, B, J_min)

    params = PxMCMCParams(
        nsamples=args.nsamples,
        nburn=args.nburn,
        ngap=args.ngap,
        delta=args.delta,
        lmda=args.delta / 2,
        mu=args.mu,
        complex=False,
        verbosity=1e3,
        s=10,
        nchains=args.nchains,
        track=tuple(t.strip() for t in args.track.split(",") if t.strip()),
    )

    regulariser = S2_Wavelets_L1_Power_Weights(
        setting,
        forwardop.transform.inverse,
        forwardop.transform.inverse_adjoint,
        params.lmda * params.mu,
        L=L,
        B=B,
        J_min=J_min,
        eta=args.eta,
    )

    print(f"Number of data points: {len(data)}")
    print(f"Number of model parameters: {forwardop.nparams}")

    algos = {"myula": MYULA, "pxmala": PxMALA, "skrock": SKROCK}
    if args.algo not in algos:
        raise ValueError(f"algo must be one of {list(algos)}")
    mcmc = algos[args.algo](forwardop, regulariser, params, seed=args.seed)

    NOW = datetime.datetime.now()
    mcmc.run(
        checkpoint_path=args.checkpoint,
        checkpoint_every=args.checkpoint_every,
        profile_dir=args.profile_dir,
    )

    # Post-run convergence diagnostics (beyond-reference; SURVEY.md §5)
    if hasattr(mcmc, "chain"):
        from pxmcmc_tpu.diagnostics import effective_sample_size, split_rhat

        ess = effective_sample_size(mcmc.chain)
        print(f"median ESS: {np.median(ess):.1f}"
              f" ({np.median(ess) / mcmc.runtime_seconds:.2f}/s)")
        if mcmc.chain.shape[1] > 1:
            rhat = split_rhat(mcmc.chain)
            print(f"max split R-hat: {rhat.max():.3f}")

    filename = f"{args.algo}_{args.setting}_{NOW.strftime('%d%m%y_%H%M%S')}_{args.jobid}"
    save_mcmc(
        mcmc,
        params,
        args.outdir,
        filename=filename,
        L=L,
        B=B,
        J_min=J_min,
        nparams=forwardop.nparams,
        setting=setting,
        time=str(datetime.datetime.now() - NOW),
        nsim=bool(args.nsim),
        eta=args.eta,
    )
    return mcmc


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("infile", type=str, nargs="?",
                        default="synthetic_GDM40_0S254_L28.txt",
                        help="Path to input datafile.")
    parser.add_argument("pathsfile", type=str, nargs="?", default="0S254L28.npz",
                        help=".npz sparse path matrix; generated+saved if missing.")
    parser.add_argument("--outdir", type=str, default=".")
    parser.add_argument("--jobid", type=str, default="0")
    parser.add_argument("--algo", type=str, default="myula")
    parser.add_argument("--setting", type=str, default="synthesis")
    parser.add_argument("--delta", type=float, default=1e-6)
    parser.add_argument("--mu", type=float, default=1)
    parser.add_argument("--L", type=int, default=28)
    parser.add_argument("--eta", type=float, default=1,
                        help="Wavelet power decay factor.")
    parser.add_argument("--nsim", action="store_true",
                        help="Weight errors by number of similar paths.")
    parser.add_argument("--nsamples", type=int, default=int(2e3))
    parser.add_argument("--nburn", type=int, default=0)
    parser.add_argument("--ngap", type=int, default=int(5e2))
    parser.add_argument("--nchains", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--track", type=str,
                        default="logposterior,L2,prior,chain",
                        help="Comma list of tracked quantities; add "
                             "'summary'/'summary_pixel'/'map' for streamed "
                             "production products (no chain storage).")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help=".npz checkpoint path (resumes if it exists).")
    parser.add_argument("--checkpoint-every", type=int, default=None)
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="Capture a jax.profiler trace of one superblock.")
    main(parser.parse_args())

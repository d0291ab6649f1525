"""
Earth topography denoising/compression: recovers the spherical wavelet
coefficients of the ETOPO1 topography map with proximal MCMC.

TPU-native port of ``/root/reference/experiments/earthtopography/main.py``
with the same CLI surface.  Input handling: healpix fits input needs healpy
(``_hpx_`` files); ``_mw_`` .npy files load directly; if the input file is
missing a reproducible synthetic bandlimited topography is generated so the
experiment runs end-to-end out of the box.

Beyond-reference flags: --nchains (vmapped parallel chains), --seed.
"""
import argparse
import datetime
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from pxmcmc_tpu.config import to_device, to_host
from pxmcmc_tpu.forward import SphericalWaveletTransformOperator
from pxmcmc_tpu.mcmc import MYULA, SKROCK, PxMALA, PxMCMCParams
from pxmcmc_tpu.ops import sampling, sht
from pxmcmc_tpu.prior import S2_Wavelets_L1
from pxmcmc_tpu.saving import save_mcmc
from pxmcmc_tpu.utils import calc_pixel_areas

parser = argparse.ArgumentParser()
parser.add_argument("--infile", type=str, default="ETOPO1_Ice_hpx_256.fits",
                    help="Path to input datafile.")
parser.add_argument("--outdir", type=str, default=".", help="Output directory.")
parser.add_argument("--jobid", type=str, default="0",
                    help="ID appended to the output filename.")
parser.add_argument("--algo", type=str, default="myula",
                    help="One of ['myula', 'pxmala', 'skrock'].")
parser.add_argument("--setting", type=str, default="synthesis",
                    help="'synthesis' or 'analysis'.")
parser.add_argument("--delta", type=float, default=1e-6, help="PxMCMC step size.")
parser.add_argument("--mu", type=float, default=1,
                    help="Regularisation parameter (prior width).")
parser.add_argument("--L", type=int, default=32, help="Angular bandlimit.")
parser.add_argument("--makenoise", action="store_true", help="Add noise to data.")
parser.add_argument("--sigma", type=float, default=1, help="Noise level added to data.")
parser.add_argument("--scaleafrica", type=int, default=0,
                    help="Factor by which to increase the noise level in Africa.")
parser.add_argument("--nsamples", type=int, default=int(1e2),
                    help="Number of saved samples.")
parser.add_argument("--ngap", type=int, default=int(5e2), help="Thinning gap.")
parser.add_argument("--nchains", type=int, default=1,
                    help="Parallel chains (vmapped on device).")
parser.add_argument("--seed", type=int, default=0, help="PRNG seed.")
parser.add_argument("--nburn", type=int, default=0, help="Burn-in iterations.")
parser.add_argument("--lmda", type=float, default=1e-6,
                    help="Moreau-Yosida regularisation parameter.")
parser.add_argument("--track", type=str,
                    default="logposterior,L2,prior,chain",
                    help="Comma list of tracked quantities; add 'summary' for "
                         "device-side streaming mean/var/CI (production runs).")
parser.add_argument("--checkpoint", type=str, default=None,
                    help=".npz checkpoint path (resumes if it exists).")
parser.add_argument("--checkpoint-every", type=int, default=None,
                    help="Checkpoint cadence in saved samples.")
parser.add_argument("--profile-dir", type=str, default=None,
                    help="Capture a jax.profiler trace of one superblock.")
parser.add_argument("--pyramid", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="Per-scale pyramid state layout (default; ~15%% "
                         "faster steps than --no-pyramid's flat layout, "
                         "different noise stream).")
parser.add_argument("--start", type=str, default="laplace",
                    choices=["laplace", "data"],
                    help="Chain start point: 'laplace' random (the "
                         "reference's choice) or 'data' — the wavelet "
                         "analysis of the observed map, a warm start that "
                         "cuts burn-in on production runs.")


def load_topo(infile, L):
    """Bandlimited MW topography map; synthetic fallback when data is absent.

    Mirrors ``earthtopography/main.py:79-87``; the synthetic branch draws a
    seeded random conjugate-symmetric spectrum with an ETOPO-like red power
    law so magnitudes are comparable to the real map (km scale after /1000).
    """
    if os.path.exists(infile) and "_hpx_" in infile:
        try:
            import healpy as hp

            from pxmcmc_tpu.utils import healpy_lm_to_mw_lm, map2alm

            topo = hp.read_map(infile)
            flm = healpy_lm_to_mw_lm(map2alm(topo, L - 1), L)
        except ModuleNotFoundError:
            # healpy-free path: our own FITS reader + ring-based map2alm
            from pxmcmc_tpu.ops import healpix

            topo, _nside = healpix.read_healpix_fits(infile)
            flm = healpix.map2alm(topo, L)
        basis = sht.get_basis(L, 0)
        return to_host(sht.inverse(to_device(flm), basis)).real.reshape(-1)
    if os.path.exists(infile) and "_mw_" in infile:
        return np.load(infile).reshape(-1)
    if os.path.exists(infile):
        raise ValueError("Check filename")
    print(f"[synthetic] {infile} not found; generating synthetic topography")
    rng = np.random.default_rng(42)
    flm = np.zeros(L * L, dtype=complex)
    for el in range(L):
        amp = 2000.0 / (1.0 + el) ** 1.5  # red spectrum, metres
        flm[sht.elm2ind(el, 0)] = rng.standard_normal() * amp
        for m in range(1, el + 1):
            a = (rng.standard_normal() + 1j * rng.standard_normal()) * amp
            flm[sht.elm2ind(el, m)] = a
            flm[sht.elm2ind(el, -m)] = (-1) ** m * np.conj(a)
    basis = sht.get_basis(L, 0)
    return to_host(sht.inverse(to_device(flm), basis)).real.reshape(-1)


def main(args):
    L, B, J_min = args.L, 1.5, 2
    sigma, setting = args.sigma, args.setting

    topo_d = load_topo(args.infile, L)

    if args.makenoise:  # heteroscedastic noise by pixel area (ref main.py:89-106)
        np.random.seed(2)
        areas = calc_pixel_areas(L)
        sig_d = np.sqrt(sigma ** 2 / areas)
        if args.scaleafrica:
            thetas = np.deg2rad(np.linspace(60, 120, 100))
            phis = np.deg2rad(np.linspace(-30, 30, 100))
            block = np.zeros((L, 2 * L - 1))
            for theta in thetas:
                ti = sampling.theta_to_index(theta, L)
                for phi in phis:
                    pi_ = sampling.phi_to_index(phi, L)
                    block[ti, pi_] = 1
            sig_d[block == 1] *= args.scaleafrica
        sig_d = sig_d.flatten()
        noise = np.random.normal(0, sig_d)
        topo_d = topo_d + noise
        np.random.seed(None)
    else:
        sig_d = sigma
        noise = 0

    forwardop = SphericalWaveletTransformOperator(
        topo_d / 1000, sig_d, setting, L, B, J_min
    )

    params = PxMCMCParams(
        nsamples=args.nsamples,
        nburn=args.nburn,
        ngap=args.ngap,
        delta=args.delta,
        lmda=args.lmda,
        mu=args.mu,
        complex=False,
        verbosity=5e3,
        s=10,
        nchains=args.nchains,
        track=tuple(t.strip() for t in args.track.split(",") if t.strip()),
        pyramid_state=args.pyramid,
    )

    regulariser = S2_Wavelets_L1(
        setting,
        forwardop.transform.inverse,
        forwardop.transform.inverse_adjoint,
        params.lmda * params.mu,
        L=L,
        B=B,
        J_min=J_min,
    )

    print(f"Number of data points: {len(topo_d)}")
    print(f"Number of model parameters: {forwardop.nparams}")

    algos = {"myula": MYULA, "pxmala": PxMALA, "skrock": SKROCK}
    if args.algo not in algos:
        raise ValueError(f"algo must be one of {list(algos)}")
    mcmc = algos[args.algo](forwardop, regulariser, params, seed=args.seed)

    start_point = None
    if args.start == "data":
        # warm start at the analysis coefficients of the observed map
        # (synthesis setting) or the map itself (analysis setting)
        obs = to_device(np.asarray(topo_d / 1000))
        start_point = to_host(
            forwardop.transform.forward(obs) if setting == "synthesis" else obs
        ).real

    NOW = datetime.datetime.now()
    mcmc.run(
        start_point=start_point,
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
        noise=noise,
        setting=setting,
        sigma=sigma,
        scaleafrica=args.scaleafrica,
        time=str(datetime.datetime.now() - NOW),
    )
    return mcmc


if __name__ == "__main__":
    main(parser.parse_args())

"""
Full-sky weak-lensing mass mapping: recovers the convergence (kappa) field
from masked, noisy shear (gamma) observations (replicates Marignier et al.
2023, RASTI, doi:10.1093/rasti/rzac010).

TPU-native port of ``/root/reference/experiments/weaklensing/main.py`` with
the same CLI surface.  Takahashi N-body kappa input needs healpy; without it
(or without the file) a synthetic bandlimited kappa with a red spectrum is
generated, smoothed with the same 50-arcmin Gaussian beam, and forward
-modelled to shear.
"""
import argparse
import datetime
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from pxmcmc_tpu.config import to_device, to_host
from pxmcmc_tpu.forward import ForwardOperator
from pxmcmc_tpu.mcmc import MYULA, SKROCK, PxMALA, PxMCMCParams
from pxmcmc_tpu.measurements import WeakLensing
from pxmcmc_tpu.ops import sht
from pxmcmc_tpu.prior import S2_Wavelets_L1
from pxmcmc_tpu.saving import save_mcmc
from pxmcmc_tpu.transforms import SphericalWaveletTransform
from pxmcmc_tpu.utils import build_mask


def _beam(L, sigma_rad):
    """Gaussian beam b_l = exp(-l(l+1) sigma^2 / 2) on the flm layout."""
    ls = np.floor(np.sqrt(np.arange(L * L)))
    return np.exp(-ls * (ls + 1) * sigma_rad ** 2 / 2)


def load_gammas(kappa_fits_file, L, wl: WeakLensing, seed=13):
    """Shear predictions from a kappa ground truth (ref ``main.py:23-39``).

    healpy branch mirrors the reference (bandlimit, 50-arcmin smoothing);
    synthetic branch draws a seeded red-spectrum kappa.
    """
    sigma = np.radians(50 / 60)
    basis = sht.get_basis(L, 0)
    if os.path.exists(kappa_fits_file):
        import healpy as hp

        from pxmcmc_tpu.utils import healpy_lm_to_mw_lm, map2alm

        kappa = hp.read_map(kappa_fits_file)
        flm = healpy_lm_to_mw_lm(map2alm(kappa, L - 1), L)
    else:
        print(f"[synthetic] {kappa_fits_file} not found; generating synthetic kappa")
        rng = np.random.default_rng(seed)
        flm = np.zeros(L * L, dtype=complex)
        for el in range(2, L):
            amp = 0.05 / (1.0 + el) ** 0.8
            flm[sht.elm2ind(el, 0)] = rng.standard_normal() * amp
            for m in range(1, el + 1):
                a = (rng.standard_normal() + 1j * rng.standard_normal()) * amp
                flm[sht.elm2ind(el, m)] = a
                flm[sht.elm2ind(el, -m)] = (-1) ** m * np.conj(a)
    flm = flm * _beam(L, sigma)
    # complex values cross the host<->device boundary as stacked real planes
    # (relayed TPU backends reject complex transfers; config.to_device/to_host)
    kappa_mw = np.real(to_host(sht.inverse(to_device(flm), basis)).reshape(-1))
    return to_host(wl.forward(kappa_mw)), kappa_mw


def sks_start(gammas, L, wl: WeakLensing):
    """Spherical Kaiser-Squires first estimate of kappa from the observed
    shear (ref ``measurements.py:146-153`` ``sks_estimate``): embed the
    masked gammas on the full sky, spin-2 forward SHT, apply the inverse
    harmonic kernel, spin-0 inverse SHT.  The standard data-derived warm
    start for mass-mapping chains."""
    from pxmcmc_tpu.measurements import WeakLensingHarmonic

    basis2 = sht.get_basis(L, 2)
    basis0 = sht.get_basis(L, 0)
    gmap = np.zeros(L * (2 * L - 1), dtype=complex)
    # the stored data vector is inverse-covariance weighted; undo for SKS
    gmap[wl._mask_idx_np] = np.asarray(gammas) / wl._inv_cov_np
    glm = sht.forward(to_device(gmap.reshape(L, 2 * L - 1)), basis2)
    klm = WeakLensingHarmonic(L).harmonic_inverse_mapping(glm)
    return np.real(to_host(sht.inverse(klm, basis0)).reshape(-1))


def main(args):
    L, B, J_min = args.L, 2, 2
    setting = args.setting

    # Euclid-like galactic + ecliptic mask and synthetic shear (ref main.py:90-93)
    mask = build_mask(L, size=10)
    measurement = WeakLensing(L, mask, ngal=np.full_like(mask, 30.0))
    gammas_truth, kappa_truth = load_gammas(
        args.infile, L, measurement, seed=args.seed + 13
    )
    os.makedirs(args.outdir, exist_ok=True)
    np.save(os.path.join(args.outdir, f"kappa_truth_L{L}.npy"), kappa_truth)

    transform = SphericalWaveletTransform(L, B, J_min)

    forward_operator = ForwardOperator(
        gammas_truth,
        1 / np.asarray(measurement.inv_cov),
        setting,
        transform=transform,
        measurement=measurement,
        nparams=transform.ncoefs if setting == "synthesis" else measurement.npix,
    )

    params = PxMCMCParams(
        nsamples=args.nsamples,
        nburn=args.nburn,
        ngap=args.ngap,
        delta=args.delta,
        lmda=args.delta / 2,
        mu=args.mu,
        complex=False,
        verbosity=1e3,
        nchains=args.nchains,
        track=tuple(t.strip() for t in args.track.split(",") if t.strip()),
        pyramid_state=args.pyramid,
    )

    prior = S2_Wavelets_L1(
        setting,
        transform.inverse,
        transform.inverse_adjoint,
        params.lmda * params.mu,
        L=L,
        B=B,
        J_min=J_min,
    )

    print(f"Number of data points: {gammas_truth.size}")
    print(f"Number of model parameters: {forward_operator.nparams}")

    algos = {"myula": MYULA, "pxmala": PxMALA, "skrock": SKROCK}
    if args.algo not in algos:
        raise ValueError(f"algo must be one of {list(algos)}")
    mcmc = algos[args.algo](forward_operator, prior, params, seed=args.seed)

    start_point = None
    if args.start == "sks":
        kappa0 = sks_start(gammas_truth, L, measurement)
        start_point = (
            np.real(to_host(transform.forward(to_device(kappa0))))
            if setting == "synthesis" else kappa0
        )

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
        nparams=forward_operator.nparams,
        setting=setting,
        time=str(datetime.datetime.now() - NOW),
    )
    return mcmc


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("infile", type=str, nargs="?", default="takahashi_kappa.fits",
                        help="fits file with the kappa ground truth (healpix).")
    parser.add_argument("--outdir", type=str, default=".")
    parser.add_argument("--jobid", type=str, default="0")
    parser.add_argument("--algo", type=str, default="myula")
    parser.add_argument("--setting", type=str, default="synthesis")
    parser.add_argument("--delta", type=float, default=1e-6)
    parser.add_argument("--mu", type=float, default=1)
    parser.add_argument("--L", type=int, default=512)
    parser.add_argument("--nsamples", type=int, default=int(5e3))
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
    parser.add_argument("--start", type=str, default="laplace",
                        choices=["laplace", "sks"],
                        help="Chain start: 'laplace' random (the reference's "
                             "choice) or 'sks' — the spherical Kaiser-Squires "
                             "estimate from the observed shear, a data-derived "
                             "warm start that cuts burn-in on production runs.")
    parser.add_argument("--pyramid", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="Per-scale pyramid state layout (default; "
                             "faster steps than --no-pyramid's flat layout, "
                             "different noise stream).")
    main(parser.parse_args())

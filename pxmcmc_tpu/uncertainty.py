r"""Uncertainty quantification from MCMC samples.

Parity with ``/root/reference/pxmcmc/uncertainty.py`` plus device-side
(jax) implementations so pixelwise credible intervals can be reduced across
a chain mesh with collectives (see :mod:`pxmcmc_tpu.parallel.chains`).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .ops.sampling import sample_length, sample_shape
from .ops.wavelets import multires_bandlimits


def credible_interval_range(chain, alpha=0.05):
    """Pixelwise credible-interval range at confidence alpha (ref ``uncertainty.py:7-16``).

    :param chain: (nsamples, nparams) samples (numpy or jax; extra chain axes
        are folded into the sample axis)
    :param alpha: confidence level
    """
    chain = np.asarray(chain)
    if chain.ndim > 2:
        chain = chain.reshape(-1, chain.shape[-1])
    quantiles = np.quantile(chain, (alpha / 2, 1 - alpha / 2), axis=0)
    return np.diff(quantiles, axis=0)[0]


def wavelet_credible_interval_range(chain, L, B, J_min, alpha=0.05):
    """Per-wavelet-scale CI-range maps in MW format (ref ``uncertainty.py:19-40``)."""
    bls = multires_bandlimits(L, B, J_min)
    scale_start = 0
    wav_ci_ranges = []
    for bl in bls:
        bl = int(bl)
        scale_length = sample_length(bl)
        wav = np.asarray(chain)[..., scale_start : scale_start + scale_length]
        wav_ci_ranges.append(
            credible_interval_range(wav, alpha).reshape(sample_shape(bl))
        )
        scale_start += scale_length
    return wav_ci_ranges


def credible_region_threshold(logpis, alpha=0.05):
    """HPD credible-set log-posterior threshold (ref ``uncertainty.py:43-56``)."""
    return np.quantile(np.asarray(logpis).ravel(), 1 - alpha)


def in_credible_region(logpi, threshold):
    return bool(logpi <= threshold)


# -- device-side versions (for cross-chain reductions) -----------------------

def credible_interval_range_device(chain, alpha=0.05):
    """jax version of :func:`credible_interval_range`; sample axes lead."""
    chain = chain.reshape(-1, chain.shape[-1])
    lo = jnp.quantile(chain, alpha / 2, axis=0)
    hi = jnp.quantile(chain, 1 - alpha / 2, axis=0)
    return hi - lo

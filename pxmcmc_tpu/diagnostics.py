r"""Convergence diagnostics: ESS, split R-hat, acceptance summaries.

Beyond-reference capability (the reference has none — SURVEY.md §5): these
are the cross-chain statistics the multi-chain runner reduces over the device
mesh with ``psum``-style collectives.  Formulas follow Gelman et al., BDA3
/ Vehtari et al. 2021 (rank-normalised split-R-hat is left to post-hoc
tooling; this is the classic split-chain version).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def effective_sample_size(chain):
    """ESS per parameter via the initial-positive-sequence autocorrelation sum.

    :param chain: (nsamples, nchains, nparams) or (nsamples, nparams)
    :return: (nparams,) ESS summed over chains
    """
    x = np.asarray(chain, dtype=float)
    if x.ndim == 2:
        x = x[:, None, :]
    n, m, p = x.shape
    x = x - x.mean(axis=0, keepdims=True)
    # FFT autocorrelation per chain/param
    nfft = int(2 ** np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(x, nfft, axis=0)
    acov = np.fft.irfft(f * np.conj(f), nfft, axis=0)[:n].real
    acov /= np.arange(n, 0, -1)[:, None, None]
    var0 = acov[0]
    var0 = np.where(var0 == 0, 1.0, var0)
    rho = (acov / var0).mean(axis=1)  # average over chains: (n, p)
    # Geyer initial positive sequence on pair sums
    npairs = (n - 1) // 2
    ess = np.empty(p)
    for j in range(p):
        pair = rho[1 : 2 * npairs + 1, j].reshape(npairs, 2).sum(axis=1)
        pos = np.nonzero(pair <= 0)[0]
        k = pos[0] if pos.size else npairs
        tau = 1 + 2 * rho[1 : 2 * k + 1, j].sum()
        ess[j] = n * m / max(tau, 1e-12)
    return ess


def split_rhat(chain):
    """Split-chain potential scale reduction factor R-hat.

    :param chain: (nsamples, nchains, nparams) or (nsamples, nparams)
    :return: (nparams,) R-hat (1.0 = converged)
    """
    x = np.asarray(chain, dtype=float)
    if x.ndim == 2:
        x = x[:, None, :]
    n, m, p = x.shape
    half = n // 2
    x = np.concatenate([x[:half], x[half : 2 * half]], axis=1)  # (half, 2m, p)
    n, m = x.shape[0], x.shape[1]
    chain_means = x.mean(axis=0)  # (m, p)
    chain_vars = x.var(axis=0, ddof=1)  # (m, p)
    W = chain_vars.mean(axis=0)
    B = n * chain_means.var(axis=0, ddof=1)
    var_plus = (n - 1) / n * W + B / n
    W = np.where(W == 0, 1e-12, W)
    return np.sqrt(var_plus / W)


def ess_per_second(chain, elapsed_seconds):
    """Median-parameter ESS rate — the BASELINE.json throughput metric."""
    return float(np.median(effective_sample_size(chain)) / elapsed_seconds)


# -- device-side moment accumulators (for mesh reductions) -------------------

def chain_moments(samples):
    """Per-chain running moments on device: (count, mean, M2) over samples.

    ``samples``: (nsamples, ..., nparams).  Combine across devices with psum
    of each component (chunk-parallel Welford combine).
    """
    n = samples.shape[0]
    mean = jnp.mean(samples, axis=0)
    m2 = jnp.sum(jnp.abs(samples - mean) ** 2, axis=0)
    return n, mean, m2


def combine_moments(n_a, mean_a, m2_a, n_b, mean_b, m2_b):
    """Chan et al. parallel variance combine."""
    n = n_a + n_b
    delta = mean_b - mean_a
    mean = mean_a + delta * (n_b / n)
    m2 = m2_a + m2_b + jnp.abs(delta) ** 2 * (n_a * n_b / n)
    return n, mean, m2

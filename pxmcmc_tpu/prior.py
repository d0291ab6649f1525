r"""Priors and their proximal operators.

API parity with ``/root/reference/pxmcmc/prior.py``: L1 prior with
soft-threshold prox (`prior.py:8-53`), per-scale MW-quadrature weighting
(`prior.py:56-84`), and wavelet power/decay weighting from Wallis et al. 2017
eqs 33-34 (`prior.py:87-149`).

All prior/prox evaluations are pure JAX, batched over leading dims, so the
prox fuses with the sampler's Langevin update into one XLA program (a Pallas
fused kernel for the prox+update is provided in
:mod:`pxmcmc_tpu.ops.threshold`).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .config import real_dtype
from .ops import wavelets
from .ops.sampling import mw_map_weights, sample_length, sample_positions, sample_shape
from .utils import soft

__all__ = ["L1", "S2_Wavelets_L1", "S2_Wavelets_L1_Power_Weights"]


class L1:
    """L1-norm prior; prox is soft thresholding (ref ``prior.py:8-53``).

    :param setting: 'analysis' or 'synthesis'
    :param fwd: transform handle (analysis prox only), e.g. ``transform.inverse``
    :param adj: adjoint handle (analysis prox only), e.g. ``transform.inverse_adjoint``
    :param T: threshold (scalar or per-coefficient vector)
    """

    def __init__(self, setting, fwd, adj, T):
        assert setting in ["analysis", "synthesis"]
        self.setting = setting
        self.fwd = fwd
        self.adj = adj
        # dtype conversion happens host-side: an eager on-device
        # convert_element_type is not implemented on some remote TPU
        # backends (axon), and setup-time transfers should be one-shot.
        self.T = (
            jnp.asarray(np.asarray(T).astype(np.dtype(real_dtype())))
            if not np.isscalar(T) else T
        )

    def _analysis_block_basis(self):
        """When the analysis-prox handles are the standard synthesis /
        synthesis-adjoint pair of an axisymmetric pixel-mode
        :class:`~pxmcmc_tpu.transforms.SphericalWaveletTransform`, the prox
        can run block-form end to end — the intermediate coefficient pyramid
        never materialises as one flat vector (concatenate + re-split were
        ~15% of the analysis step in the round-3 trace).  Returns the
        transform's :class:`~pxmcmc_tpu.ops.wavelets.WaveletBasis`, or None
        to take the generic handle-based path.  Exact: the block path runs
        the identical per-scale ops minus the concatenate/split."""
        from .transforms import SphericalWaveletTransform

        tr = getattr(self.fwd, "__self__", None)
        if (
            tr is not None
            and tr is getattr(self.adj, "__self__", None)
            and type(tr) is SphericalWaveletTransform
            and getattr(self.fwd, "__func__", None) is SphericalWaveletTransform.inverse
            and getattr(self.adj, "__func__", None)
            is SphericalWaveletTransform.inverse_adjoint
            and tr.dirs == 1
            and not tr.harmonic
        ):
            return tr.basis
        return None

    def prior(self, X):
        """log-prior = sum |X| (ref ``prior.py:28-35``); batched over leading dims."""
        return jnp.sum(jnp.abs(X), axis=-1)

    def proxf(self, X):
        """Proximal map of the log-prior (ref ``prior.py:37-47``)."""
        if self.setting == "synthesis":
            return self._proxf_synthesis(X)
        return self._proxf_analysis(X)

    def _proxf_synthesis(self, X):
        return soft(X, self.T)

    def _proxf_analysis(self, X):
        wb = self._analysis_block_basis()
        if wb is not None:
            AXb = wavelets.synthesis_adjoint_blocks(X, wb)
            Tb = self._split_T(wb)
            db = tuple(
                soft(a, Tb[i] if Tb is not None else self.T) - a
                for i, a in enumerate(AXb)
            )
            return X + wavelets.synthesis_blocks(db, wb)
        AX = self.adj(X)
        return X + self.fwd(soft(AX, self.T) - AX)

    def _split_T(self, wb):
        """Per-scale views of a vector threshold (None for scalar T)."""
        if not (isinstance(self.T, jnp.ndarray) and self.T.ndim):
            return None
        return tuple(wavelets._split_scales(self.T, wb))


class S2_Wavelets_L1(L1):
    """L1 prior for spherical wavelets, weighted by exact MW quadrature per
    multiresolution scale so polar pixels are not over-counted
    (ref ``prior.py:56-84``).
    """

    def __init__(self, setting, fwd, adj, T, L, B, J_min, dirs=1, spin=0):
        super().__init__(setting, fwd, adj, T)
        self.L = L
        self.B = B
        self.J_min = J_min
        self.J_max = wavelets.j_max(B, L, J_min)
        self.nscales = self.J_max - J_min + 1
        self.dirs = dirs
        self.spin = spin
        # Per-scale exact MW quadrature weights on the multires pyramid.
        # These weight *coefficients*, which in the analysis setting is the
        # space adj(X) lives in — so the weighted threshold applies to both
        # settings.  (The reference raises NotImplementedError for analysis,
        # prior.py:79-80, which makes its own analysis-mode experiment CLIs
        # crash; implemented here.)
        bls = wavelets.multires_bandlimits(L, B, J_min, dirs, spin)
        # dirs > 1: wavelet-scale coefficients live on an SO(3) grid with
        # 2*dirs - 1 direction samples; the MW theta quadrature weight
        # repeats across directions (uniform gamma sampling).
        G = 2 * dirs - 1
        parts = [mw_map_weights(int(bls[0]))]
        for bl in bls[1:]:
            w = mw_map_weights(int(bl))
            parts.append(np.tile(w, G) if dirs > 1 else w)
        self.map_weights = jnp.asarray(
            np.concatenate(parts).astype(np.dtype(real_dtype()))
        )
        self.T = self.T * self.map_weights

    def prior(self, X):
        """Weighted L1 norm; in the analysis setting X is an image, so the
        norm applies to its wavelet coefficients."""
        if self.setting == "analysis":
            return jnp.sum(jnp.abs(self.map_weights * self.adj(X)), axis=-1)
        return super().prior(self.map_weights * X)


class S2_Wavelets_L1_Power_Weights(S2_Wavelets_L1):
    """Adds wavelet-power and peak-degree decay weighting (Wallis et al. 2017
    eqs 33-34); ref ``prior.py:87-149``.

    :param eta: wavelet decay tuning parameter
    """

    def __init__(self, setting, fwd, adj, T, L, B, J_min, dirs=1, spin=0, eta=1):
        super().__init__(setting, fwd, adj, T, L, B, J_min, dirs, spin)
        self.eta = eta
        self._get_weights()
        # NOTE: T already carries the quadrature weights from the parent init;
        # the power weights multiply on top (same stacking as the reference,
        # prior.py:81 then prior.py:108).  Like the parent, the analysis
        # setting is supported here (per-coefficient weights apply to adj(X));
        # the reference raises NotImplementedError (prior.py:104-107).
        self.T = self.T * self.map_weights

    def prior(self, X):
        if self.setting == "analysis":
            return jnp.sum(jnp.abs(self.map_weights * self.adj(X)), axis=-1)
        return jnp.sum(jnp.abs(self.map_weights * X), axis=-1)

    def _get_weights(self):
        s = self._calculate_scaling_weights().flatten()
        w = np.concatenate([wi.flatten() for wi in self._calculate_wavelet_weights()])
        self.map_weights = jnp.asarray(
            np.concatenate([s, w]).astype(np.dtype(real_dtype()))
        )

    def _calculate_scaling_weights(self):
        """2 pi^2 sin(theta) / (power * nsamples) on the scaling grid (ref :120-128)."""
        phi_l, _ = wavelets.wavelet_tiling(self.B, self.L, self.dirs, self.J_min, self.spin)
        scaling_power = float(np.vdot(phi_l, phi_l).real)
        effective_L = int(np.nonzero(phi_l)[0].max()) + 1
        nsamples = sample_length(effective_L)
        weights = np.full(
            sample_shape(effective_L), 2 * np.pi ** 2 / (scaling_power * nsamples)
        )
        thetas, _ = sample_positions(effective_L)
        return (weights.T * np.sin(thetas)).T

    def _calculate_wavelet_weights(self):
        """Per-scale 2 pi^2 (peak_l^eta) sin(theta) / (power * nsamples) (ref :130-149)."""
        bls = wavelets.multires_bandlimits(self.L, self.B, self.J_min)
        _, psi_lm = wavelets.wavelet_tiling(self.B, self.L, self.dirs, self.J_min, self.spin)
        wavelet_powers = np.array([np.vdot(lm, lm).real for lm in psi_lm.T])
        psi_l = np.zeros((psi_lm.shape[1], self.L))
        for j in range(psi_lm.shape[1]):
            psi_l[j] = np.array([psi_lm[el ** 2 + el, j].real for el in range(self.L)])
        peak_ls = np.argmax(psi_l, axis=1)
        all_weights = []
        G = 2 * self.dirs - 1
        for effective_L, power, peak_l in zip(bls[1:], wavelet_powers, peak_ls):
            effective_L = int(effective_L)
            nsamples = sample_length(effective_L)
            weights = np.full(
                sample_shape(effective_L),
                (2 * np.pi ** 2) * (float(peak_l) ** self.eta) / (power * nsamples),
            )
            thetas, _ = sample_positions(effective_L)
            w = (weights.T * np.sin(thetas)).T
            all_weights.append(np.tile(w.flatten(), G) if self.dirs > 1 else w)
        return all_weights

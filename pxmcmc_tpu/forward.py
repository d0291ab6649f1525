r"""Forward operators: transform + measurement + noise model -> posterior plumbing.

API parity with ``/root/reference/pxmcmc/forward.py``: analysis vs synthesis
forward modelling (`forward.py:60-64`), the Gaussian data-fidelity gradient
through the adjoint chain (`forward.py:66-72`), and scalar / vector / matrix
inverse covariance construction (`forward.py:74-88`).

Every method is a pure JAX computation over arrays with leading batch
(chain) dimensions so a full MCMC step jit-compiles into one XLA program.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .config import complex_dtype, real_dtype, to_device
from .measurements import Identity, PathIntegral
from .ops.sampling import sample_length as mw_size
from .transforms import SphericalWaveletTransform

__all__ = ["ForwardOperator", "SphericalWaveletTransformOperator", "PathIntegralOperator"]


class ForwardOperator:
    """Combines a transform and a measurement operator (ref ``forward.py:9-88``).

    :param data: observed data vector (numpy or jax, 1D)
    :param sig_d: observation error: scalar, vector, or full covariance matrix
    :param setting: 'analysis' or 'synthesis'
    :param transform: :class:`pxmcmc_tpu.transforms.Transform`
    :param measurement: :class:`pxmcmc_tpu.measurements.Measurement`
    :param nparams: number of sampled parameters
    """

    def __init__(self, data, sig_d, setting, transform=None, measurement=None, nparams=None):
        data = np.asarray(data)
        self.iscomplex = np.iscomplexobj(data)
        self._data_np = data  # host copy for fast-path table builds
        self.data = to_device(
            data, dtype=complex_dtype() if self.iscomplex else real_dtype()
        )
        self._build_inverse_covariance(sig_d)
        if setting not in ["analysis", "synthesis"]:
            raise ValueError("setting must be 'analysis' or 'synthesis'")
        self.setting = setting
        if transform is not None:
            self.transform = transform
        if measurement is not None:
            self.measurement = measurement
        if nparams is not None:
            self.nparams = nparams

    # -- forward model -------------------------------------------------------
    def forward(self, X):
        """Data predictions from sample X (ref ``forward.py:36-46``)."""
        if self.setting == "analysis":
            return self._forward_analysis(X)
        return self._forward_synthesis(X)

    def calc_gradg(self, preds):
        """Gradient of the Gaussian data fidelity (ref ``forward.py:48-58``)."""
        if self.setting == "analysis":
            return self._gradg_analysis(preds)
        return self._gradg_synthesis(preds)

    def logpi_fidelity(self, preds):
        """L2 = (preds-data)^H invcov (preds-data), real (ref ``mcmc.py:78-79``)."""
        diff = self.data - preds
        return jnp.einsum("...d,...d->...", jnp.conj(diff), self.apply_invcov(diff)).real

    def _forward_analysis(self, X):
        return self.measurement.forward(X)

    def _forward_synthesis(self, X):
        return self.measurement.forward(self.transform.inverse(X))

    def _gradg_analysis(self, preds):
        return self.measurement.adjoint(self.apply_invcov(preds - self.data))

    def _gradg_synthesis(self, preds):
        return self.transform.inverse_adjoint(self._gradg_analysis(preds))

    # -- noise model ---------------------------------------------------------
    def _build_inverse_covariance(self, sig_d):
        """Scalar / vector / full-matrix sigma_d (ref ``forward.py:74-88``)."""
        sig_np = np.asarray(sig_d)
        if sig_np.ndim == 2:
            if sig_np.shape[0] != sig_np.shape[1]:
                raise ValueError("Covariance matrix should be square")
            inv = np.linalg.inv(sig_np)
            self._invcov_kind = "matrix"
            self.invcov = to_device(
                inv, dtype=complex_dtype() if np.iscomplexobj(inv) else real_dtype()
            )
            return
        var = sig_np ** 2
        if self.iscomplex and not np.iscomplexobj(var):
            # split the variance between real and imaginary parts (ref :81-82)
            var = var / np.sqrt(2) * (1 + 1j)
        if var.ndim == 0:
            self._invcov_kind = "scalar"
        elif var.ndim == 1 and var.size == self.data.shape[-1]:
            self._invcov_kind = "vector"
        else:
            raise TypeError("sig_d must be a float scalar, vector or 2D matrix")
        self._invcov_np = 1.0 / var  # host copy for fast-path table builds
        self.invcov = to_device(
            self._invcov_np,
            dtype=complex_dtype() if np.iscomplexobj(var) else real_dtype(),
        )

    def apply_invcov(self, v):
        if self._invcov_kind == "matrix":
            return jnp.einsum("de,...e->...d", self.invcov, v)
        return self.invcov * v

    # -- internal (fast-path) prediction representation ----------------------
    # Samplers drive the model exclusively through these four methods.  By
    # default they delegate to the public reference-parity API; model shapes
    # with a TPU-native fast formulation (today: the stacked-real weak
    # -lensing chain of ops/lensing.py) override the *representation* of the
    # prediction vector while keeping every public method unchanged.

    def _wl_fast_ok(self) -> bool:
        import os

        from .measurements import WeakLensing
        from .transforms import SphericalWaveletTransform

        tr = getattr(self, "transform", None)
        return (
            os.environ.get("PXMCMC_WL_FAST", "1") != "0"
            and self.setting == "synthesis"
            and isinstance(getattr(self, "measurement", None), WeakLensing)
            and isinstance(tr, SphericalWaveletTransform)
            and tr.spin == 0
            and getattr(tr, "dirs", 1) == 1
            and not getattr(tr, "harmonic", False)
            and self._invcov_kind in ("scalar", "vector")
            and tr.L == self.measurement.L
        )

    def prepare(self):
        """Build fast-path tables (called by the sampler before capture
        setup, so the tables thread through jit as runtime arguments)."""
        if self._wl_fast_ok():
            if not hasattr(self, "_wl"):
                from .ops.lensing import build_wl_tables

                self._wl = build_wl_tables(
                    self.measurement, self._data_np, self._invcov_np
                )
        elif hasattr(getattr(self, "measurement", None), "ensure_bases"):
            self.measurement.ensure_bases()

    def _use_wl(self, arr) -> bool:
        """Fast path applies to real (stacked-real) arrays only; complex
        chains (params.complex=True) keep the generic representation."""
        return getattr(self, "_wl", None) is not None and not jnp.iscomplexobj(arr)

    def forward_internal(self, X):
        """Predictions in the sampler's internal representation."""
        if self._wl_fast_ok() and not hasattr(self, "_wl"):
            self.prepare()
        if self._use_wl(X):
            from .ops.lensing import wl_forward2

            return wl_forward2(X, self.transform.basis, self._wl)
        return self.forward(X)

    def gradg_internal(self, preds):
        if self._use_wl(preds):
            from .ops.lensing import wl_gradg2

            return wl_gradg2(preds, self.transform.basis, self._wl)
        return self.calc_gradg(preds)

    # -- per-scale-block (pyramid state) forms --------------------------------
    def _blocks_ok(self) -> bool:
        """Whether forward/gradg have per-scale-block forms (pyramid state)."""
        return self._wl_fast_ok()

    def forward_internal_blocks(self, blocks):
        """Predictions from a per-scale coefficient tuple (pyramid state)."""
        if self._wl_fast_ok() and not hasattr(self, "_wl"):
            self.prepare()
        from .ops.lensing import wl_forward2_blocks

        return wl_forward2_blocks(blocks, self.transform.basis, self._wl)

    def gradg_internal_blocks(self, preds):
        """Fidelity gradient as a per-scale coefficient tuple (pyramid state)."""
        from .ops.lensing import wl_gradg2_blocks

        return wl_gradg2_blocks(preds, self.transform.basis, self._wl)

    def fidelity_internal(self, preds):
        if self._use_wl(preds):
            from .ops.lensing import wl_fidelity2

            return wl_fidelity2(preds, self._wl)
        return self.logpi_fidelity(preds)

    def preds_to_data(self, preds):
        """Internal predictions -> the reference's data-layout vector."""
        if self._use_wl(preds):
            from .ops.lensing import wl_preds_complex

            return wl_preds_complex(preds, self._wl)
        return preds


class SphericalWaveletTransformOperator(ForwardOperator):
    """Wavelet transform + identity measurement (ref ``forward.py:91-123``)."""

    def __init__(self, data, sig_d, setting, L, B, J_min, dirs=1, spin=0):
        transform = SphericalWaveletTransform(L, B, J_min, dirs=dirs, spin=spin)
        measurement = Identity(len(data), mw_size(L))
        nparams = mw_size(L) if setting == "analysis" else transform.ncoefs
        super().__init__(
            data, sig_d, setting, transform=transform, measurement=measurement, nparams=nparams
        )


class PathIntegralOperator(ForwardOperator):
    """Wavelet transform + path-integral (matvec) measurement (ref ``forward.py:126-162``)."""

    def __init__(self, pathmatrix, data, sig_d, setting, L, B, J_min, dirs=1, spin=0):
        transform = SphericalWaveletTransform(L, B, J_min, dirs=dirs, spin=spin)
        measurement = PathIntegral(pathmatrix)
        nparams = mw_size(L) if setting == "analysis" else transform.ncoefs
        super().__init__(
            data, sig_d, setting, transform=transform, measurement=measurement, nparams=nparams
        )

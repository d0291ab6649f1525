"""Precision parity: f32 (TPU production dtype) posterior statistics match
f64 within Monte-Carlo tolerance — SURVEY.md hard part #3 and the
BASELINE.json credible-interval-parity requirement, testable without the
reference's C stack.

Runs the same wavelet-denoising posterior in both dtypes (different noise
streams — jax PRNG output depends on dtype — so the comparison is
statistical, which is exactly the CI-parity criterion)."""
import subprocess
import sys
import os

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", {x64})
import numpy as np
from pxmcmc_tpu.ops import sht
from pxmcmc_tpu.forward import SphericalWaveletTransformOperator
from pxmcmc_tpu.prior import S2_Wavelets_L1
from pxmcmc_tpu.mcmc import MYULA, PxMCMCParams
from pxmcmc_tpu.uncertainty import credible_interval_range

L, B, J_min = 10, 2, 2
rng = np.random.default_rng(4)
flm = np.zeros(L * L, dtype=complex)
for el in range(L):
    flm[el*el+el] = rng.standard_normal()
    for m in range(1, el+1):
        a = rng.standard_normal() + 1j*rng.standard_normal()
        flm[el*el+el+m] = a
        flm[el*el+el-m] = (-1)**m*np.conj(a)
basis = sht.get_basis(L, 0, use_disk_cache=False)
data = np.asarray(sht.inverse_real(jax.numpy.asarray(flm), basis)).flatten()

fwd = SphericalWaveletTransformOperator(data, 0.2, "synthesis", L, B, J_min)
params = PxMCMCParams(nsamples=800, nburn=200, ngap=3, verbosity=0,
                      delta=1e-3, lmda=5e-3, nchains=4)
prior = S2_Wavelets_L1("synthesis", fwd.transform.inverse,
                       fwd.transform.inverse_adjoint,
                       params.lmda * params.mu, L=L, B=B, J_min=J_min)
m = MYULA(fwd, prior, params, seed=21).run()
img = np.asarray(fwd.transform.inverse(
    jax.numpy.asarray(m.chain.reshape(-1, fwd.nparams).astype(
        np.float64 if {x64} else np.float32))))
mean = img.mean(axis=0)
ci = credible_interval_range(img)
np.savez({out!r}, mean=mean, ci=ci)
"""


def _run(x64, out):
    code = _SCRIPT.format(repo=REPO, x64=x64, out=out)
    env = dict(os.environ, PXMCMC_PLATFORM="cpu")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    with np.load(out) as z:
        return z["mean"], z["ci"]


def test_f32_f64_posterior_parity(tmp_path):
    mean64, ci64 = _run(True, os.path.join(str(tmp_path), "a.npz"))
    mean32, ci32 = _run(False, os.path.join(str(tmp_path), "b.npz"))
    scale = np.abs(mean64).max()
    # posterior means agree to a few percent of signal scale
    assert np.abs(mean64 - mean32).max() / scale < 0.05, (
        np.abs(mean64 - mean32).max() / scale
    )
    # credible-interval widths agree on average
    ratio = np.median(ci32) / np.median(ci64)
    assert 0.8 < ratio < 1.25, ratio


def _run_env(extra_env, out):
    code = _SCRIPT.format(repo=REPO, x64=False, out=out)
    env = dict(os.environ, PXMCMC_PLATFORM="cpu", **extra_env)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    with np.load(out) as z:
        return z["mean"], z["ci"]


def test_f32_bf16_storage_posterior_parity(tmp_path):
    """CI-parity gate for the bf16-storage fast path (PXMCMC_MATMUL_PRECISION
    =bfloat16 / PXMCMC_PALLAS_DTYPE=bfloat16 + fused Pallas gradient): the
    posterior mean and credible-interval widths match the f32 chain within
    Monte-Carlo tolerance.  This is the gate that justifies the bench's
    throughput-first bf16 configuration (BENCH.md round 5)."""
    mean32, ci32 = _run_env({}, os.path.join(str(tmp_path), "a.npz"))
    mean16, ci16 = _run_env(
        {
            "PXMCMC_PALLAS_DTYPE": "bfloat16",
            "PXMCMC_GRAM_PALLAS": "1",
            "PXMCMC_PALLAS_BIG_MIN": "8",
        },
        os.path.join(str(tmp_path), "b.npz"),
    )
    scale = np.abs(mean32).max()
    assert np.abs(mean32 - mean16).max() / scale < 0.05, (
        np.abs(mean32 - mean16).max() / scale
    )
    ratio = np.median(ci16) / np.median(ci32)
    assert 0.8 < ratio < 1.25, ratio

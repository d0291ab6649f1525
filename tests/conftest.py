"""Shared fixtures.

Mirrors the reference test strategy (``/root/reference/tests/conftest.py``):
small bandlimit L=10, B=2, J_min=2, random conjugate-symmetric bandlimited
real signal, analysis/synthesis parametrisation, scalar/vector sigma cases.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
paths execute without TPU hardware (standard JAX trick, SURVEY.md §4).
x64 is enabled so numerical identities hold to machine precision; separate
f32 tolerance tests cover the TPU production dtype.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir)))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

from pxmcmc_tpu.ops import sht


@pytest.fixture
def L():
    return 10


@pytest.fixture
def B():
    return 2


@pytest.fixture
def J_min():
    return 2


@pytest.fixture(params=["analysis", "synthesis"])
def setting(request):
    return request.param


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def make_real_flm(L, rng, spin=0):
    """Random conjugate-symmetric flm -> real bandlimited MW map (ref conftest.py:35-49)."""
    flm = np.zeros(L * L, dtype=complex)
    for el in range(abs(spin), L):
        flm[sht.elm2ind(el, 0)] = rng.standard_normal()
        for m in range(1, el + 1):
            a = rng.standard_normal() + 1j * rng.standard_normal()
            flm[sht.elm2ind(el, m)] = a
            flm[sht.elm2ind(el, -m)] = (-1) ** m * np.conj(a)
    return flm


@pytest.fixture
def simpledata_lm(L, rng):
    return make_real_flm(L, rng)


@pytest.fixture
def simpledata(simpledata_lm, L):
    basis = sht.get_basis(L, 0, use_disk_cache=False)
    f = np.asarray(sht.inverse(simpledata_lm, basis)).real
    return f.flatten()


@pytest.fixture(params=["scalar", "vector"])
def sig_d(request, L):
    if request.param == "scalar":
        return 0.1
    return np.full(L * (2 * L - 1), 0.1)

import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from pxmcmc_tpu.ops import sht, sampling

L = 16
rng = np.random.default_rng(0)
for spin in (0, 2):
    basis = sht.get_basis(L, spin, use_disk_cache=False)
    flm = rng.standard_normal(L*L) + 1j*rng.standard_normal(L*L)
    for ind in range(L*L):
        el, m = sht.ind2elm(ind)
        if el < abs(spin): flm[ind] = 0
    f = sht.inverse(jnp.asarray(flm), basis)
    flm2 = sht.forward(f, basis)
    print(f"spin {spin} roundtrip err:", np.abs(np.asarray(flm2) - flm).max())
    g = rng.standard_normal((L, 2*L-1)) + 1j*rng.standard_normal((L, 2*L-1))
    lhs = np.vdot(g, np.asarray(sht.inverse(jnp.asarray(flm), basis)))
    rhs = np.vdot(np.asarray(sht.inverse_adjoint(jnp.asarray(g), basis)), flm)
    print(f"spin {spin} inverse adjoint dot:", abs(lhs - rhs))
    h = rng.standard_normal(L*L) + 1j*rng.standard_normal(L*L)
    lhs = np.vdot(h, np.asarray(sht.forward(jnp.asarray(g), basis)))
    rhs = np.vdot(np.asarray(sht.forward_adjoint(jnp.asarray(h), basis)), g)
    print(f"spin {spin} forward adjoint dot:", abs(lhs - rhs))

from scipy.special import sph_harm_y
basis = sht.get_basis(L, 0, use_disk_cache=False)
flm = rng.standard_normal(L*L) + 1j*rng.standard_normal(L*L)
f = np.asarray(sht.inverse(jnp.asarray(flm), basis))
thetas, phis = sampling.sample_positions(L)
f_direct = np.zeros((L, 2*L-1), complex)
for ind in range(L*L):
    el, m = sht.ind2elm(ind)
    f_direct += flm[ind] * sph_harm_y(el, m, thetas[:,None], phis[None,:])
print("direct sum vs inverse:", np.abs(f - f_direct).max())
fr = np.asarray(sht.inverse(jnp.asarray(conj := flm, dtype=complex), basis))
# s2_integrate on a real bandlimited map (make conj-symmetric flm)
flm_sym = np.zeros(L*L, complex)
for el in range(L):
    flm_sym[sht.elm2ind(el,0)] = rng.standard_normal()
    for m in range(1, el+1):
        a = rng.standard_normal() + 1j*rng.standard_normal()
        flm_sym[sht.elm2ind(el,m)] = a
        flm_sym[sht.elm2ind(el,-m)] = (-1)**m * np.conj(a)
freal = np.asarray(sht.inverse(jnp.asarray(flm_sym), basis))
print("imag residue of real map:", np.abs(freal.imag).max())
I = sampling.s2_integrate(freal.real.reshape(-1), L)
print("s2_integrate err:", abs(I - np.sqrt(4*np.pi)*flm_sym[0].real))

r"""Device-mesh helpers for chain-parallel sampling.

The scaling axis of this framework is *chains* (SURVEY.md §2b): thousands of
independent MCMC chains are vmapped per chip and sharded across a
``Mesh(devices, ('chains',))``.  State arrays carry the chain axis first, so
a single ``NamedSharding(mesh, P('chains'))`` on the state pytree lets XLA
partition every step of the jitted sampler and insert ICI collectives only
where cross-chain reductions (R-hat, credible intervals) ask for them.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="chains") -> Mesh:
    """1-D mesh over (the first n) local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def chain_sharding(mesh: Mesh, axis_name="chains") -> NamedSharding:
    """Shard the leading (chain) axis, replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def shard_chain_pytree(tree, mesh: Mesh, axis_name="chains"):
    """Place every array in a state pytree with its chain axis sharded.

    Scalars / rank-0 leaves are replicated.
    """
    sh = chain_sharding(mesh, axis_name)
    rep = NamedSharding(mesh, P())

    def place(x):
        x = jax.numpy.asarray(x)
        return jax.device_put(x, sh if x.ndim >= 1 else rep)

    return jax.tree_util.tree_map(place, tree)


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host initialisation (``jax.distributed.initialize`` wrapper).

    On single-host runs this is a no-op; on a pod slice call it once per host
    before building the mesh so ``jax.devices()`` spans hosts (ICI/DCN
    collectives are then inserted by XLA exactly as in the single-host case).
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )

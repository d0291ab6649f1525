r"""HDF5 saving/loading of MCMC runs.

Schema parity with ``/root/reference/pxmcmc/saving.py``: tracked quantities
as datasets, run parameters + user kwargs as attributes.  Multi-chain runs
(beyond-reference) keep a chain axis; single-chain runs are squeezed to the
reference's (nsamples, nparams) layout so reference post-processing scripts
read both.
"""
from __future__ import annotations

import os

import h5py
import numpy as np


def _squeeze_chain(arr):
    """Drop a singleton chain axis (nsamples, 1, ...) -> (nsamples, ...)."""
    a = np.asarray(arr)
    if a.ndim >= 2 and a.shape[1] == 1:
        return a[:, 0]
    return a


def save_mcmc(mcmc, params, outpath, filename="outputs", **kwargs):
    """Save a finished run (ref ``saving.py:5-36``).

    :param mcmc: a :class:`pxmcmc_tpu.mcmc.PxMCMC` after ``run()``
    :param params: the :class:`pxmcmc_tpu.mcmc.PxMCMCParams` used
    :param outpath: output directory
    :param filename: filename without extension
    :param kwargs: extra attributes to store
    """
    os.makedirs(outpath, exist_ok=True)
    with h5py.File(os.path.join(outpath, f"{filename}.hdf5"), "w") as f:
        if hasattr(mcmc, "logPi"):
            f.create_dataset("logposterior", data=_squeeze_chain(mcmc.logPi))
        if hasattr(mcmc, "preds"):
            f.create_dataset("predictions", data=_squeeze_chain(mcmc.preds))
        if hasattr(mcmc, "chain"):
            f.create_dataset("chain", data=_squeeze_chain(mcmc.chain))
        if hasattr(mcmc, "L2s"):
            f.create_dataset("L2s", data=_squeeze_chain(mcmc.L2s))
        if hasattr(mcmc, "priors"):
            f.create_dataset("priors", data=_squeeze_chain(mcmc.priors))
        if getattr(mcmc, "acceptance_trace", None) is not None:
            f.create_dataset(
                "acceptances", data=_squeeze_chain(mcmc.acceptance_trace), dtype="i1"
            )
        if getattr(mcmc, "deltas_trace", None) is not None:
            f.create_dataset("deltas", data=_squeeze_chain(mcmc.deltas_trace))
        # track='summary' / 'summary_pixel' / 'map' products (device-side
        # streaming moments + P^2 sketches + running MAP; beyond-reference)
        # — the production path for runs whose thinned chains would not fit
        # host RAM
        for name in (
            "posterior_mean", "posterior_var", "ci_range",
            "posterior_mean_pix", "posterior_var_pix", "ci_range_pix",
        ):
            if hasattr(mcmc, name):
                f.create_dataset(name, data=np.asarray(getattr(mcmc, name)))
        if getattr(mcmc, "MAP_X", None) is not None:
            f.create_dataset("MAP", data=np.asarray(mcmc.MAP_X))
            f.create_dataset("MAP_logposterior", data=np.asarray(mcmc.MAP_logpi))

        for attr, val in params.__dict__.items():
            f.attrs[attr] = val
        spilled = []
        for k, v in kwargs.items():
            arr = np.asarray(v)
            if arr.nbytes > 16384:
                # HDF5 caps attributes at 64 KB; big run metadata (e.g. the
                # L=256 noise realisation) becomes a dataset instead.  The
                # reference writes every kwarg as an attr (saving.py:33-35),
                # which only works at toy bandlimits.
                name = k if k not in f else k + "_meta"
                f.create_dataset(name, data=arr)
                spilled.append(f"{k}:{name}")
            else:
                f.attrs[k] = v
        if spilled:
            # Record where each spilled kwarg went so readers see one
            # namespace again: load_mcmc merges these datasets back into
            # the params dict under their original keys.
            f.attrs["_spilled_attrs"] = spilled


def load_mcmc(path):
    """Load datasets + attrs of a saved run into plain dicts (beyond-reference).

    Kwargs that ``save_mcmc`` spilled from attrs to datasets (HDF5's 64 KB
    attribute cap) are merged back into the attrs dict under their original
    keys, so consumers see the same namespace regardless of value size.
    """
    with h5py.File(path, "r") as f:
        data = {k: np.asarray(f[k]) for k in f.keys()}
        attrs = dict(f.attrs)
    for entry in attrs.pop("_spilled_attrs", []):
        key, _, dset = str(entry).partition(":")
        if dset in data:
            attrs[key] = data.pop(dset)
    return data, attrs

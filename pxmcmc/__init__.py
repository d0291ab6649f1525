"""Drop-in compatibility alias: ``import pxmcmc`` -> :mod:`pxmcmc_tpu`.

Scripts written against the reference package (``from pxmcmc.mcmc import
MYULA`` etc.) run unmodified on this TPU-native implementation.
"""
import sys as _sys

import pxmcmc_tpu as _impl
from pxmcmc_tpu import (  # noqa: F401
    diagnostics,
    forward,
    measurements,
    mcmc,
    plotting,
    prior,
    saving,
    transforms,
    uncertainty,
    utils,
)

__version__ = _impl.__version__

for _name in (
    "mcmc", "forward", "measurements", "transforms", "prior",
    "saving", "uncertainty", "plotting", "utils", "diagnostics",
):
    _sys.modules[f"pxmcmc.{_name}"] = getattr(_impl, _name)

"""pxmcmc_tpu: TPU-native proximal MCMC for Bayesian inverse imaging on the sphere."""
import os as _os

import jax as _jax

# Explicit platform override that survives environments where JAX_PLATFORMS
# is pinned by a site plugin (set PXMCMC_PLATFORM=cpu to force host execution,
# e.g. in CI without TPU access).
if _os.environ.get("PXMCMC_PLATFORM"):
    _jax.config.update("jax_platforms", _os.environ["PXMCMC_PLATFORM"])

__version__ = "0.1.0"

from . import (  # noqa: E402,F401
    config,
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

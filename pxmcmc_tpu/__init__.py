"""pxmcmc_tpu: TPU-native proximal MCMC for Bayesian inverse imaging on the sphere."""
__version__ = "0.1.0"

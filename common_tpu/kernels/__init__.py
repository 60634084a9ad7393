"""MCMC/inference kernels (rebuild of the `kernels` sibling repo + the
north-star extras: blocked Gibbs, NUTS/HMC, SVI, SMC)."""

from common_tpu.kernels import blocked, gibbs, hmc, slice_, smc, svi  # noqa: F401

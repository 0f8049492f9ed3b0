"""MCMC moves as edit requests."""

from genjax_tpu.inference.requests.hmc import HMC, SafeHMC, selection_gradient
from genjax_tpu.inference.requests.mala import MALA
from genjax_tpu.inference.requests.rejuvenate import Rejuvenate

__all__ = ["HMC", "MALA", "Rejuvenate", "SafeHMC", "selection_gradient"]

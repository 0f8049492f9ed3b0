"""Distributions: the stochastic-probability interface and the standard
library of exact-density distributions (no TFP dependency)."""

from genjax_tpu.lang.distributions.distribution import (
    Distribution,
    DistributionTrace,
    ExactDensity,
    exact_density,
)
from genjax_tpu.lang.distributions.stdlib import *  # noqa: F401,F403
from genjax_tpu.lang.distributions.stdlib import __all__ as _stdlib_all

__all__ = [
    "Distribution",
    "DistributionTrace",
    "ExactDensity",
    "exact_density",
    *_stdlib_all,
]

"""Inference library: GenSP targets/algorithms, SMC, MCMC edit requests,
and variational inference."""

from genjax_tpu.inference.sp import (
    Algorithm,
    Marginal,
    SampleDistribution,
    Target,
    marginal,
)
from genjax_tpu.inference.smc import (
    ChangeTarget,
    Importance,
    ImportanceK,
    ParticleCollection,
    SMCAlgorithm,
    effective_sample_size,
    resample_indices,
)

__all__ = [
    "Algorithm",
    "ChangeTarget",
    "Importance",
    "ImportanceK",
    "Marginal",
    "ParticleCollection",
    "SMCAlgorithm",
    "SampleDistribution",
    "Target",
    "effective_sample_size",
    "marginal",
    "resample_indices",
]

"""Inference library: GenSP targets/algorithms, SMC, MCMC edit requests,
and variational inference."""

from genjax_tpu.inference.sp import (
    Algorithm,
    Marginal,
    SampleDistribution,
    Target,
    marginal,
)
from genjax_tpu.inference import vi
from genjax_tpu.inference.enumerative import (
    EnumerationResult,
    enumerate_posterior,
)
from genjax_tpu.inference.exact_testbed import (
    DiscreteHMMInferenceProblem,
    build_test_against_exact_inference,
)
from genjax_tpu.inference.adaptation import run_nuts, warmup_chains
from genjax_tpu.inference.predictive import posterior_predictive
from genjax_tpu.inference.svgd import run_svgd, svgd_step
from genjax_tpu.inference.diagnostics import ess_autocorr, split_rhat, summarize
from genjax_tpu.inference.data_smc import DataSMCResult, data_annealed_smc
from genjax_tpu.inference.mcmc import chain, mh, multi_chain
from genjax_tpu.inference.pf import (
    ParticleFilter,
    bootstrap_filter,
    particle_filter,
)
from genjax_tpu.inference.requests import (
    EllipticalSlice,
    HMC,
    MALA,
    Rejuvenate,
    SafeHMC,
    elliptical_slice_kernel,
    selection_gradient,
)
from genjax_tpu.inference.requests.nuts import NUTS, nuts_kernel
from genjax_tpu.inference.pt import (
    ParallelTemperingResult,
    parallel_tempering,
)
from genjax_tpu.inference.pmmh import (
    PMMHResult,
    gaussian_walk_proposal,
    pmmh,
)
from genjax_tpu.inference.smc2 import SMC2Result, smc2
from genjax_tpu.inference.pgibbs import (
    ParticleGibbsResult,
    TraceParticleGibbsResult,
    conditional_bootstrap_filter,
    particle_gibbs,
    trace_csmc,
    trace_particle_gibbs,
)
from genjax_tpu.inference.map_laplace import (
    LaplaceResult,
    MAPResult,
    laplace_approximation,
    map_optimize,
)
from genjax_tpu.inference.smc_sampler import (
    TemperedSMCResult,
    annealed_importance_sampling,
    tempered_smc,
    waste_free_tempered_smc,
)
from genjax_tpu.inference.trace_pf import TracePFResult, trace_particle_filter
from genjax_tpu.inference.transforms import (
    Bijector,
    constrain_choices,
    interval,
    positive,
    unconstrain_choices,
)
from genjax_tpu.inference.smc import (
    ChangeTarget,
    Importance,
    ImportanceK,
    ParticleCollection,
    SMCAlgorithm,
    effective_sample_size,
    resample_indices,
    resample_values,
    resample_values_rows,
)

__all__ = [
    "Algorithm",
    "ChangeTarget",
    "DiscreteHMMInferenceProblem",
    "EllipticalSlice",
    "EnumerationResult",
    "enumerate_posterior",
    "HMC",
    "MALA",
    "elliptical_slice_kernel",
    "MAPResult",
    "ParallelTemperingResult",
    "PMMHResult",
    "SMC2Result",
    "gaussian_walk_proposal",
    "pmmh",
    "smc2",
    "ParticleGibbsResult",
    "TraceParticleGibbsResult",
    "conditional_bootstrap_filter",
    "particle_gibbs",
    "trace_csmc",
    "trace_particle_gibbs",
    "LaplaceResult",
    "NUTS",
    "ParticleFilter",
    "TemperedSMCResult",
    "TracePFResult",
    "Bijector",
    "DataSMCResult",
    "data_annealed_smc",
    "constrain_choices",
    "interval",
    "positive",
    "unconstrain_choices",
    "trace_particle_filter",
    "annealed_importance_sampling",
    "tempered_smc",
    "waste_free_tempered_smc",
    "bootstrap_filter",
    "particle_filter",
    "build_test_against_exact_inference",
    "ess_autocorr",
    "nuts_kernel",
    "posterior_predictive",
    "run_nuts",
    "run_svgd",
    "svgd_step",
    "split_rhat",
    "summarize",
    "warmup_chains",
    "vi",
    "Rejuvenate",
    "SafeHMC",
    "laplace_approximation",
    "map_optimize",
    "parallel_tempering",
    "chain",
    "mh",
    "multi_chain",
    "selection_gradient",
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
    "resample_values",
    "resample_values_rows",
]

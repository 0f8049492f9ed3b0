"""Reusable model families with exact oracles where available."""

from genjax_tpu.models.ssm import (
    kalman_filter,
    kalman_smoother,
    lgssm_grid_posterior,
    lgssm_model,
    nonlinear_tracking_model,
    simulate_lgssm_data,
)
from genjax_tpu.models.regression import hierarchical_regression
from genjax_tpu.models.mixture import gaussian_mixture
from genjax_tpu.models.hmm import hmm_bootstrap_filter, hmm_model

__all__ = [
    "gaussian_mixture",
    "hierarchical_regression",
    "hmm_bootstrap_filter",
    "hmm_model",
    "kalman_filter",
    "kalman_smoother",
    "lgssm_grid_posterior",
    "simulate_lgssm_data",
    "lgssm_model",
    "nonlinear_tracking_model",
]

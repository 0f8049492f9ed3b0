"""Discrete-HMM generative model (the sampled counterpart of the exact
``DiscreteHMM`` posterior oracle)."""

from __future__ import annotations

from genjax_tpu.lang.static import gen
from genjax_tpu.lang.distributions import categorical
from genjax_tpu.lang.distributions.discrete_hmm import (
    DiscreteHMMConfiguration,
)

__all__ = ["hmm_model"]


def hmm_model(config: DiscreteHMMConfiguration, n_steps: int):
    """Scanned HMM gen fn: latents at ``("chain", t, "z")`` (plus "z0"),
    observations at ``("chain", t, "x")`` (plus "x0")."""

    @gen
    def step(z, _):
        z_next = categorical(config.transition_logits[z]) @ "z"
        _ = categorical(config.observation_logits[z_next]) @ "x"
        return z_next, z_next

    @gen
    def hmm():
        z0 = categorical(config.prior_logits) @ "z0"
        _ = categorical(config.observation_logits[z0]) @ "x0"
        _ = step.scan(n=n_steps - 1)(z0, None) @ "chain"

    return hmm

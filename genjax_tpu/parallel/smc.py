"""Mesh-sharded SMC: particle ensembles laid out over a device mesh, with
log-Z̄ / ESS as mesh-wide reductions and distributed systematic resampling.

Entirely new scope vs. the reference (SURVEY §2.3 / §5: no distributed
backend exists there). Design per the scaling-book recipe: annotate the
particle axis with a sharding, let XLA turn ``logsumexp``/gathers into ICI
collectives, and use ``shard_map`` + ``ppermute``-free sorted-uniform
inversion for resampling (the ancestor gather is an all-to-all that XLA
schedules over ICI).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from genjax_tpu.gfi.choice_map import ChoiceMap
from genjax_tpu.inference.smc import ParticleCollection, resample_tree
from genjax_tpu.inference.sp import Target
from genjax_tpu.parallel.mesh import Mesh, NamedSharding, P, shard_leading_axis

__all__ = [
    "sharded_importance",
    "sharded_smc_step",
    "sharded_resample",
]


def sharded_importance(
    target: Target,
    k_particles: int,
    mesh: Mesh,
    axis_name: str = "particles",
) -> Callable[[jax.Array], ParticleCollection]:
    """Build a jittable function ``key -> ParticleCollection`` running
    K-particle importance sampling with the particle axis sharded over
    ``mesh[axis_name]``. Per-particle keys derive from ``fold_in`` so the
    result is bitwise-identical for any device layout."""

    def run(key: jax.Array) -> ParticleCollection:
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(k_particles)
        )
        keys = shard_leading_axis(keys, mesh, axis_name)
        trs, ws = jax.vmap(target.importance, in_axes=(0, None))(
            keys, ChoiceMap.empty()
        )
        trs = shard_leading_axis(trs, mesh, axis_name)
        ws = shard_leading_axis(ws, mesh, axis_name)
        return ParticleCollection(trs, ws, jnp.asarray(True))

    return run


def sharded_resample(
    collection: ParticleCollection,
    key: jax.Array,
    mesh: Mesh,
    axis_name: str = "particles",
    method: str = "systematic",
) -> ParticleCollection:
    """Systematic resampling of a sharded collection.

    The weight vector (K scalars) is small: the cumsum/searchsorted runs
    replicated (one all-gather of K floats over ICI); the ancestor gather of
    the particle state is the bandwidth-heavy step and stays sharded — XLA
    lowers it to an all-to-all along the particle axis."""
    n = collection.num_particles()
    new_particles = resample_tree(
        key, collection.get_log_weights(), collection.particles, n, method
    )
    new_particles = shard_leading_axis(new_particles, mesh, axis_name)
    logz = collection.get_log_marginal_likelihood_estimate()
    lw = shard_leading_axis(jnp.full((n,), logz), mesh, axis_name)
    return ParticleCollection(new_particles, lw, collection.is_valid)


def sharded_smc_step(
    target: Target,
    k_particles: int,
    mesh: Mesh,
    axis_name: str = "particles",
    ess_threshold: float = 0.5,
) -> Callable[[jax.Array], tuple[ParticleCollection, jax.Array]]:
    """One full sharded SMC step: importance-sample K particles, compute
    log-Z̄ and ESS (mesh-wide reductions), and resample when ESS falls below
    ``ess_threshold * K``. Returns ``(collection, logZ̄)``."""

    importance = sharded_importance(target, k_particles, mesh, axis_name)

    def step(key: jax.Array):
        key, res_key = jax.random.split(key)
        collection = importance(key)
        logz = collection.get_log_marginal_likelihood_estimate()
        ess = collection.effective_sample_size()
        resampled = sharded_resample(collection, res_key, mesh, axis_name)
        out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ess < ess_threshold * k_particles, a, b),
            resampled,
            collection,
        )
        return out, logz

    return step

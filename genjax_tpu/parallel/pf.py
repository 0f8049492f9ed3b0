"""Mesh-sharded particle filtering: the particle axis of
:func:`genjax_tpu.inference.pf.particle_filter` laid out over a device
mesh. Weight reductions (logZ/ESS) become ICI collectives; the ancestor
gather of resampling becomes an all-to-all that XLA schedules along the
particle axis (BASELINE config 4: 1M particles across hosts)."""

from __future__ import annotations

from typing import Callable

from genjax_tpu.inference.pf import particle_filter
from genjax_tpu.parallel.mesh import Mesh, shard_leading_axis

__all__ = ["sharded_particle_filter"]


def sharded_particle_filter(
    init: Callable,
    step: Callable,
    n_particles: int,
    mesh: Mesh,
    axis_name: str | tuple = "particles",
    ess_threshold: float = 0.5,
    resampling: str = "systematic",
    batched: bool = False,
):
    """Like :func:`particle_filter`, with the ensemble pinned to
    ``mesh[axis_name]`` throughout the scan. Per-particle keys derive from
    ``fold_in`` (non-batched path), so results are bitwise-identical
    across device layouts."""
    return particle_filter(
        init,
        step,
        n_particles,
        ess_threshold,
        resampling,
        batched=batched,
        shard_constraint=lambda tree: shard_leading_axis(
            tree, mesh, axis_name
        ),
    )

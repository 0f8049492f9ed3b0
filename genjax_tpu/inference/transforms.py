"""Support transforms (bijectors): run gradient-based samplers in
unconstrained space for positive / interval-constrained latents, with the
change-of-variables correction applied to the target log-density.

New scope (ROADMAP item): neither the reference nor round-1 NUTS handled
constrained supports — users had to reparameterize by hand.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from genjax_tpu.gfi.choice_map import ChoiceMap

__all__ = ["Bijector", "identity", "positive", "interval", "get_bijector",
           "constrain_choices", "unconstrain_choices"]


class Bijector(NamedTuple):
    """u (unconstrained) <-> x (constrained)."""

    forward: Callable   # u -> x
    inverse: Callable   # x -> u
    fldj: Callable      # u -> log |det d forward / du|  (summed)


identity = Bijector(
    forward=lambda u: u,
    inverse=lambda x: x,
    fldj=lambda u: jnp.zeros(()),
)

#: (0, ∞) via softplus (numerically tame both directions).
positive = Bijector(
    forward=lambda u: jax.nn.softplus(u),
    inverse=lambda x: x + jnp.log(-jnp.expm1(-x)),
    fldj=lambda u: jnp.sum(jax.nn.log_sigmoid(u)),
)


def interval(low: float, high: float) -> Bijector:
    """(low, high) via scaled sigmoid."""
    width = high - low

    return Bijector(
        forward=lambda u: low + width * jax.nn.sigmoid(u),
        inverse=lambda x: jax.scipy.special.logit((x - low) / width),
        fldj=lambda u: jnp.sum(
            jnp.log(width) + jax.nn.log_sigmoid(u)
            + jax.nn.log_sigmoid(-u)
        ),
    )


_NAMED = {"identity": identity, "positive": positive}


def get_bijector(spec) -> Bijector:
    if isinstance(spec, Bijector):
        return spec
    if isinstance(spec, str):
        return _NAMED[spec]
    if isinstance(spec, tuple) and len(spec) == 2:
        return interval(*spec)
    raise ValueError(f"Unknown bijector spec: {spec!r}")


def constrain_choices(chm_u: ChoiceMap, transforms: dict):
    """Map the (top-level) addresses listed in ``transforms`` from
    unconstrained to constrained values; returns ``(chm_x, sum_fldj)``."""
    fldj = jnp.zeros(())
    out = chm_u
    for addr, spec in transforms.items():
        bij = get_bijector(spec)
        u = chm_u[addr]
        x = bij.forward(u)
        fldj = fldj + bij.fldj(u)
        out = ChoiceMap.entry(x, addr) | out
    return out, fldj


def unconstrain_choices(chm_x: ChoiceMap, transforms: dict) -> ChoiceMap:
    """Inverse of :func:`constrain_choices` (no Jacobian)."""
    out = chm_x
    for addr, spec in transforms.items():
        bij = get_bijector(spec)
        x = chm_x[addr]
        out = ChoiceMap.entry(bij.inverse(x), addr) | out
    return out

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

from genjax_tpu.gfi.choice_map import (
    Choice,
    ChoiceMap,
    Empty,
    Indexed,
    Or,
    Static,
)

__all__ = ["Bijector", "identity", "positive", "interval", "simplex",
           "get_bijector", "constrain_choices", "unconstrain_choices",
           "infer_transforms"]


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


def _stick_breaking_offsets(km1):
    # Stan's offset: u = 0 maps to the uniform simplex.
    return -jnp.log(jnp.arange(km1, 0, -1, dtype=jnp.float32))


def _simplex_forward(u):
    """u ∈ R^{K-1} → x ∈ Δ^{K-1} (K components) via stick-breaking."""
    t = u + _stick_breaking_offsets(u.shape[-1])
    z = jax.nn.sigmoid(t)
    om = 1.0 - z
    cp = jnp.concatenate([jnp.ones(u.shape[:-1] + (1,)),
                          jnp.cumprod(om, axis=-1)], axis=-1)
    head = z * cp[..., :-1]
    return jnp.concatenate([head, cp[..., -1:]], axis=-1)


def _simplex_inverse(x):
    head = x[..., :-1]
    rem = jnp.concatenate(
        [jnp.ones(x.shape[:-1] + (1,)),
         1.0 - jnp.cumsum(head, axis=-1)[..., :-1]],
        axis=-1,
    )
    z = jnp.clip(head / rem, 1e-12, 1.0 - 1e-12)
    return jax.scipy.special.logit(z) - _stick_breaking_offsets(
        head.shape[-1]
    )


def _simplex_fldj(u):
    # Triangular Jacobian: |J| = Π_k σ'(t_k) · (remaining stick)_k.
    t = u + _stick_breaking_offsets(u.shape[-1])
    z = jax.nn.sigmoid(t)
    cp = jnp.concatenate([jnp.ones(u.shape[:-1] + (1,)),
                          jnp.cumprod(1.0 - z, axis=-1)[..., :-1]], axis=-1)
    return jnp.sum(
        jax.nn.log_sigmoid(t) + jax.nn.log_sigmoid(-t) + jnp.log(cp)
    )


#: Δ^{K-1} via stick-breaking (Stan-style offsets); note the unconstrained
#: side has K-1 dims for a K-component simplex — ``constrain_choices``
#: handles the shape change because raveling happens on the
#: unconstrained choice map.
simplex = Bijector(
    forward=_simplex_forward,
    inverse=_simplex_inverse,
    fldj=_simplex_fldj,
)


_NAMED = {"identity": identity, "positive": positive, "simplex": simplex}


def get_bijector(spec) -> Bijector:
    if isinstance(spec, Bijector):
        return spec
    if isinstance(spec, str):
        return _NAMED[spec]
    if isinstance(spec, tuple) and len(spec) == 2:
        return interval(*spec)
    raise ValueError(f"Unknown bijector spec: {spec!r}")


def _addr_path(addr) -> tuple:
    return addr if isinstance(addr, tuple) else (addr,)


def _map_at(chm: ChoiceMap, path: tuple, fn: Callable):
    """Structurally replace the leaf at ``path`` with ``fn(value)``,
    returning ``(new_chm, found)``. :class:`Indexed` nodes (Scan/Vmap
    choices) are transparent — the integer layer is not named in
    ``path``, and ``fn`` sees the whole stacked leaf (bijectors apply
    elementwise; their ``fldj`` sums over all dims, which is exactly the
    total change-of-variables term for independent lanes/steps).

    In-place leaf surgery (rather than an overlay merge) keeps the
    choice-map structure identical, so shape-changing bijectors
    (simplex: K-1 ↔ K) never leave stale leaves behind."""
    if isinstance(chm, Indexed):
        new_inner, found = _map_at(chm.inner, path, fn)
        return (
            Indexed(new_inner, chm.idx, chm.n) if found else chm
        ), found
    if not path:
        if isinstance(chm, Choice):
            return Choice(fn(chm.v)), True
        return chm, False
    if isinstance(chm, Static):
        comp, rest = path[0], path[1:]
        for i, (k, sub) in enumerate(zip(chm.keys, chm.submaps)):
            if k == comp:
                new_sub, found = _map_at(sub, rest, fn)
                if not found:
                    return chm, False
                submaps = (
                    chm.submaps[:i] + (new_sub,) + chm.submaps[i + 1:]
                )
                return Static(submaps, chm.keys), True
        return chm, False
    if isinstance(chm, Or):
        new_left, found = _map_at(chm.left, path, fn)
        if found:
            return Or(new_left, chm.right), True
        new_right, found = _map_at(chm.right, path, fn)
        return (Or(chm.left, new_right) if found else chm), found
    if isinstance(chm, (Empty, Choice)):
        return chm, False
    raise NotImplementedError(
        f"Support transforms through {type(chm).__name__} nodes are not "
        "supported (Switch/Filtered subtrees: ROADMAP)."
    )


def _apply_transforms(chm: ChoiceMap, transforms: dict,
                      direction: str):
    fldj = jnp.zeros(())
    out = chm
    for addr, spec in transforms.items():
        bij = get_bijector(spec)
        box = []

        def fn(v, bij=bij, box=box):
            if direction == "forward":
                box.append(bij.fldj(v))
                return bij.forward(v)
            return bij.inverse(v)

        out, found = _map_at(out, _addr_path(addr), fn)
        if not found:
            raise KeyError(
                f"Transform address {addr!r} not present in choice map."
            )
        if box:
            fldj = fldj + box[0]
    return out, fldj


def constrain_choices(chm_u: ChoiceMap, transforms: dict):
    """Map the addresses listed in ``transforms`` (flat, nested tuple
    paths, or paths through Scan/Vmap ``Indexed`` layers) from
    unconstrained to constrained values; returns ``(chm_x, sum_fldj)``."""
    return _apply_transforms(chm_u, transforms, "forward")


def unconstrain_choices(chm_x: ChoiceMap, transforms: dict) -> ChoiceMap:
    """Inverse of :func:`constrain_choices` (no Jacobian)."""
    out, _ = _apply_transforms(chm_x, transforms, "inverse")
    return out


def infer_transforms(trace, *, exclude=None) -> dict:
    """Derive a transforms dict automatically from the support metadata of
    the distributions in a (concrete) trace — walks nested ``@gen``
    subtraces; addresses of depth > 1 become tuple keys.

    ``exclude(addr) -> bool`` skips addresses (e.g. observed sites).
    Sites with no support metadata or non-float values are left
    untransformed; ``"simplex"`` maps to the stick-breaking bijector.
    New scope vs the reference (its HMC had no support handling at
    all)."""
    from genjax_tpu.lang.combinators.dimap import DimapTrace
    from genjax_tpu.lang.combinators.scan import ScanTrace
    from genjax_tpu.lang.combinators.vmap import VmapTrace
    from genjax_tpu.lang.distributions.distribution import DistributionTrace
    from genjax_tpu.lang.static import StaticTrace

    out: dict = {}

    def walk(tr, path):
        if isinstance(tr, StaticTrace):
            for addr, sub in zip(tr.addresses, tr.subtraces):
                walk(sub, path + (addr,))
        elif isinstance(tr, (ScanTrace, VmapTrace)):
            # The integer (step/lane) layer is transparent in transform
            # paths — ``_map_at`` descends through the Indexed node and
            # the bijector applies elementwise over the stacked leaf.
            walk(tr.inner, path)
        elif isinstance(tr, DimapTrace):
            # Dimap preserves the inner choice structure.
            walk(tr.inner, path)
        elif isinstance(tr, DistributionTrace):
            v = tr.get_retval()
            if not jnp.issubdtype(jnp.result_type(v), jnp.floating):
                return
            spec = tr.get_gen_fn().get_support(*tr.get_args())
            if spec is None:
                return
            if spec == "unit_interval":
                spec = (0.0, 1.0)
            addr = path[0] if len(path) == 1 else path
            if exclude is not None and exclude(addr):
                return
            out[addr] = spec
        # Switch subtraces are skipped (branch-dependent supports:
        # ROADMAP).

    walk(trace, ())
    return out

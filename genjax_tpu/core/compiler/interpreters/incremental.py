"""Incremental computation: a two-point change lattice (``NoChange`` /
``UnknownChange``), ``Diff``-decorated values, and a JVP-style jaxpr
interpreter that propagates change tangents. Powers ``edit``'s weight reuse
and argdiff-aware combinator updates.

Parity:
``/root/reference/src/genjax/_src/core/compiler/interpreters/incremental.py``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.tree_util as jtu

from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.compiler.staging import stage
from genjax_tpu.core.compiler.interpreters.environment import Environment

__all__ = [
    "ChangeTangent",
    "NoChange",
    "UnknownChange",
    "Diff",
    "incremental",
]


class ChangeTangent:
    """A point on the change lattice."""

    def __init__(self, name: str, changed: bool):
        self._name = name
        self.changed = changed

    def __repr__(self):
        return self._name

    def __or__(self, other: "ChangeTangent") -> "ChangeTangent":
        return UnknownChange if (self.changed or other.changed) else NoChange


NoChange = ChangeTangent("NoChange", False)
UnknownChange = ChangeTangent("UnknownChange", True)


@Pytree.dataclass
class Diff(Pytree):
    """A value paired with a change tangent.

    ``Diff`` nodes annotate pytrees at any level; the tree utilities below
    strip or inspect them.
    """

    primal: Any
    tangent: ChangeTangent = Pytree.static()

    # -- constructors -----------------------------------------------------

    @staticmethod
    def no_change(tree: Any) -> Any:
        """Annotate every leaf of ``tree`` as unchanged (existing ``Diff``
        annotations are stripped first, so annotations never nest)."""
        return Diff.tree_diff(Diff.tree_primal(tree), NoChange)

    @staticmethod
    def unknown_change(tree: Any) -> Any:
        """Annotate every leaf of ``tree`` as (possibly) changed."""
        return Diff.tree_diff(Diff.tree_primal(tree), UnknownChange)

    # -- tree utilities ---------------------------------------------------

    @staticmethod
    def tree_primal(tree: Any) -> Any:
        """Strip all ``Diff`` annotations, returning the primal tree."""

        def strip(v):
            return Diff.tree_primal(v.primal) if _is_diff(v) else v

        return jtu.tree_map(strip, tree, is_leaf=_is_diff)

    @staticmethod
    def tree_tangent(tree: Any) -> ChangeTangent:
        """Join all change tangents in ``tree`` (NoChange iff all NoChange).

        Leaves with no ``Diff`` annotation count as UnknownChange, matching
        the conservative default of the reference interpreter.
        """
        tangents: list[ChangeTangent] = []

        def visit(v):
            if _is_diff(v):
                tangents.append(v.tangent)
            else:
                tangents.append(UnknownChange)
            return v

        jtu.tree_map(visit, tree, is_leaf=_is_diff)
        out = NoChange
        for t in tangents:
            out = out | t
        return out

    @staticmethod
    def static_check_no_change(tree: Any) -> bool:
        return not Diff.tree_tangent(tree).changed

    @staticmethod
    def tree_diff(tree: Any, tangent: ChangeTangent) -> Any:
        return jtu.tree_map(
            lambda v: Diff(v, tangent), tree, is_leaf=_is_diff
        )

    def get_primal(self):
        return self.primal

    def get_tangent(self):
        return self.tangent


def _is_diff(x) -> bool:
    return isinstance(x, Diff)


def _default_propagation_rule(primitive, invals: list[Diff], **params):
    """If every input is unchanged, the output is unchanged; otherwise
    recompute on primals and mark outputs UnknownChange."""
    tangent = NoChange
    for v in invals:
        tangent = tangent | v.tangent
    primals = [v.primal for v in invals]
    subfuns, bind_params = primitive.get_bind_params(params)
    outs = primitive.bind(*subfuns, *primals, **bind_params)
    if not primitive.multiple_results:
        outs = [outs]
    return [Diff(o, tangent) for o in outs]


def eval_jaxpr_incremental(
    jaxpr, consts, flat_duals: list[Diff], rules: dict | None = None
) -> list[Diff]:
    rules = rules or {}
    env = Environment()
    for var, val in zip(jaxpr.constvars, consts):
        env[var] = Diff(val, NoChange)
    for var, val in zip(jaxpr.invars, flat_duals):
        env[var] = val if _is_diff(val) else Diff(val, UnknownChange)

    for eqn in jaxpr.eqns:
        invals = [
            v if _is_diff(v) else Diff(v, NoChange)
            for v in (env[var] for var in eqn.invars)
        ]
        rule = rules.get(eqn.primitive, _default_propagation_rule)
        outs = rule(eqn.primitive, invals, **eqn.params)
        for var, val in zip(eqn.outvars, outs):
            env[var] = val

    return [env[v] for v in jaxpr.outvars]


def incremental(fn: Callable):
    """``incremental(fn)(primals, tangents)`` — run ``fn`` with change
    propagation. ``tangents`` is a pytree of ``ChangeTangent`` matching the
    (leaf-level) structure of ``primals`` or a single tangent applied to all
    arguments. Returns a ``Diff``-annotated output tree.
    """

    def run(primals: tuple, tangents: Any, **kwargs):
        closed_jaxpr, (_, out_tree, _) = stage(fn)(*primals, **kwargs)
        flat_primals = jtu.tree_leaves(primals)
        if isinstance(tangents, ChangeTangent):
            flat_tangents = [tangents] * len(flat_primals)
        else:
            flat_tangents = jtu.tree_leaves(
                tangents, is_leaf=lambda x: isinstance(x, ChangeTangent)
            )
        duals = [Diff(p, t) for p, t in zip(flat_primals, flat_tangents)]
        flat_out = eval_jaxpr_incremental(
            closed_jaxpr.jaxpr, closed_jaxpr.consts, duals
        )
        return jtu.tree_unflatten(out_tree, flat_out)

    return run

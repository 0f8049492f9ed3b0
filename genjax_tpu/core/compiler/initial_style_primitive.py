"""Initial-style JAX primitives: custom primitives whose implementation,
abstract evaluation, and in/out pytree structure ride along in the bind
params, with MLIR lowering via ``mlir.lower_fun``.

Parity target:
``/root/reference/src/genjax/_src/core/compiler/initial_style_primitive.py``.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.tree_util as jtu
from jax.extend import core as jex_core
from jax.interpreters import ad, batching, mlir

__all__ = ["InitialStylePrimitive", "initial_style_bind"]


class InitialStylePrimitive(jex_core.Primitive):
    """A multiple-results primitive that evaluates the ``impl`` callable
    stored in its bind params, so new intrinsics need no per-primitive
    registration code."""

    def __init__(self, name: str):
        super().__init__(name)
        self.multiple_results = True

        def impl(*args, **params):
            return params["impl"](*args, **params)

        self.def_impl(impl)

        def abstract(*avals, **params):
            return params["abstract"](*avals, **params)

        self.def_abstract_eval(abstract)

        def batch_rule(vector_args, batch_axes, **params):
            impl_fn = functools.partial(params["impl"], **params)
            axes = tuple(batch_axes)
            batched = jax.vmap(impl_fn, in_axes=axes)(*vector_args)
            return batched, [0 for _ in batched]

        batching.primitive_batchers[self] = batch_rule

        def jvp_rule(primals, tangents, **params):
            impl_fn = functools.partial(params["impl"], **params)
            # Operands with symbolic-zero tangents (keys, ints, consts)
            # are closed over as constants — jax.jvp requires matching
            # primal/tangent structures and dtypes.
            diff_idx = [
                i for i, t in enumerate(tangents)
                if not isinstance(t, ad.Zero)
            ]
            if not diff_idx:
                outs = impl_fn(*primals)
                return outs, [ad.Zero.from_primal_value(o) for o in outs]

            def fn(*diffable):
                xs = list(primals)
                for i, v in zip(diff_idx, diffable):
                    xs[i] = v
                return impl_fn(*xs)

            return jax.jvp(
                fn,
                tuple(primals[i] for i in diff_idx),
                tuple(tangents[i] for i in diff_idx),
            )

        ad.primitive_jvps[self] = jvp_rule

        mlir.register_lowering(
            self, mlir.lower_fun(self.impl, multiple_results=True)
        )


def initial_style_bind(prim: InitialStylePrimitive, **extra_params):
    """Bind ``prim`` around a callable: ``initial_style_bind(p)(fn)(*args)``
    traces ``fn`` to a jaxpr once and binds the primitive with flattened
    args, carrying ``impl``/``abstract``/``in_tree``/``out_tree`` params."""

    def bind(fn: Callable):
        def wrapped(*args, **kwargs):
            closed_jaxpr, out_shape = jax.make_jaxpr(
                functools.partial(fn, **kwargs), return_shape=True
            )(*args)
            flat_args, in_tree = jtu.tree_flatten(args)
            out_tree = jtu.tree_structure(out_shape)
            num_consts = len(closed_jaxpr.consts)

            def impl(*flat, **params):
                consts = flat[:num_consts]
                rest = flat[num_consts:]
                return jax.core.eval_jaxpr(closed_jaxpr.jaxpr, consts, *rest)

            def abstract(*avals, **params):
                return [v.aval for v in closed_jaxpr.jaxpr.outvars]

            outs = prim.bind(
                *closed_jaxpr.consts,
                *flat_args,
                impl=impl,
                abstract=abstract,
                in_tree=in_tree,
                out_tree=out_tree,
                num_consts=num_consts,
                **extra_params,
            )
            return jtu.tree_unflatten(out_tree, outs)

        return wrapped

    return bind

"""``or_else``: two-branch switch on a boolean — derived from ``Switch`` +
``contramap``.

Parity target: ``/root/reference/src/genjax/_src/generative_functions/
combinators/or_else.py:23-84``.
"""

from __future__ import annotations

import jax.numpy as jnp

from genjax_tpu.gfi.gfn import GenerativeFunction
from genjax_tpu.lang.combinators.dimap import Dimap
from genjax_tpu.lang.combinators.switch import Switch

__all__ = ["OrElse", "or_else"]


def OrElse(if_fn: GenerativeFunction,
           else_fn: GenerativeFunction) -> GenerativeFunction:
    """Args: ``(bool_flag, if_args, else_args)``; runs ``if_fn`` when the
    flag is true, ``else_fn`` otherwise."""
    sw = Switch((if_fn, else_fn))

    def pre(flag, if_args, else_args):
        idx = jnp.asarray(jnp.logical_not(flag), jnp.int32)
        return (idx, if_args, else_args)

    return Dimap(sw, pre=pre)


def or_else(else_fn: GenerativeFunction):
    from genjax_tpu.core.argcheck import check_gen_fn

    check_gen_fn(else_fn, "or_else")
    def decorator(if_fn: GenerativeFunction):
        return OrElse(if_fn, else_fn)

    return decorator

"""``mix``: mixture-of-generative-functions — a categorical over branch
logits composed with ``Switch`` inside a ``@gen`` body.

Parity target: ``/root/reference/src/genjax/_src/generative_functions/
combinators/mixture.py:27-81`` (addresses: "mixture_component" for the
categorical draw, "mixture_branch" for the branch choices).
"""

from __future__ import annotations

from genjax_tpu.gfi.gfn import GenerativeFunction
from genjax_tpu.lang.combinators.switch import Switch
from genjax_tpu.lang.static import gen

__all__ = ["mix"]


def mix(*fns: GenerativeFunction) -> GenerativeFunction:
    """Args: ``(logits, branch0_args, branch1_args, ...)``; samples a
    component ~ categorical(logits), then that branch."""
    from genjax_tpu.core.argcheck import check_gen_fns

    check_gen_fns(fns, "mix")
    from genjax_tpu.lang.distributions import categorical

    sw = Switch(tuple(fns))

    @gen
    def mixture(logits, *branch_args):
        idx = categorical(logits) @ "mixture_component"
        return sw(idx, *branch_args) @ "mixture_branch"

    return mixture

"""Pretty rendering of framework objects: choice maps as address trees,
traces as summaries, generic pytrees with array abbreviations.

Parity target: the reference's treescope integration (``pretty()``,
``Pytree.render_html`` — ``pytree.py:220-224``, ``pretty.py``), re-done as
dependency-free text/HTML renderers.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import jax.tree_util as jtu

__all__ = ["pformat", "pprint", "render_choice_map", "render_html"]


def _abbrev(v: Any) -> str:
    try:
        arr = jnp.asarray(v)
    except (TypeError, ValueError):
        return repr(v)
    if arr.ndim == 0:
        return f"{arr}"
    return f"Array{tuple(arr.shape)}[{arr.dtype}]"


def render_choice_map(chm, indent: int = 0) -> str:
    """Render a ChoiceMap as an address tree."""
    from genjax_tpu.gfi.choice_map import (
        Choice, Empty, Filtered, Indexed, Or, Static, Switch,
    )
    from genjax_tpu.gfi.mask import Mask

    pad = "  " * indent
    if isinstance(chm, Empty):
        return f"{pad}(empty)"
    if isinstance(chm, Choice):
        v = chm.v
        if isinstance(v, Mask):
            return f"{pad}{_abbrev(v.value)} [masked by {_abbrev(v.flag)}]"
        return f"{pad}{_abbrev(v)}"
    if isinstance(chm, Static):
        lines = []
        for k, sub in zip(chm.keys, chm.submaps):
            inner = render_choice_map(sub, indent + 1)
            lines.append(f"{pad}{k!r}:\n{inner}")
        return "\n".join(lines)
    if isinstance(chm, Indexed):
        inner = render_choice_map(chm.inner, indent + 1)
        if chm.idx is None:
            # Canonical arange lanes (Scan/Vmap choices).
            try:
                label = f"[i = 0..{chm._n() - 1}]"
            except Exception:
                label = "[i = lanes]"
        else:
            label = f"[idx {_abbrev(chm.idx)}]"
        return f"{pad}{label}:\n{inner}"
    if isinstance(chm, Switch):
        lines = [f"{pad}switch(idx={_abbrev(chm.idx)}):"]
        for i, b in enumerate(chm.branches):
            lines.append(f"{pad}  branch {i}:")
            lines.append(render_choice_map(b, indent + 2))
        return "\n".join(lines)
    if isinstance(chm, Or):
        return (
            f"{pad}or:\n"
            + render_choice_map(chm.left, indent + 1)
            + "\n"
            + render_choice_map(chm.right, indent + 1)
        )
    if isinstance(chm, Filtered):
        return (
            f"{pad}filtered:\n"
            + render_choice_map(chm.inner, indent + 1)
        )
    return f"{pad}{chm!r}"


def pformat(obj: Any) -> str:
    """Render a framework object (Trace / ChoiceMap / pytree) as text."""
    from genjax_tpu.gfi.choice_map import ChoiceMap
    from genjax_tpu.gfi.gfn import Trace

    if isinstance(obj, Trace):
        lines = [
            f"{type(obj).__name__}(",
            f"  gen_fn = {type(obj.get_gen_fn()).__name__}",
            f"  score  = {_abbrev(obj.get_score())}",
            f"  retval = {_abbrev(obj.get_retval())}",
            "  choices:",
            render_choice_map(obj.get_choices(), indent=2),
            ")",
        ]
        return "\n".join(lines)
    if isinstance(obj, ChoiceMap):
        return render_choice_map(obj)
    leaves_lines = []
    for path, leaf in jtu.tree_flatten_with_path(obj)[0]:
        keystr = jtu.keystr(path)
        leaves_lines.append(f"  {keystr} = {_abbrev(leaf)}")
    return f"{type(obj).__name__}(\n" + "\n".join(leaves_lines) + "\n)"


def pprint(obj: Any) -> None:
    print(pformat(obj))


def render_html(obj: Any) -> str:
    """Minimal HTML rendering (monospace <pre> of the text form)."""
    import html

    return f"<pre>{html.escape(pformat(obj))}</pre>"


def pretty() -> None:
    """Install rich rendering (parity: reference ``pretty.py``, which
    registers treescope). Uses treescope when importable; otherwise the
    built-in text renderers in this module are already active."""
    try:
        import treescope  # type: ignore

        treescope.register_as_default()
        treescope.register_autovisualize_magic()
    except ImportError:
        pass

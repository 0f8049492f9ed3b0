"""Utilities: checkpointing, pretty rendering, profiling hooks."""

from genjax_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from genjax_tpu.utils.pretty import (
    pformat,
    pretty,
    pprint,
    render_choice_map,
    render_html,
)

__all__ = [
    "pformat",
    "pretty",
    "pprint",
    "render_choice_map",
    "render_html",
    "restore_checkpoint",
    "save_checkpoint",
]

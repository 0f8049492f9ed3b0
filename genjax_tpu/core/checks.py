"""Opt-in runtime checks via ``jax.experimental.checkify``.

Zero-cost by default; inside a ``do_checkify()`` context, ``optional_check``
stages a checkify assertion into the computation.

Parity: ``/root/reference/src/genjax/_src/checkify.py:22-33``.
"""

from __future__ import annotations

import contextlib
from typing import Callable

from jax.experimental import checkify

__all__ = ["do_checkify", "optional_check", "checks_enabled"]

_CHECKIFY_ENABLED: list[bool] = [False]


@contextlib.contextmanager
def do_checkify():
    """Context manager enabling staged runtime checks."""
    _CHECKIFY_ENABLED.append(True)
    try:
        yield
    finally:
        _CHECKIFY_ENABLED.pop()


def checks_enabled() -> bool:
    return _CHECKIFY_ENABLED[-1]


def optional_check(check: Callable[[], None]) -> None:
    """Run ``check`` (which should call ``checkify.check``) iff enabled."""
    if checks_enabled():
        check()

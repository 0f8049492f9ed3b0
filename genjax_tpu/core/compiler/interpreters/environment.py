"""Jaxpr-interpreter variable environment.

Parity:
``/root/reference/src/genjax/_src/core/compiler/interpreters/environment.py``.
"""

from __future__ import annotations

from typing import Any

from jax.extend import core as jex_core

__all__ = ["Environment"]


class Environment:
    """Mutable map from jaxpr ``Var`` (by count) to runtime values, with
    ``Literal`` passthrough."""

    def __init__(self):
        self.env: dict[int, Any] = {}

    def read(self, var) -> Any:
        if isinstance(var, jex_core.Literal):
            return var.val
        return self.env[var.count]

    def write(self, var, value: Any) -> Any:
        if isinstance(var, jex_core.Literal):
            return value
        self.env[var.count] = value
        return value

    def __getitem__(self, var):
        return self.read(var)

    def __setitem__(self, var, value):
        self.write(var, value)

    def __contains__(self, var) -> bool:
        if isinstance(var, jex_core.Literal):
            return True
        return var.count in self.env

    def copy(self) -> "Environment":
        new = Environment()
        new.env = self.env.copy()
        return new

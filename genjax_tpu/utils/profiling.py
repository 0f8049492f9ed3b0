"""Profiling hooks: Perfetto/TensorBoard traces of inference programs via
``jax.profiler`` (new scope — the reference has no profiler, SURVEY §5)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax

__all__ = ["profile_trace", "Timed"]


@contextlib.contextmanager
def profile_trace(logdir: str) -> Iterator[None]:
    """Capture a device trace viewable in Perfetto / TensorBoard:

        with profile_trace("/tmp/trace"):
            jax.block_until_ready(run(key))
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timed:
    """Wall-clock timing of jitted callables with device sync:

        t = Timed(fn); out = t(args); t.last_s
    """

    def __init__(self, fn):
        self.fn = fn
        self.last_s: float | None = None

    def __call__(self, *args, **kwargs):
        t0 = time.perf_counter()
        out = self.fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.last_s = time.perf_counter() - t0
        return out

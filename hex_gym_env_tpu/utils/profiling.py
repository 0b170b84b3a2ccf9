"""Profiling harness: jax.profiler traces + steady-state timing.

The reference's only performance tooling is a code comment
(``HexSingleGame.py:190``); this provides the TPU equivalents promised in
SURVEY.md §5: a ``block_until_ready`` wall-clock timer and an XLA profiler
trace capture usable with TensorBoard's profile plugin / xprof.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator

import jax


def _drain(out) -> None:
    """Wait until ``out`` is actually computed.

    ``jax.block_until_ready`` alone is not trustworthy on every backend (the
    tunneled-TPU plugin returns early from it); fetching one element forces a
    true round trip through the result.
    """
    jax.block_until_ready(out)
    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "ravel")]
    if leaves:
        jax.device_get(leaves[0].ravel()[:1])


def time_fn(fn: Callable, *args, warmup: int = 1, repeats: int = 5) -> dict:
    """Steady-state timing of a jitted callable (seconds per call).

    Each repeat is fully drained (see ``_drain``), so the figure includes one
    host round trip per call — subtract the tunnel RTT for pure device time,
    or time a fused multi-step program to amortize it.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
        _drain(out)
    dt = (time.perf_counter() - t0) / repeats
    return {"seconds_per_call": dt, "calls_per_s": 1.0 / dt}


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace") -> Iterator[None]:
    """Capture an XLA profiler trace: ``with trace("log/profile"): step()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)

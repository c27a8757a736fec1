"""Tracing / profiling utilities.

The reference has no profiling support at all (SURVEY.md §5 — only
torchsummary prints and tqdm postfix).  TPU-native observability:

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-viewable trace (xplane) directory;
- :func:`annotate` — named trace annotation for custom spans;
- :func:`time_jitted` — wall-time a jitted callable with proper
  ``block_until_ready`` semantics (compile excluded);
- :class:`StepTimer` — running steps/sec + items/sec for train loops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device trace into ``log_dir`` (TensorBoard 'profile' tab)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a trace (shows up on the host timeline)."""
    return jax.profiler.TraceAnnotation(name)


def time_jitted(fn: Callable, *args, iters: int = 10, warmup: int = 1,
                **kwargs) -> Dict[str, float]:
    """Time a (jitted) callable: compile+first-run cost and steady-state.

    Returns {'compile_s', 'mean_s', 'per_sec'}.
    """
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    mean_s = (time.perf_counter() - t0) / iters
    return {"compile_s": compile_s, "mean_s": mean_s, "per_sec": 1.0 / mean_s}


class StepTimer:
    """Running throughput meter for train loops (steps/sec, items/sec)."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self.steps = 0
        self.items = 0

    def update(self, n_items: int = 0) -> None:
        self.steps += 1
        self.items += n_items

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def steps_per_sec(self) -> float:
        return self.steps / max(self.elapsed, 1e-9)

    @property
    def items_per_sec(self) -> float:
        return self.items / max(self.elapsed, 1e-9)

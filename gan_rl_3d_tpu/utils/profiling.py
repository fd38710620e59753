"""Profiling and step timing.

The reference has no profiling at all (SURVEY.md §5: progress via tqdm, a
latency claim with no harness). Here:

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace of whatever runs inside it.
* ``StepTimer`` — cheap wall-clock EMA of step latency with true device
  synchronisation (host fetch — block_until_ready is unreliable on
  tunneled platforms; see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace into ``logdir`` (view in TensorBoard's
    profile plugin or Perfetto)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Force completion of every array in a pytree via a host fetch."""
    leaves = [x for x in jax.tree.leaves(tree) if isinstance(x, jax.Array)]
    if leaves:
        float(jnp.sum(leaves[-1].ravel()[0]))


class StepTimer:
    """Exponential-moving-average step timer.

    Usage:
        timer = StepTimer()
        with timer.step():      # sync boundary at enter and exit
            out = train_step(...)
            timer.observe(out)  # ensures out is real before exit
    """

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema_s: Optional[float] = None
        self.last_s: Optional[float] = None
        self._out = None

    def observe(self, tree) -> None:
        self._out = tree

    @contextlib.contextmanager
    def step(self) -> Iterator["StepTimer"]:
        t0 = time.perf_counter()
        yield self
        if self._out is not None:
            sync(self._out)
            self._out = None
        dt = time.perf_counter() - t0
        self.last_s = dt
        self.ema_s = dt if self.ema_s is None else (
            self.alpha * dt + (1 - self.alpha) * self.ema_s)

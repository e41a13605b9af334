"""Tracing / profiling instrumentation.

The reference has no profiler at all (SURVEY.md §5.1 — wall-clock prints
only); its only performance instrument is the analytic simulator. Here the
framework gets first-class instrumentation on the measured path:

- ``trace(logdir)``: context manager around ``jax.profiler.trace`` — dumps
  an XPlane/TensorBoard trace of every XLA/Pallas op executed inside.
  Activated in the CLIs/bench via --profile / ANT_TPU_PROFILE=<dir>.
- ``annotate(name)``: named region (shows as a band in the trace viewer).
- ``StepTimer``: wall-clock per-step statistics with a correct device
  fence (a device->host copy of a value depending on the computation —
  ``block_until_ready`` alone is not a reliable fence on remote-TPU
  backends).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List, Optional

import numpy as np

__all__ = ["trace", "annotate", "StepTimer", "maybe_trace", "fence",
           "profile_dir_from_env"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace into ``logdir`` (TensorBoard format)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def maybe_trace(logdir: Optional[str]):
    """trace() when a directory is given (CLI --profile plumbing),
    else a no-op."""
    if not logdir:
        yield None
        return
    with trace(logdir):
        yield logdir


def annotate(name: str):
    """Named trace region: ``with annotate('prefill'): ...``"""
    import jax
    return jax.profiler.TraceAnnotation(name)


def fence(x) -> None:
    """Block until ``x`` is computed, by fetching it to host."""
    import jax
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(leaves[0])


class StepTimer:
    """Per-step wall-clock stats around a jitted step function.

        timer = StepTimer()
        for batch in data:
            with timer.step():
                out = train_step(params, batch)
            timer.fence(out)      # optional: fold sync into the step
        print(timer.summary())
    """

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield self
        self.times.append(time.perf_counter() - t0)

    def fence(self, x) -> None:
        """Device fence attributed to the *previous* step."""
        t0 = time.perf_counter()
        import jax
        leaves = jax.tree_util.tree_leaves(x)
        if leaves:
            np.asarray(leaves[0])
        if self.times:
            self.times[-1] += time.perf_counter() - t0

    def summary(self, skip_warmup: int = 1) -> Dict[str, float]:
        ts = self.times[skip_warmup:] if len(self.times) > skip_warmup \
            else self.times
        if not ts:
            return {"steps": 0}
        arr = np.asarray(ts)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "total_s": float(arr.sum()),
        }


def profile_dir_from_env() -> Optional[str]:
    """ANT_TPU_PROFILE=<dir> turns tracing on for bench/CLIs."""
    return os.environ.get("ANT_TPU_PROFILE") or None

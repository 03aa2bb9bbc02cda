"""Profiling hooks: JAX profiler traces + stepwise timing.

The TPU-native upgrade of the reference's observability kit (SURVEY §5:
cuda-synchronized ``@timeit``, thop FLOPs, grad-norm probe). ``trace``
captures a TensorBoard-loadable profile of any code region;
``StepTimer`` aggregates per-step wall times with honest device barriers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax
import numpy as np

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    """``with profiling.trace('/tmp/trace'): step(...)`` -> TensorBoard
    profile (device timeline, HLO ops, memory)."""
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Collects per-step durations; ``summary()`` gives mean/p50/p95 ms.

    Uses ``jax.device_get`` on a probe value as the completion barrier (see
    utils.utility.timeit for why block_until_ready is not sufficient on
    relayed runtimes)."""

    def __init__(self):
        self.samples: list[float] = []
        self._t0 = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, probe=None) -> float:
        if probe is not None:
            jax.device_get(probe)
        dt = time.perf_counter() - self._t0
        self.samples.append(dt)
        return dt

    def summary(self) -> dict:
        if not self.samples:
            return {}
        arr = np.asarray(self.samples) * 1000.0
        return {"mean_ms": float(arr.mean()),
                "p50_ms": float(np.percentile(arr, 50)),
                "p95_ms": float(np.percentile(arr, 95)),
                "steps": len(arr)}

"""Misc utilities: one-hot, device-synchronized timing, CARLA class labels.

Mirrors the reference utils/utility.py surface (one_hot:20, timeit:30-60,
class_labels:63-87) with ``jax.block_until_ready`` replacing cuda synchronize.
"""

from __future__ import annotations

import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["one_hot", "timeit", "class_labels", "CLASS_NAMES"]


def one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    return jax.nn.one_hot(labels, num_classes)


def timeit(fn: Callable) -> Callable:
    """Decorator returning ``(elapsed_seconds, result)``; blocks on device work so
    the timing is honest (the TPU analog of torch.cuda.synchronize timing,
    reference utils/utility.py:30-60)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        # device_get is a device->host barrier; block_until_ready alone is not
        # sufficient on relayed runtimes (observed on the tunneled v5e).
        out = jax.device_get(out)
        return time.perf_counter() - t0, out

    return wrapper


# 23 CARLA 0.9.10 semantic segmentation classes (reference utils/utility.py:63-87)
CLASS_NAMES = [
    "Unlabeled", "Building", "Fence", "Other", "Pedestrian", "Pole",
    "RoadLine", "Road", "SideWalk", "Vegetation", "Vehicles", "Wall",
    "TrafficSign", "Sky", "Ground", "Bridge", "RailTrack", "GuardRail",
    "TrafficLight", "Static", "Dynamic", "Water", "Terrain",
]


def class_labels() -> dict:
    return {i: name for i, name in enumerate(CLASS_NAMES)}

"""DDPG replay memory (reference /root/reference/PMoE/model/replay_memory.py).

Instead of a Python list of namedtuples (which forces a per-field host gather +
H2D copy at every learn step), transitions live in preallocated numpy ring
buffers so sampling a batch is one fancy-index per field and a single
device_put — the host side of the TPU training pipeline.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

__all__ = ["Transition", "ReplayMemory"]


class Transition(NamedTuple):
    images: np.ndarray
    speed: np.ndarray
    command: np.ndarray
    action: np.ndarray
    reward: np.ndarray
    new_images: np.ndarray
    new_speed: np.ndarray
    new_command: np.ndarray
    done: np.ndarray


class ReplayMemory:
    """Uniform-sampling ring buffer with structure-of-arrays storage."""

    def __init__(self, capacity: int, rng: np.random.Generator | None = None):
        self.capacity = int(capacity)
        self.position = 0
        self._size = 0
        self._buffers: dict[str, np.ndarray] | None = None
        self._rng = rng or np.random.default_rng()

    def _init_buffers(self, transition: Transition) -> None:
        self._buffers = {}
        for name, value in transition._asdict().items():
            arr = np.asarray(value)
            self._buffers[name] = np.zeros(
                (self.capacity, *arr.shape), dtype=arr.dtype if arr.dtype != np.float64
                else np.float32)

    def push(self, *args) -> None:
        tr = Transition(*args)
        if self._buffers is None:
            self._init_buffers(tr)
        for name, value in tr._asdict().items():
            self._buffers[name][self.position] = np.asarray(value)
        self.position = (self.position + 1) % self.capacity
        self._size = min(self._size + 1, self.capacity)

    def sample(self, batch_size: int) -> Transition:
        """Batched Transition with a leading batch axis per field."""
        return self.sample_at(self.sample_indices(batch_size))

    def sample_indices(self, batch_size: int,
                       valid: np.ndarray | None = None) -> np.ndarray:
        """Uniform ring indices; ``valid`` (bool over the ring) restricts the
        draw — the device-replay path excludes entries whose frames were
        overwritten in the frame pool (models/rl_agent.py)."""
        if valid is None:
            return self._rng.choice(self._size, size=batch_size, replace=False)
        pool = np.flatnonzero(valid[:self._size])
        if len(pool) == 0:
            raise ValueError("no valid replay entries to sample")
        return self._rng.choice(pool, size=batch_size,
                                replace=len(pool) < batch_size)

    def sample_at(self, idx: np.ndarray) -> Transition:
        return Transition(**{k: v[idx] for k, v in self._buffers.items()})

    def __len__(self) -> int:
        return self._size

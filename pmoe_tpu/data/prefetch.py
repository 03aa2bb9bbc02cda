"""Host->device prefetch pipeline.

Replaces the reference's DataLoader workers + pin_memory H2D staging
(conf/stage_0.yaml:24, SURVEY §2.9 item 3): a background thread assembles the
next uint8 numpy batch while the TPU trains on the current one, and
``device_put`` (optionally sharded over the mesh's data axis) overlaps the copy
with compute. uint8 on the wire = 4x less PCIe/ICI traffic than float32;
normalization happens inside the jitted step.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax

from ..parallel.mesh import shard_batch

__all__ = ["DevicePrefetcher", "prefetch_to_device"]


class DevicePrefetcher:
    """Wrap a batch iterable; yields device-resident batches with ``depth``
    batches in flight."""

    def __init__(self, loader: Iterable, mesh=None, depth: int = 2):
        self.loader = loader
        self.mesh = mesh
        self.depth = max(1, depth)

    def _put(self, batch):
        if self.mesh is not None:
            return shard_batch(self.mesh, batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        sentinel = object()
        error: list = []

        def producer():
            try:
                for batch in self.loader:
                    q.put(self._put(batch))
            except BaseException as e:     # surface worker errors to consumer
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item

    def __len__(self) -> int:
        return len(self.loader)


def prefetch_to_device(loader: Iterable, mesh=None, depth: int = 2):
    return iter(DevicePrefetcher(loader, mesh=mesh, depth=depth))

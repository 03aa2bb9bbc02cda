"""Device-resident frame pool: the whole (decoded, cropped, resized) frame
set of a dataset lives in HBM as ONE uint8 array; batches carry int32 frame
indices and the (B, T) windows gather on device inside the jitted step.

Why: stage-2's sliding-window batches re-upload ~38 MB of pixels per step
(64 windows x 4 frames x 150 KB), which saturates a slow host->device link
long before the MXU does (measured on the tunneled v5e: ~34 MB/s sustained,
1.1 s/step of pure upload vs a 0.14 s device step). A 224x224 uint8 frame is
150 KB, so even a 100k-frame dataset is ~15 GB — datasets at the reference's
scale (conf/stage_2.yaml) fit v5e HBM next to the model. The same design the
DDPG replay already uses (models/rl_agent.py device frame pool): upload each
unique frame ONCE, gather windows by index on device.

The pool is uploaded in slabs through a donated dynamic_update_slice so peak
HBM is pool + one slab (not 2x pool).

Layout constraint (measured on v5e, round 5): gathering a 4-D
(F, H, W, 3) u8 pool makes XLA materialize a PADDED COPY of the whole pool
in the tiled layout its gather prefers ({2,1,3,0:T(8,128)(4,1)}, 1.14x) —
IN ANY program, even a standalone take — which capped the pool at ~6 GB on
a 16 GB chip. The pool is therefore stored FLATTENED as (F, H*W*3): a row
gather on a 2-D u8 array keeps the default layout (no copy; verified with
an 11.98 GiB pool + in-program conv consumer, 42.5 ms/step), and the
consumer reshapes rows back to (B, T, H, W, 3) — a free bitcast in
row-major. Ceiling is now the resident bytes themselves (~13 GB next to a
stage-2 step).
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DeviceFramePool", "IndexedSegPred", "unique_window_paths",
           "thin_to_frame_budget"]


def unique_window_paths(*datasets) -> List[str]:
    """Every frame path reachable through the datasets' ``.indices``
    (thinned/boosted windows resolve through indices, so unreachable
    windows contribute nothing), deduplicated, first-seen order."""
    paths: List[str] = []
    for ds in datasets:
        for i in dict.fromkeys(ds.indices.tolist()):
            paths.extend(ds.img_address[int(i)])
    return list(dict.fromkeys(paths))


def thin_to_frame_budget(train_set, val_set, budget_frames: int,
                         seg: int = 64, seed: int = 0) -> int:
    """Shrink the datasets until their unique-frame set fits ``budget_frames``
    (the device pool's HBM ceiling — round 5 post-mortem: a 99k-frame pool
    at 224x224 u8 is 13.9 GiB and the stage-2 step needs ~3 GiB of HLO temp
    on a 15.75 GiB v5e, so pools past ~80k frames OOM at compile time).

    Frames are dropped as CONTIGUOUS per-episode segments of ``seg`` frames:
    windows span T consecutive frames, so a contiguous drop frees ~1 frame
    per lost window (a scattered drop frees ~1 per T lost windows). Segments
    containing any frame of a PROTECTED window — turn commands (!= 4) or
    moving-brake onsets, the rare windows that carry the hard supervision —
    are never candidates. Both datasets' ``.indices`` are rebuilt in place to
    exclude windows touching dropped frames; returns the number of frames
    dropped (0 when already within budget)."""
    import json

    frames = unique_window_paths(train_set, val_set)
    excess = len(frames) - int(budget_frames)
    if excess <= 0:
        return 0
    protected: set = set()
    for i in dict.fromkeys(train_set.indices.tolist()):
        with open(train_set.measurements[int(i)]) as f:
            m = json.load(f)
        onset = (float(m.get("brake", 0.0)) > 0.05
                 and float(m.get("speed", 0.0)) >= 0.5)
        if int(m.get("command", 4)) != 4 or onset:
            protected.update(train_set.img_address[int(i)])
    by_ep: Dict[str, List[str]] = defaultdict(list)
    for p in frames:
        by_ep[str(Path(p).parent)].append(p)
    for fs in by_ep.values():
        fs.sort()
    rng = np.random.default_rng(seed)
    dropped: set = set()
    # adaptive granularity: start at ``seg`` (best frames-freed-per-window-
    # lost ratio), halve down to 8 when episodes are too short or too
    # turn-dense to yield enough full-size unprotected segments
    size = max(8, int(seg))
    while len(dropped) < excess and size >= 8:
        segments = []
        for fs in by_ep.values():
            run: List[str] = []
            for p in fs + [None]:           # None flushes the last run
                if p is None or p in dropped:
                    for a in range(0, len(run) - size + 1, size):
                        chunk = run[a: a + size]
                        if not any(q in protected for q in chunk):
                            segments.append(chunk)
                    run = []
                else:
                    run.append(p)
        rng.shuffle(segments)
        for chunk in segments:
            if len(dropped) >= excess:
                break
            dropped.update(chunk)
        size //= 2
    if len(dropped) < excess:
        raise ValueError(
            f"cannot reach pool budget: need to drop {excess} frames but "
            f"only {len(dropped)} are in unprotected segments — lower "
            f"seg, raise thin_stopped, or disable device_pool")
    for ds in (train_set, val_set):
        keep = [i for i in ds.indices.tolist()
                if not any(p in dropped for p in ds.img_address[int(i)])]
        ds.indices = np.asarray(keep, dtype=ds.indices.dtype)
    return len(dropped)


class DeviceFramePool:
    def __init__(self, paths: Sequence[str], crop=(125, 90),
                 resize=(224, 224), slab: int = 512, verbose: bool = True):
        from .dataset import crop_resize, imread
        from . import native

        self.paths: List[str] = list(dict.fromkeys(paths))   # unique, ordered
        self.path_to_id: Dict[str, int] = {
            p: i for i, p in enumerate(self.paths)}
        n = len(self.paths)
        H, W = int(resize[0]), int(resize[1])
        self.frame_shape = (H, W, 3)
        pool = jnp.zeros((n, H * W * 3), jnp.uint8)

        upd = jax.jit(
            lambda pool, chunk, off: jax.lax.dynamic_update_slice(
                pool, chunk, (off, 0)),
            donate_argnums=0)
        import time

        t0 = time.perf_counter()
        for off in range(0, n, slab):
            chunk_paths = self.paths[off: off + slab]
            if native.available():
                chunk = native.ingest_batch(chunk_paths, tuple(crop),
                                            (H, W))
            else:
                chunk = np.stack([
                    crop_resize(imread(p), crop, (H, W))
                    for p in chunk_paths
                ])
            chunk = chunk.astype(np.uint8).reshape(len(chunk_paths), -1)
            pool = upd(pool, jnp.asarray(chunk), jnp.int32(off))
            if verbose and (off // slab) % 16 == 0:
                done = min(off + slab, n)
                print(f"[frame-pool] {done}/{n} frames uploaded "
                      f"({done * H * W * 3 / 2**20:.0f} MiB, "
                      f"{time.perf_counter() - t0:.0f}s)", flush=True)
        pool.block_until_ready()
        self.array = pool
        if verbose:
            print(f"[frame-pool] resident: {n} frames, "
                  f"{n * H * W * 3 / 2**30:.2f} GiB HBM, "
                  f"built in {time.perf_counter() - t0:.0f}s", flush=True)

    def ids(self, paths: Sequence[str]) -> np.ndarray:
        return np.array([self.path_to_id[p] for p in paths], np.int32)


class IndexedSegPred:
    """Adapter over :class:`~pmoe_tpu.data.dataset.CarlaSegPred` (measurement
    mode) that replaces the pixel window with its frame-id window — the host
    loop moves 16 bytes per sample instead of 600 KB."""

    def __init__(self, dataset, pool: DeviceFramePool):
        assert dataset.load_measurements, (
            "IndexedSegPred wraps the stage-2 measurement mode")
        self.dataset = dataset
        self.pool = pool
        # only windows reachable through .indices: thinned windows
        # (thin_stopped) are absent from the pool by design
        self._windows = {int(i): pool.ids(dataset.img_address[int(i)])
                         for i in dict.fromkeys(dataset.indices.tolist())}

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, index: int):
        import json

        from .dataset import preprocess_measurements

        i = self.dataset.indices[index]
        with open(self.dataset.measurements[i]) as f:
            meas = json.load(f)
        return self._windows[i], preprocess_measurements(
            meas, self.dataset.speed_factor, self.dataset.n_commands)

"""Checkpoint store with the reference's stage-grafting semantics.

The reference saves dict checkpoints ``{epoch, iteration, model, optimizer, ...}``
to ``{name}-e{N}[-swa].pth`` plus a ``{prefix}-best.pth`` copy (utils/io.py:9-31),
and later stages restore sub-models with ``strict=False`` partial loading
(punet.py:40-50, moe.py:335-343). Here checkpoints are msgpack-serialized pytrees
and partial restore matches by pytree path, skipping missing or shape-mismatched
entries — the JAX analog of ``load_state_dict(strict=False)``.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
from flax import serialization
from flax import traverse_util

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "graft",
    "flatten_tree",
]

_SUFFIX = ".ckpt"


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    state: dict,
    is_best: bool,
    save_dir: str | Path,
    name: str,
    best_prefix: str | None = None,
) -> Path:
    """Serialize ``state`` to ``save_dir/name.ckpt``; if ``is_best`` also copy to
    ``{best_prefix}-best.ckpt`` (reference utils/io.py:9-31 naming contract)."""
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    path = save_dir / f"{name}{_SUFFIX}"
    payload = serialization.msgpack_serialize(_to_numpy(state))
    path.write_bytes(payload)
    if is_best:
        prefix = best_prefix or name.split("-")[0]
        shutil.copyfile(path, save_dir / f"{prefix}-best{_SUFFIX}")
    return path


def load_checkpoint(path: str | Path) -> dict:
    """Load a checkpoint as a raw nested dict (all leaves numpy)."""
    path = Path(path)
    if path.suffix != _SUFFIX and not path.exists():
        path = path.with_suffix(_SUFFIX)
    return serialization.msgpack_restore(path.read_bytes())


def flatten_tree(tree: Any) -> dict:
    if hasattr(tree, "items"):
        return traverse_util.flatten_dict(dict(tree), sep="/")
    return {"": tree}


def graft(target: Any, source: Any, verbose: bool = False) -> Any:
    """Partial restore: copy leaves of ``source`` into ``target`` wherever the
    pytree path exists in both AND shapes match; leave everything else at its
    current (e.g. freshly initialized) value. The JAX analog of
    ``load_state_dict(..., strict=False)`` used for cross-stage transfer.
    """
    tgt_flat = traverse_util.flatten_dict(
        serialization.to_state_dict(target), sep="/"
    )
    src_flat = traverse_util.flatten_dict(
        serialization.to_state_dict(source) if not isinstance(source, dict)
        else source, sep="/"
    )
    hits, misses = 0, 0
    for k, v in src_flat.items():
        if k in tgt_flat and tuple(np.shape(v)) == tuple(np.shape(tgt_flat[k])):
            tgt_flat[k] = v
            hits += 1
        else:
            misses += 1
    if verbose:
        print(f"[graft] restored {hits} tensors, skipped {misses}")
    restored = traverse_util.unflatten_dict(tgt_flat, sep="/")
    return serialization.from_state_dict(target, restored)

"""Deterministic weight/input synthesis shared by the golden-fixture generator
(tools/make_golden.py, which drives the torch reference) and the parity tests
(tests/test_golden.py, which drive our flax modules).

Every tensor is a pure function of its (torch state_dict) NAME and shape, so
the generator and the tests materialize bit-identical arrays without storing
the weights themselves — only the reference's recorded activations plus a
names+shapes manifest are checked in (small .npz/.json)."""

from __future__ import annotations

import json
import zlib
from pathlib import Path

import numpy as np

GOLDEN_DIR = Path(__file__).resolve().parent / "golden"


def _rng(tag: str) -> np.random.Generator:
    return np.random.default_rng(zlib.crc32(tag.encode()) & 0xFFFFFFFF)


def tensor_for(name: str, shape) -> np.ndarray:
    """Deterministic value for a torch state_dict entry."""
    shape = tuple(int(s) for s in shape)
    r = _rng("w:" + name)
    if name.endswith("num_batches_tracked"):
        return np.zeros(shape, np.int64)
    if name.endswith("running_var"):
        return r.uniform(0.5, 1.5, shape).astype(np.float32)
    if name.endswith("running_mean"):
        return (r.standard_normal(shape) * 0.1).astype(np.float32)
    if len(shape) >= 2:
        # conv/linear weights: fan-in scaling keeps activations O(1) through
        # deep stacks so fp32 accumulation noise stays within tolerance
        fan_in = int(np.prod(shape[1:]))
        return (r.standard_normal(shape) / np.sqrt(fan_in)).astype(np.float32)
    # 1-d: BN scale near 1, biases small
    if name.endswith(".weight"):
        return (1.0 + 0.2 * r.standard_normal(shape)).astype(np.float32)
    return (r.standard_normal(shape) * 0.1).astype(np.float32)


def state_dict_for(manifest: dict) -> dict:
    """{name: shape} -> {name: ndarray} via :func:`tensor_for`."""
    return {name: tensor_for(name, shape) for name, shape in manifest.items()}


def image_for(tag: str, shape) -> np.ndarray:
    """Float input in [0, 1] (NCHW in the generator; transpose for flax)."""
    return _rng("x:" + tag).uniform(0.0, 1.0, shape).astype(np.float32)


def normal_for(tag: str, shape, scale: float = 1.0) -> np.ndarray:
    return (_rng("n:" + tag).standard_normal(shape) * scale).astype(np.float32)


def mask_for(tag: str, shape, num_classes: int = 23) -> np.ndarray:
    return _rng("m:" + tag).integers(0, num_classes, shape).astype(np.int64)


def save_manifest(manifests: dict) -> None:
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    with open(GOLDEN_DIR / "manifest.json", "w") as f:
        json.dump(manifests, f, indent=1, sort_keys=True)


def load_manifest() -> dict:
    with open(GOLDEN_DIR / "manifest.json") as f:
        return json.load(f)


def save_outputs(case: str, **arrays) -> None:
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(GOLDEN_DIR / f"{case}.npz",
                        **{k: np.asarray(v) for k, v in arrays.items()})


def load_outputs(case: str) -> dict:
    with np.load(GOLDEN_DIR / f"{case}.npz") as z:
        return {k: z[k] for k in z.files}

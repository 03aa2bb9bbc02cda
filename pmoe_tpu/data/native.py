"""ctypes bindings to the native C++ frame-ingest library.

The TPU-native replacement for the reference's per-worker Python decode chain
(SURVEY §0: "a C++ host-side frame ingest/preprocess path where the Python
reference uses OpenCV/PIL/imgaug on CPU workers"). Gracefully unavailable when
the shared library is not built — callers fall back to the cv2 path.

Build once with ``make -C native`` (auto-attempted on first use).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

__all__ = ["ingest_batch", "available", "build"]

_REPO_ROOT = Path(__file__).resolve().parents[2]
_LIB_PATH = _REPO_ROOT / "native" / "libframe_ingest.so"
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def build() -> bool:
    """Compile the shared library (g++ + libpng)."""
    try:
        subprocess.run(["make", "-C", str(_REPO_ROOT / "native")],
                       check=True, capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists() and os.environ.get("PMOE_NATIVE_BUILD", "1") == "1":
        build()
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.pmoe_ingest_batch.restype = ctypes.c_int
        lib.pmoe_ingest_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def ingest_batch(paths: Sequence[str], crop=(125, 90), resize=(224, 224),
                 channels: int = 3,
                 num_threads: int | None = None) -> np.ndarray:
    """Decode+crop+resize a list of PNGs into a (N, H, W, C) uint8 array using
    the native thread pool. Raises RuntimeError if the library is missing or
    any frame fails."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native frame-ingest library not available "
                           "(run `make -C native`)")
    n = len(paths)
    if num_threads is None:
        # oversubscribe: PNG decode is IO + zlib bound
        num_threads = max(8, 4 * (os.cpu_count() or 1))
    out_h, out_w = int(resize[0]), int(resize[1])
    blob = b""
    offsets = np.zeros(n, dtype=np.int64)
    parts = []
    off = 0
    for i, p in enumerate(paths):
        b = str(p).encode() + b"\x00"
        offsets[i] = off
        parts.append(b)
        off += len(b)
    blob = b"".join(parts)
    out = np.empty((n, out_h, out_w, channels), dtype=np.uint8)
    failures = lib.pmoe_ingest_batch(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        int(crop[0]), int(crop[1]), out_h, out_w, channels,
        int(num_threads),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if failures:
        raise RuntimeError(f"native ingest failed for {failures}/{n} frames")
    return out if channels > 1 else out[..., 0]

"""Host data-pipeline throughput: native C++ ingest vs the cv2 fallback.

Measures decode+crop(125,90)+resize(224) images/sec over synthetic 800x600
PNGs (the collector's camera size) — the host-side stage the reference runs
in 8 DataLoader worker processes (SURVEY §1.4) and this framework runs in
the C++ thread pool (native/frame_ingest.cpp) behind the double-buffered
device prefetcher.

Usage: python tools/bench_data_pipeline.py [--n 96] [--repeats 3]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import cv2

    from pmoe_tpu.data import native
    from pmoe_tpu.data.dataset import crop_resize

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i in range(args.n):
            img = rng.integers(0, 255, (600, 800, 3), np.uint8)
            p = str(Path(td) / f"f{i:04d}.png")
            cv2.imwrite(p, img)
            paths.append(p)

        if native.available():
            out_n = native.ingest_batch(paths)
            best_native = 0.0
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                out_n = native.ingest_batch(paths)
                best_native = max(best_native,
                                  args.n / (time.perf_counter() - t0))
            print(f"native ingest: {best_native:.1f} imgs/s "
                  f"(batch {args.n}, out {out_n.shape})")
        else:
            print("native ingest: UNAVAILABLE (make -C native failed?)")
            out_n = None

        best_cv2 = 0.0
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out_c = np.stack([
                crop_resize(cv2.imread(p)[..., ::-1], (125, 90), (224, 224))
                for p in paths])
            best_cv2 = max(best_cv2, args.n / (time.perf_counter() - t0))
        print(f"cv2 fallback:  {best_cv2:.1f} imgs/s (batch {args.n})")
        if out_n is not None:
            # same geometry; decoders/interpolators may differ by ±1 LSB
            diff = np.abs(out_n.astype(np.int16) - out_c.astype(np.int16))
            print(f"max |native - cv2| = {diff.max()}  "
                  f"mean = {diff.mean():.3f}")
            print(f"speedup: {best_native / best_cv2:.2f}x "
                  f"({(best_native / best_cv2 - 1) * 100:.0f}%)")


if __name__ == "__main__":
    main()

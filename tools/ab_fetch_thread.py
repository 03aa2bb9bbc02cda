"""Paired A/B of the closed-loop fetch thread (PMOE_PIPELINE_FETCH_THREAD)
on the tunneled v5e: interleaved diag_closed_loop windows, off/on/off, so
relay drift shows up as disagreement between the two off blocks.

Usage: python -u tools/ab_fetch_thread.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
from tools.bench_sweep import diag_closed_loop


def main():
    bench.health_check()
    print("== session up ==", flush=True)
    for tag, flag, reps in (("off#1", "0", 3), ("on", "1", 3),
                            ("off#2", "0", 2)):
        os.environ["PMOE_PIPELINE_FETCH_THREAD"] = flag
        print(f"-- fetch_thread {tag} --", flush=True)
        diag_closed_loop(repeats=reps)


if __name__ == "__main__":
    main()

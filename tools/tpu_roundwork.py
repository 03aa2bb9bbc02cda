"""One long-lived TPU session running this round's measurement queue.

The tunneled relay charges minutes of session init and wedges ~8 min if a
client is killed, so batch every pending measurement into ONE process
(see memory: axon-relay-session-discipline):

  1. paired A/B of the W-pair-packed UNet level 1 (stage-0 and stage-1)
  2. hlo_stats profile of the stage-2 train step (post-pool-kernel top ops)

Usage: python -u tools/tpu_roundwork.py [--skip-ab] [--skip-profile]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-ab", action="store_true")
    ap.add_argument("--skip-profile", action="store_true")
    ap.add_argument("--windows", type=int, default=5)
    args = ap.parse_args()

    bench.health_check()
    print("== session up ==", flush=True)

    # ordered cheapest-first so a short recovery window still yields the
    # highest-value results: stage-0 A/B -> stage-2 profile -> stage-1 A/B
    if not args.skip_ab:
        from tools.bench_sweep import ab_packed_unet
        ab_packed_unet(windows=args.windows, only="stage0")

    if not args.skip_profile:
        # ab_packed_unet pops PMOE_PACKED_STEM on exit, so this profiles the
        # production (auto: packed-on-TPU) stage-2 graph
        from tools import profile_stage2
        sys.argv = ["profile_stage2", "--batch", "64"]
        profile_stage2.main()

    if not args.skip_ab:
        from tools.bench_sweep import ab_packed_unet
        ab_packed_unet(windows=args.windows, only="stage1")


if __name__ == "__main__":
    main()

"""One long-lived TPU session running this round's measurement queue.

The tunneled relay charges minutes of session init and wedges ~8 min if a
client is killed, so batch every pending measurement into ONE process
(see memory: axon-relay-session-discipline):

  1. paired A/B of the BN+ReLU epilogues fused into the Pallas pool
     (fused_packed_pool_bn) vs the XLA epilogue chain, stage-2 batch 64
  2. (--ab / --profile flags retain the earlier UNet-packing A/B and the
     stage-2 hlo_stats profile)

Usage: python -u tools/tpu_roundwork.py [--skip-ab] [--skip-profile]
                                        [--unet-ab]
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
    ap.add_argument("--unet-ab", action="store_true",
                    help="also rerun the UNet-packing A/B (already measured)")
    ap.add_argument("--windows", type=int, default=5)
    args = ap.parse_args()

    bench.health_check()
    print("== session up ==", flush=True)

    # ordered cheapest-first so a short recovery window still yields the
    # highest-value results
    if not args.skip_ab:
        from tools.bench_sweep import ab_bn_pool
        ab_bn_pool(windows=args.windows)

    if not args.skip_profile:
        # profiles the production stage-2 graph (packed stem + fused
        # BN-pool, both auto-on for TPU)
        from tools import profile_stage2
        sys.argv = ["profile_stage2", "--batch", "64"]
        profile_stage2.main()

    if args.unet_ab:
        from tools.bench_sweep import ab_packed_unet
        ab_packed_unet(windows=args.windows, only="stage0")
        ab_packed_unet(windows=args.windows, only="stage1")


if __name__ == "__main__":
    main()

"""One long-lived TPU session running this round's measurement queue.

The tunneled relay charges minutes of session init and wedges ~8 min if a
client is killed, so batch every pending measurement into ONE process
(see memory: axon-relay-session-discipline):

  1. pairwise stage-3 A/B (tools/bench_sweep.ab_stage3): defaults vs
     punet-unpacked / stem-unpacked / xla-pool — decides whether the
     round-5 packing defaults help or hurt the NORTH-STAR DDPG learn
     step at batch 64 (the round-5 stage-0/1 A/B split by batch size:
     packing won at bs 10, lost at bs 64; stage 3 runs the seg U-Net at
     bs 64 x 5 frames, so the "auto-on inside the rollout" default is
     unproven there).  Pairwise because two full agents fit in HBM,
     three don't (logs/roundwork_s3ab_133137.log RESOURCE_EXHAUSTED).
  2. bench.bench_stage3 spot under the winning config, for the honest
     steps/s + MFU record (canonical FLOPs incl. scan correction).

Usage: python -u tools/tpu_roundwork.py [--windows N]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--tasks", default="s3ab,s3",
                    help="comma list: s3ab, s3, infer_ab, loop_diag, loop")
    args = ap.parse_args()
    tasks = [t.strip() for t in args.tasks.split(",") if t.strip()]

    bench.health_check()
    print("== session up ==", flush=True)

    for task in tasks:
        print(f"-- task: {task} --", flush=True)
        if task == "s3ab":
            from tools.bench_sweep import ab_stage3
            ab_stage3(windows=args.windows, steps=args.steps)
        elif task == "s3":
            s3_steps, s3_flops = bench.bench_stage3()
            print(f"stage3 defaults: {s3_steps:.3f} steps/s  "
                  f"{s3_flops / 1e12:.2f} TF/step  "
                  f"MFU={s3_flops * s3_steps / 197e12:.4f}", flush=True)
        elif task == "infer_ab":
            from tools.bench_sweep import ab_infer
            ab_infer(windows=args.windows)
        elif task == "loop_diag":
            from tools.bench_sweep import diag_closed_loop
            diag_closed_loop(repeats=args.windows)
        elif task == "loop":
            fps = bench.bench_closed_loop_fps()
            print(f"closed_loop_fps (bench.py path): {fps:.1f}", flush=True)
        else:
            print(f"unknown task {task!r}; skipping", flush=True)


if __name__ == "__main__":
    main()

"""Round-5 TPU session queue v2: PMoE chain -> stage-3 DDPG runs A/B ->
pmoe grid slice -> leaderboard -> moe grid slice -> (if time) union
fine-tune, ordered by VERDICT r4 priority, each phase an ISOLATED
SUBPROCESS so a failure (e.g. a compile OOM) frees its HBM instead of
poisoning every later phase — the v1 failure mode: the failed train
phase's 11.5 GiB pool stayed referenced through the traceback and every
subsequent phase died RESOURCE_EXHAUSTED.

Committed so the full benchmark recipe is regenerable by one command
(VERDICT r4 missing #5). Phase artifacts land under logs/ (survives
session boundaries); present artifacts are reused on rerun.

Usage: python -u tools/r5_session.py [--deadline-min 80]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

T0 = time.perf_counter()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="logs/nocrash_r5")
    ap.add_argument("--chain-dir", default="logs/pmoe_r5")
    ap.add_argument("--chain-data", default=None,
                    help="dataset for the chain stages (default "
                         "<workdir>/data; a curriculum-balanced episode "
                         "subset keeps the link-bound streaming stages "
                         "inside a tight TPU budget — tonight's link ran "
                         "15 MB/s and full-data stage-0 alone cost 20 min)")
    ap.add_argument("--arch", default="resnet18")
    ap.add_argument("--deadline-min", type=float, default=80.0)
    ap.add_argument("--ddpg-steps", type=int, default=5000)
    ap.add_argument("--skip", nargs="*", default=[])
    args = ap.parse_args()
    work = Path(args.workdir)
    chain_dir = Path(args.chain_dir)

    def left():
        return args.deadline_min - (time.perf_counter() - T0) / 60.0

    def phase(name, est_min, argv):
        if name in args.skip:
            print(f"[r5] SKIP {name} (--skip)", flush=True)
            return False
        rem = left()
        if rem < est_min:
            print(f"[r5] SKIP {name}: needs ~{est_min:.0f} min, "
                  f"{rem:.0f} min left", flush=True)
            return False
        print(f"[r5] >>> {name} (est {est_min:.0f} min, {rem:.0f} min left)",
              flush=True)
        t = time.perf_counter()
        r = subprocess.run([sys.executable, "-u"] + [str(a) for a in argv],
                           cwd=REPO)
        status = "done" if r.returncode == 0 else f"FAILED rc={r.returncode}"
        print(f"[r5] <<< {name} {status} in "
              f"{(time.perf_counter() - t) / 60:.1f} min", flush=True)
        return r.returncode == 0

    ckpt = work / "ckpt_union" / "moe-best.ckpt"   # session-1 T1 (base BC)
    conf = work / "benchmark_agent_u2.yaml"        # written by v1, -> T1

    # -- 1. PMoE production chain + spots (VERDICT r4 item 1a) --------------
    pmoe_conf = chain_dir / "pmoe_agent.yaml"
    pmoe_ckpt = chain_dir / "ckpt" / "PMoE-best.ckpt"
    phase("pmoe_chain", 30,
          ["tools/pmoe_chain.py", "--workdir", chain_dir, "--data",
           args.chain_data or work / "data", "--moe-ckpt", ckpt,
           "--epochs0", 1,
           "--epochs1", 1, "--epochs-punet", 1, "--epochs-pmoe", 1,
           "--stride1", 5, "--stride2", 5, "--spot-routes", 4,
           "--slots", 4])

    # -- 2a. stage-3 run A: the reference recipe VERBATIM (delta-only) ------
    if pmoe_conf.exists():
        phase("ddpg_refA", 7,
              ["tools/ddpg_improve.py", "--workdir", work, "--ckpt",
               pmoe_ckpt, "--pmoe-conf", pmoe_conf, "--steps", 150,
               "--routes", 0, "--lr", 1e-5, "--ckpt-name", "pmoe-refA",
               "--curve-name", "ddpg_refA_curve.json"])

    # -- 2b. stage-3 run B: minimal repair (mixers + gates trainable), ------
    #        BC replay warm-start (VERDICT r4 item 1b)
    if pmoe_conf.exists():
        b = int(min(args.ddpg_steps, max(2000, (left() - 22) * 60 / 0.21)))
        phase("ddpg_runB", b * 0.21 / 60 + 7,
              ["tools/ddpg_improve.py", "--workdir", work, "--ckpt",
               pmoe_ckpt, "--pmoe-conf", pmoe_conf, "--steps", b,
               "--learn-every", 10, "--bc-warmstart", 1000,
               "--critic-warmup", 1200, "--lr", 1e-4, "--routes", 6,
               "--exclude-freeze", "lat_weights", "long_weights", "alpha",
               "--ckpt-name", "pmoe-ddpg",
               "--curve-name", "ddpg_runB_curve.json",
               "--out", "logs/nocrash_r5/ddpg_r5_table.md"])

    # -- 3. pmoe grid slice (VERDICT r4 item 2): cell-robin + cap -----------
    if pmoe_conf.exists() and left() > 9:
        cap = int(max(36, min(900, (left() - 16) * 60 / 8.0)))
        phase("grid_pmoe", cap * 8.0 / 60 + 2,
              ["tools/pmoe_grid.py", "--conf", pmoe_conf, "--workdir",
               chain_dir, "--fleet", 8, "--max-ticks", 3500,
               "--max-episodes", cap, "--out", "RESULTS_PMOE.md"])

    # -- 4. leaderboard soak (VERDICT r4 item 4) ----------------------------
    phase("leaderboard", 8,
          ["tools/leaderboard_benchmark.py", "--conf", conf, "--out",
           "LEADERBOARD_RESULTS.md", "--checkpoint-json",
           "logs/leaderboard_r5/simulation_results.json",
           "--max-ticks", 3000])

    # -- 5. moe grid slice (VERDICT r4 item 3 evidence) ---------------------
    if left() > 6:
        cap = int(max(36, min(900, (left() - 4) * 60 / 4.3)))
        phase("grid_moe", cap * 4.3 / 60 + 2,
              ["tools/pmoe_grid.py", "--conf", conf, "--workdir", work,
               "--fleet", 10, "--max-ticks", 3500, "--max-episodes", cap,
               "--label", f"moe ({args.arch}), r5 BC checkpoint",
               "--out", "RESULTS_R5.md"])

    # -- 6. union fine-tune (dagger1 data) — only if the night is long ------
    phase("finetune_union", 26,
          ["tools/train_and_spot.py", "--workdir", work, "--data",
           "data_union", "--ckpt", "ckpt_u2", "--epochs", 7,
           "--load", ckpt, "--spot-routes", 8])

    print(f"[r5] queue complete, {left():.0f} min to deadline", flush=True)


if __name__ == "__main__":
    main()

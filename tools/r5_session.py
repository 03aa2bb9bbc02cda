"""Round-5 TPU session queue: union retrain -> spots -> PMoE chain ->
stage-3 DDPG (reference recipe run A + minimal-repair run B) -> grid slices
-> leaderboard, in ONE long-lived TPU process (relay discipline), each phase
resumable and deadline-aware.

Committed so the full benchmark recipe is regenerable by one command
(VERDICT r4 missing #5 — the r4 recipe lived in an untracked script and
died with its session). Phase artifacts land under logs/ (which survives
session boundaries); anything missing is rebuilt on rerun, anything present
is reused.

Usage: python -u tools/r5_session.py [--deadline-min 140] [--workdir ...]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/pmoe_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

spec = importlib.util.spec_from_file_location(
    "nb", REPO / "tools" / "nocrash_benchmark.py")
nb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(nb)

T0 = time.perf_counter()


def left_min(args) -> float:
    return args.deadline_min - (time.perf_counter() - T0) / 60.0


def phase(args, name: str, est_min: float, fn, *fargs):
    rem = left_min(args)
    if rem < est_min:
        print(f"[r5] SKIP {name}: needs ~{est_min:.0f} min, "
              f"{rem:.0f} min left", flush=True)
        return None
    print(f"[r5] >>> {name} (est {est_min:.0f} min, {rem:.0f} min left)",
          flush=True)
    t = time.perf_counter()
    try:
        out = fn(*fargs)
        print(f"[r5] <<< {name} done in "
              f"{(time.perf_counter() - t) / 60:.1f} min", flush=True)
        return out
    except Exception:
        traceback.print_exc()
        print(f"[r5] !!! {name} FAILED after "
              f"{(time.perf_counter() - t) / 60:.1f} min — continuing",
              flush=True)
        return None


def build_union(work: Path) -> Path:
    union = work / "data_union"
    union.mkdir(exist_ok=True)
    n = 0
    for src_dir, tag in ((work / "data", "base"),
                        (work / "dagger1", "dag1")):
        for ep in sorted(src_dir.iterdir()):
            if not (ep / "rgb").is_dir():
                continue
            dst = union / f"{tag}_{ep.name}"
            if not dst.exists():
                dst.symlink_to(ep.resolve())
            n += 1
    print(f"[r5] union dir: {n} episodes")
    return union


def train_union(args, work: Path) -> Path:
    ckpt = nb.train(work / "data_union", work / "ckpt_u2", args.arch,
                    args.epochs, 64)
    return ckpt


def spot(conf: Path, label: str, routes01=8, routes02=4):
    from train_and_spot import spot_eval

    out = {}
    for town, n in (("Town01", routes01), ("Town02", routes02)):
        import numpy as np

        rcs = spot_eval(conf, town, n, 8)
        out[town] = {"sr": 100 * float(np.mean(rcs == 100)),
                     "rc": float(rcs.mean()),
                     "per_route": rcs.round(1).tolist()}
    Path(f"logs/nocrash_r5/spot_{label}.json").write_text(
        json.dumps(out, indent=1))
    return out


def run_main(mod_path: Path, argv: list[str]):
    s = importlib.util.spec_from_file_location(mod_path.stem, mod_path)
    m = importlib.util.module_from_spec(s)
    s.loader.exec_module(m)
    old = sys.argv
    sys.argv = [str(mod_path)] + [str(a) for a in argv]
    try:
        m.main()
    finally:
        sys.argv = old


def grid_slice(args, conf: Path, results: Path, cap: int, out: str,
               arch_label: str):
    class A:
        towns = ["Town01", "Town02"]
        weathers = ["train", "test"]
        routes = None
        fleet = 10
        max_ticks = 3500
        traffic_order = "0,1,2"
        cell_robin = True
        max_episodes = cap

    results.mkdir(parents=True, exist_ok=True)
    nb.run_fleet_protocol(A, conf, results)
    nb.render(results, arch_label, out, echo=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="logs/nocrash_r5")
    ap.add_argument("--chain-dir", default="logs/pmoe_r5")
    ap.add_argument("--arch", default="resnet18")
    ap.add_argument("--epochs", type=int, default=9)
    ap.add_argument("--deadline-min", type=float, default=135.0)
    ap.add_argument("--ddpg-steps", type=int, default=10000)
    ap.add_argument("--skip", nargs="*", default=[],
                    help="phase names to skip")
    args = ap.parse_args()
    work = Path(args.workdir)
    chain_dir = Path(args.chain_dir)

    def want(name):
        return name not in args.skip

    # -- 1. union retrain (base 72-episode collect + DAgger round 1) --------
    if want("train"):
        phase(args, "union_dir", 0.2, build_union, work)
        ckpt = phase(args, "train_union", 34, train_union, args, work)
    else:
        ckpt = work / "ckpt_u2" / "moe-best.ckpt"
    ckpt = ckpt or work / "ckpt_u2" / "moe-best.ckpt"
    if not Path(ckpt).exists():
        # train failed/skipped: fall back to the surviving session-1 T1
        # checkpoint so the downstream phases still produce evidence
        fallback = work / "ckpt_union" / "moe-best.ckpt"
        print(f"[r5] no {ckpt}; falling back to {fallback}")
        ckpt = fallback
    conf = nb.write_agent_conf(work / "benchmark_agent_u2.yaml", ckpt,
                               args.arch)
    if want("spot"):
        phase(args, "spot_union", 4, spot, conf, "u2")

    # -- 2. PMoE production chain (VERDICT r4 item 1a) ----------------------
    pmoe_conf = chain_dir / "pmoe_agent.yaml"
    if want("chain"):
        phase(args, "pmoe_chain", 38, run_main,
              REPO / "tools" / "pmoe_chain.py",
              ["--workdir", chain_dir, "--data", work / "data",
               "--moe-ckpt", ckpt, "--epochs0", 2, "--epochs1", 1,
               "--epochs-punet", 1, "--epochs-pmoe", 1, "--stride1", 4,
               "--stride2", 4, "--spot-routes", 6, "--slots", 6])

    pmoe_ckpt = chain_dir / "ckpt" / "PMoE-best.ckpt"
    # -- 3a. stage-3 run A: the reference recipe VERBATIM (delta-only) ------
    if want("ddpgA") and pmoe_conf.exists():
        phase(args, "ddpg_refA", 8, run_main,
              REPO / "tools" / "ddpg_improve.py",
              ["--workdir", work, "--ckpt", pmoe_ckpt,
               "--pmoe-conf", pmoe_conf, "--steps", 150, "--routes", 0,
               "--lr", 1e-5, "--ckpt-name", "pmoe-refA",
               "--curve-name", "ddpg_refA_curve.json"])

    # -- 3b. stage-3 run B: minimal repair (mixers + gates trainable), ------
    #        BC replay warm-start, >=10k env steps (VERDICT r4 item 1b)
    if want("ddpgB") and pmoe_conf.exists():
        # size the env-step envelope to the time actually left: ~0.19 s per
        # env step at learn-every 10 (0.06 env + learn/10), floor 3000 so a
        # squeezed session still produces a meaningful run
        b_steps = int(min(args.ddpg_steps,
                          max(3000, (left_min(args) - 14) * 60 / 0.21)))
        phase(args, "ddpg_runB", b_steps * 0.21 / 60 + 6, run_main,
              REPO / "tools" / "ddpg_improve.py",
              ["--workdir", work, "--ckpt", pmoe_ckpt,
               "--pmoe-conf", pmoe_conf, "--steps", b_steps,
               "--learn-every", 10, "--bc-warmstart", 1200,
               "--critic-warmup", 1500, "--lr", 1e-4, "--routes", 8,
               "--exclude-freeze", "lat_weights", "long_weights", "alpha",
               "--ckpt-name", "pmoe-ddpg",
               "--curve-name", "ddpg_runB_curve.json",
               "--out", "logs/nocrash_r5/ddpg_r5_table.md"])

    # -- 3c. Town02 lights-ran diagnosis (VERDICT r4 weak #6) ---------------
    if want("lights"):
        phase(args, "lights_diag", 8, run_main,
              REPO / "tools" / "lights_diagnose.py",
              ["--conf", conf, "--routes", 5,
               "--out", "logs/lights_diag_r5.json"])

    # -- 4. grid slices (cell-robin + cap: every cell populated) ------------
    rem = left_min(args)
    if want("grid") and rem > 10:
        # ~4.3 s/episode measured for the moe fleet (r4 full grid);
        # give moe the larger slice, pmoe rest-minus-leaderboard
        moe_cap = int(max(60, min(900, (rem - 14) * 0.6 * 60 / 4.3)))
        phase(args, "grid_moe", moe_cap * 4.3 / 60 + 2, grid_slice, args,
              conf, work / "results_u2", moe_cap, "RESULTS_R5.md",
              f"moe ({args.arch}), union BC checkpoint")
    rem = left_min(args)
    if want("grid") and pmoe_conf.exists() and rem > 8:
        pmoe_cap = int(max(36, min(900, (rem - 8) * 60 / 8.0)))
        phase(args, "grid_pmoe", pmoe_cap * 8.0 / 60 + 2, grid_slice, args,
              pmoe_conf, chain_dir / "results", pmoe_cap,
              "RESULTS_PMOE.md", f"pmoe ({args.arch} MoE + PU-Net expert)")

    # -- 5. leaderboard soak with the round's BC checkpoint (item 4) --------
    if want("leaderboard"):
        phase(args, "leaderboard", 7, run_main,
              REPO / "tools" / "leaderboard_benchmark.py",
              ["--conf", conf, "--out", "LEADERBOARD_RESULTS.md",
               "--checkpoint-json",
               "logs/leaderboard_r5/simulation_results.json",
               "--max-ticks", 3000])

    print(f"[r5] queue complete, {left_min(args):.0f} min to deadline",
          flush=True)


if __name__ == "__main__":
    main()

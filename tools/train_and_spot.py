"""Train the NoCrash benchmark checkpoint and spot-check it closed-loop,
in ONE process (relay discipline: one long-lived TPU client).

Phases (each resumable/skippable):
1. stage-2 behavior cloning on the collected Town01 episodes
   (tools/nocrash_benchmark.py train recipe);
2. fleet spot eval: a few empty-traffic suite routes on Town01 (seen town)
   and Town02 (held out), reporting RC / SR per town.

Usage: python tools/train_and_spot.py [--workdir logs/nocrash_r3]
         [--epochs 15] [--arch resnet18] [--spot-routes 6] [--slots 8]
"""

from __future__ import annotations

import argparse
import importlib.util
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/pmoe_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

spec = importlib.util.spec_from_file_location(
    "nb", Path(__file__).resolve().parent / "nocrash_benchmark.py")
nb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(nb)


def spot_eval(conf_path: Path, town: str, n_routes: int, slots: int,
              max_ticks: int = 4000):
    from pmoe_tpu.eval.evaluate_nocrash import _CollectingStats
    from pmoe_tpu.eval.fleet import FleetNoCrashRunner, FleetTask
    from pmoe_tpu.eval.nocrash import default_suite_path, load_suite
    from pmoe_tpu.utils import get_conf

    cfg = get_conf(str(conf_path))
    routes = load_suite(default_suite_path(town))[:n_routes]
    tasks = [FleetTask(town, 0, 1, s, t) for s, t in routes]
    stats = _CollectingStats()
    runner = FleetNoCrashRunner(cfg, n_slots=min(slots, len(tasks)),
                                max_ticks=max_ticks)
    t0 = time.perf_counter()
    runner.run(tasks, stats)
    rcs = np.array([r[5] for r in stats.rows])
    print(f"[spot] {town} empty/w1 n={len(rcs)}: "
          f"SR={100 * float(np.mean(rcs == 100)):.0f}% "
          f"RC={float(rcs.mean()):.1f}% (per-route: {rcs.round(1).tolist()}) "
          f"wall={time.perf_counter() - t0:.0f}s")
    return rcs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="logs/nocrash_r3")
    ap.add_argument("--data", default="data",
                    help="dataset subdir of workdir (e.g. data_union for "
                         "BC + DAgger rounds)")
    ap.add_argument("--ckpt", default="ckpt")
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--arch", default="resnet18")
    ap.add_argument("--spot-routes", type=int, default=6)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--load", default="",
                    help="warm-start checkpoint (fine-tune: Learner "
                         "restore_from resumes weights, batch_stats, opt "
                         "state AND the epoch counter — set --epochs above "
                         "the loaded epoch or no training happens)")
    args = ap.parse_args()

    work = Path(args.workdir)
    if not args.skip_train:
        ckpt = nb.train(work / args.data, work / args.ckpt, args.arch,
                        args.epochs, args.batch, load=args.load)
    else:
        ckpt = work / args.ckpt / "moe-best.ckpt"
    conf = nb.write_agent_conf(work / "benchmark_agent.yaml", ckpt, args.arch)

    spot_eval(conf, "Town01", args.spot_routes, args.slots)
    spot_eval(conf, "Town02", max(args.spot_routes // 2, 2), args.slots)


if __name__ == "__main__":
    main()

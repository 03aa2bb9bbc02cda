"""Driving-quality A/B of the one-tick-latency pipeline (VERDICT r2 item 5).

The ImageAgent default applies the action computed from tick t-1's frame at
tick t (agents/image_agent.py module docstring) — that holds 20 Hz through a
high-RTT device link, but changes control semantics vs the reference's
same-tick loop. This tool runs the SAME checkpoint over the SAME routes and
seeds through the official sequential evaluator with ``pipeline: true`` vs
``false`` and reports per-route route completion + SR, so the default's
driving cost (if any) is measured, not assumed.

Usage: python tools/pipeline_ab.py [--conf logs/nocrash_r3/benchmark_agent.yaml]
         [--town Town01] [--routes 6] [--max-ticks 4000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/pmoe_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import yaml


def run_variant(conf, town, routes, max_ticks, pipeline: bool):
    from pmoe_tpu.agents.image_agent import ImageAgent
    from pmoe_tpu.eval.evaluate_nocrash import _CollectingStats
    from pmoe_tpu.eval.nocrash import NoCrashEvaluator, TRAFFIC_TABLES
    from pmoe_tpu.sim.fake_carla import FakeCarlaBackend
    from pmoe_tpu.utils import Config

    cfg = Config(dict(conf, pipeline=pipeline))
    backend = FakeCarlaBackend(town=town, img_width=800, img_height=600)
    stats = _CollectingStats()
    ev = NoCrashEvaluator(backend, stats, routes=routes, max_ticks=max_ticks,
                          verbose=False)
    table = TRAFFIC_TABLES.get(town, TRAFFIC_TABLES["Town01"])
    t0 = time.perf_counter()
    fps = []
    for route in routes:
        n0 = sum(r[7] for r in stats.rows)
        ev._run_episode(lambda: ImageAgent(cfg), town, 0, 1, route, table)
    wall = time.perf_counter() - t0
    backend.close()
    rcs = np.array([r[5] for r in stats.rows])
    ticks = sum(r[7] for r in stats.rows) * 20
    return rcs, ticks / wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", default="logs/nocrash_r3/benchmark_agent.yaml")
    ap.add_argument("--town", default="Town01")
    ap.add_argument("--routes", type=int, default=6)
    ap.add_argument("--max-ticks", type=int, default=4000)
    args = ap.parse_args()

    from pmoe_tpu.eval.nocrash import default_suite_path, load_suite

    conf = yaml.safe_load(Path(args.conf).read_text())
    routes = load_suite(default_suite_path(args.town))[:args.routes]

    print(f"[ab] {args.town} empty/w1 over {len(routes)} routes, "
          f"checkpoint {conf['model']['actor'].get('model_dir')}")
    rows = []
    # interleave off/on/off-style: pipeline state is per-agent, episodes are
    # deterministic given (route, seed), so one pass per variant suffices —
    # but run sync first and pipelined twice to expose fps variance
    for name, flag in (("sync", False), ("pipelined", True),
                       ("pipelined2", True)):
        rcs, fps = run_variant(conf, args.town, routes, args.max_ticks, flag)
        rows.append((name, rcs, fps))
        print(f"[ab] {name:11s}: SR={100 * float(np.mean(rcs == 100)):.0f}% "
              f"RC={float(rcs.mean()):.2f}% fps={fps:.1f} "
              f"per-route={rcs.round(1).tolist()}")
    sync_rc = rows[0][1]
    pipe_rc = rows[1][1]
    print(f"[ab] delta RC (pipelined - sync): "
          f"{float(pipe_rc.mean() - sync_rc.mean()):+.2f} pp; "
          f"SR delta {100 * float(np.mean(pipe_rc == 100) - np.mean(sync_rc == 100)):+.0f} pp")


if __name__ == "__main__":
    main()

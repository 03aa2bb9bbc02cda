"""Oracle upper bound for the NoCrash benchmark: drive the scripted expert
(the same policy that collects training data) through the official evaluator
over the suite routes and report RC / success / episode length.

The NoCrash north star conditions perf on success rates; before training a
checkpoint toward that bar, this tool establishes what the expert itself
scores under the identical protocol (criteria, timeouts, traffic). If the
expert cannot reach RC=100 on a route, no behavior-cloned agent will.

Usage: python tools/expert_oracle.py [--town Town01] [--traffic 0]
         [--weather 1] [--routes N] [--noise 0.0]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--town", default="Town01")
    ap.add_argument("--traffic", type=int, default=0)
    ap.add_argument("--weather", type=int, default=1)
    ap.add_argument("--routes", type=int, default=None)
    ap.add_argument("--noise", type=float, default=0.0)
    ap.add_argument("--max-ticks", type=int, default=4000)
    ap.add_argument("--expert", choices=["plain", "traffic"], default="plain",
                    help="plain = traffic-blind follower; traffic = "
                         "privileged TrafficAwareExpert (brakes for NPCs "
                         "and red lights)")
    args = ap.parse_args()

    from pmoe_tpu.agents.collector_agent import (CollectorAgent,
                                                 TrafficAwareExpert)
    from pmoe_tpu.eval.evaluate_nocrash import _CollectingStats
    from pmoe_tpu.eval.nocrash import (NoCrashEvaluator, TRAFFIC_TABLES,
                                       default_suite_path, load_suite)
    from pmoe_tpu.sim.fake_carla import FakeCarlaBackend

    backend = FakeCarlaBackend(town=args.town, img_width=800, img_height=600)
    routes = load_suite(default_suite_path(args.town))
    if args.routes:
        routes = routes[:args.routes]
    table = TRAFFIC_TABLES.get(args.town, TRAFFIC_TABLES["Town01"])
    tmp = tempfile.mkdtemp(prefix="oracle_")

    cls = TrafficAwareExpert if args.expert == "traffic" else CollectorAgent

    def factory():
        return cls({"out_dir": tmp, "episode": "oracle",
                    "noise_std": args.noise, "save_every": 10**9,
                    "backend": backend})

    stats = _CollectingStats()
    ev = NoCrashEvaluator(backend, stats, routes=routes,
                          max_ticks=args.max_ticks, verbose=True)
    ev.weathers = [args.weather]
    t0 = time.perf_counter()
    for route in routes:
        ev._run_episode(factory, args.town, args.traffic, args.weather,
                        route, table)
    rcs = np.array([row[5] for row in stats.rows])
    durs = np.array([row[7] for row in stats.rows])
    print(f"\n[oracle] {args.town} traffic={args.traffic} "
          f"weather={args.weather} n={len(rcs)}: "
          f"SR={100 * float(np.mean(rcs == 100)):.0f}% "
          f"RC_mean={float(rcs.mean()):.1f}% "
          f"game_s mean={float(durs.mean()):.1f} max={float(durs.max()):.1f} "
          f"wall={time.perf_counter() - t0:.0f}s")


if __name__ == "__main__":
    main()

"""CARLA-leaderboard routes benchmark entry point
(reference /root/reference/PMoE/eval/evaluate.py + runners/challenge_runner.py).

Usage: ``python -m pmoe_tpu.eval.evaluate [--config pmoe_tpu/conf/benchmark]
[--backend fake|carla] [--routes N] [--resume]``
"""

from __future__ import annotations

import argparse

from ..agents.image_agent import ImageAgent
from ..utils import get_conf
from .evaluate_nocrash import make_backend
from .leaderboard import LeaderboardEvaluator
from .route_indexer import RouteIndexer
from .statistics import StatisticsManager

__all__ = ["main"]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="pmoe_tpu/conf/benchmark")
    parser.add_argument("--town", default="Town01")
    parser.add_argument("--backend", default="fake", choices=["fake", "carla"])
    parser.add_argument("--routes", type=int, default=4,
                        help="number of routes to evaluate")
    parser.add_argument("--repetitions", type=int, default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--max-ticks", type=int, default=None)
    args = parser.parse_args(argv)

    cfg = get_conf(args.config)
    env = cfg.get("env", {})
    backend = make_backend(args.backend, args.town, cfg)
    n_spawn = len(backend.spawn_points())
    routes = [(i, (i + 7) % n_spawn) for i in range(args.routes)]
    indexer = RouteIndexer(routes,
                           repetitions=args.repetitions
                           or int(env.get("repetitions", 1)),
                           town=args.town)
    stats = StatisticsManager()
    evaluator = LeaderboardEvaluator(
        backend, stats, checkpoint_path=str(env.get(
            "checkpoint", "./simulation_results.json")),
        n_vehicles=int(env.get("n_vehicles", 0)),
        n_pedestrians=int(env.get("n_pedestrians", 0)),
        max_ticks=args.max_ticks)
    try:
        evaluator.run(lambda: ImageAgent(cfg), indexer,
                      resume=args.resume or bool(env.get("resume", False)))
    finally:
        backend.close()


if __name__ == "__main__":
    main()

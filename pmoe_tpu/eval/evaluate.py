"""CARLA-leaderboard routes benchmark entry point
(reference /root/reference/PMoE/eval/evaluate.py + runners/challenge_runner.py).

Routes come from a leaderboard-schema XML file (reference hardcodes
assets/routes_training/route_10.xml, eval/evaluate.py:12-15); adversarial
scenarios are injected along each route (route_scenario.py:362-415).

Usage: ``python -m pmoe_tpu.eval.evaluate [--config pmoe_tpu/conf/benchmark]
[--backend fake|carla] [--routes-file XML] [--resume]``
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ..agents.image_agent import ImageAgent
from ..utils import get_conf
from .evaluate_nocrash import make_backend
from .leaderboard import LeaderboardEvaluator
from .route_indexer import RouteIndexer
from .route_parser import parse_routes_file
from .statistics import StatisticsManager

__all__ = ["main", "DEFAULT_ROUTES_FILE", "DEFAULT_SCENARIOS_FILE"]

DEFAULT_ROUTES_FILE = str(
    Path(__file__).resolve().parent.parent / "assets" / "routes"
    / "routes_all.xml")
#: the reference hardcodes assets/all_towns_traffic_scenarios.json
#: (eval/evaluate.py:12-15); this ships the grid-town equivalent
DEFAULT_SCENARIOS_FILE = str(
    Path(__file__).resolve().parent.parent / "assets" / "scenarios"
    / "all_towns_traffic_scenarios.json")


class _RouteWorkerBuilder:
    """Picklable per-worker bootstrap: each worker owns one backend + agent
    and evaluates whole routes, returning the scored record dict."""

    def __init__(self, backend_kind: str, town: str, config: str, max_ticks,
                 inject_scenarios: bool, scenarios_file=None):
        self.backend_kind = backend_kind
        self.town = town
        self.config = config
        self.max_ticks = max_ticks
        self.inject_scenarios = inject_scenarios
        self.scenarios_file = scenarios_file

    def __call__(self, worker_id: int):
        cfg = get_conf(self.config)
        backend = make_backend(self.backend_kind, self.town, cfg)

        def route_fn(route_cfg):
            stats = StatisticsManager()
            ev = LeaderboardEvaluator(
                backend, stats, max_ticks=self.max_ticks, verbose=False,
                inject_scenarios=self.inject_scenarios,
                scenarios_file=self.scenarios_file)
            ev._run_route(lambda: ImageAgent(cfg), route_cfg)
            return stats._registry[route_cfg.index].to_dict()

        return route_fn


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="pmoe_tpu/conf/benchmark")
    parser.add_argument("--town", default="Town01")
    parser.add_argument("--backend", default="fake", choices=["fake", "carla"])
    parser.add_argument("--routes-file", default=DEFAULT_ROUTES_FILE,
                        help="leaderboard route XML (reference schema)")
    parser.add_argument("--route-id", default=None,
                        help="evaluate a single route id from the XML")
    parser.add_argument("--routes", type=int, default=None,
                        help="limit the number of routes")
    parser.add_argument("--repetitions", type=int, default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--max-ticks", type=int, default=None)
    parser.add_argument("--no-scenarios", action="store_true",
                        help="disable adversarial scenario injection")
    parser.add_argument("--scenarios-file", default=DEFAULT_SCENARIOS_FILE,
                        help="per-town trigger-JSON annotations "
                             "(all_towns_traffic_scenarios.json schema); "
                             "pass '' to fall back to spacing-based hazards")
    parser.add_argument("--workers", type=int, default=1,
                        help="parallel route workers (Ray-fleet analog)")
    parser.add_argument("--record-dir", default=None,
                        help="save per-route recordings for the metrics "
                             "module (python -m pmoe_tpu.eval.metrics_manager)")
    args = parser.parse_args(argv)

    cfg = get_conf(args.config)
    env = cfg.get("env", {})
    backend = make_backend(args.backend, args.town, cfg)
    routes = parse_routes_file(args.routes_file, single_route=args.route_id)
    if args.routes is not None:
        routes = routes[:args.routes]
    if not routes:
        raise SystemExit(f"no routes matched in {args.routes_file}")
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
        max_ticks=args.max_ticks,
        inject_scenarios=not args.no_scenarios,
        record_dir=args.record_dir,
        scenarios_file=args.scenarios_file or None)

    if args.workers > 1:
        from .parallel_runner import ParallelEvalRunner

        tasks = []
        while indexer.peek():
            tasks.append(indexer.next())
        runner = ParallelEvalRunner(
            _RouteWorkerBuilder(args.backend, args.town, args.config,
                                args.max_ticks, not args.no_scenarios,
                                args.scenarios_file or None),
            num_workers=args.workers)
        try:
            for _task, record in runner.run(tasks):
                stats.insert_record(record)
            glob = stats.compute_global_statistics(indexer.total)
            stats.save(evaluator.checkpoint_path)
            print(f"[leaderboard] global: {glob['scores']}")
        finally:
            backend.close()
        return

    try:
        evaluator.run(lambda: ImageAgent(cfg), indexer,
                      resume=args.resume or bool(env.get("resume", False)))
    finally:
        backend.close()


if __name__ == "__main__":
    main()

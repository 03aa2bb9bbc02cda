"""NoCrash benchmark entry point
(reference /root/reference/PMoE/eval/evaluate_nocrash.py + runners/nocrash_runner.py).

``--workers N`` fans episodes out over N worker processes, each owning one
backend + one jitted agent, with crash auto-restart — the Ray-actor fleet
semantics of the reference (runners/scenario_runner.py:124) without Ray.

Usage: ``python -m pmoe_tpu.eval.evaluate_nocrash --town Town01 --weather train
[--config pmoe_tpu/conf/benchmark] [--backend fake|carla] [--resume]
[--workers N]``
"""

from __future__ import annotations

import argparse
import sys

from ..agents.image_agent import ImageAgent
from ..sim.fake_carla import FakeCarlaBackend
from ..utils import get_conf
from .nocrash import NoCrashEvaluator, TRAFFIC_TABLES
from .parallel_runner import EvalTask, ParallelEvalRunner
from .statistics import NoCrashStatisticsManager

__all__ = ["main"]


class _CollectingStats:
    """In-worker stats shim: records rows instead of writing the shared CSV
    (the parent process owns the resume-aware CSV)."""

    def __init__(self):
        self.rows = []

    def log(self, *row) -> None:
        self.rows.append(row)

    def is_finished(self, *a) -> bool:
        return False

    def close(self) -> None:
        pass


class _EpisodeWorkerBuilder:
    """Picklable per-worker bootstrap for the spawn-based parallel runner."""

    def __init__(self, backend_kind: str, town: str, config: str,
                 max_ticks):
        self.backend_kind = backend_kind
        self.town = town
        self.config = config
        self.max_ticks = max_ticks

    def __call__(self, worker_id: int):
        cfg = get_conf(self.config)
        backend = make_backend(self.backend_kind, self.town, cfg)
        table = TRAFFIC_TABLES.get(self.town, TRAFFIC_TABLES["Town01"])

        def episode_fn(task: EvalTask):
            collect = _CollectingStats()
            ev = NoCrashEvaluator(backend, collect, max_ticks=self.max_ticks,
                                  verbose=False)
            ev._run_episode(lambda: ImageAgent(cfg), task.town,
                            task.traffic_idx, task.weather,
                            (task.start_idx, task.target_idx), table)
            return collect.rows[-1]

        return episode_fn


def make_backend(kind: str, town: str, cfg):
    s = cfg.get("sensors", {})
    if kind == "carla":
        from ..sim.carla_bridge import CarlaBackend

        env = cfg.get("env", {})
        return CarlaBackend(host=env.get("host", "localhost"),
                            port=int(env.get("port", 2000)), town=town,
                            img_width=int(s.get("img_width", 800)),
                            img_height=int(s.get("img_height", 600)))
    return FakeCarlaBackend(town=town, img_width=int(s.get("img_width", 800)),
                            img_height=int(s.get("img_height", 600)))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--town", default="Town01",
                        choices=["Town01", "Town02"])
    parser.add_argument("--weather", default="train",
                        choices=["train", "test"])
    parser.add_argument("--config", default="pmoe_tpu/conf/benchmark")
    parser.add_argument("--backend", default="fake",
                        choices=["fake", "carla"])
    parser.add_argument("--log-dir", default="benchmark_results")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--max-ticks", type=int, default=None)
    parser.add_argument("--routes", type=int, default=None,
                        help="limit the number of routes")
    parser.add_argument("--suite", default=None,
                        help="suite file of 'start target' spawn pairs "
                             "(reference runners/suite format)")
    parser.add_argument("--workers", type=int, default=1,
                        help="parallel episode workers (Ray-fleet analog)")
    parser.add_argument("--fleet", type=int, default=0,
                        help="batched lockstep episode slots sharing one "
                             "jitted sample (single-chip fleet; fake "
                             "backend only — see eval/fleet.py)")
    parser.add_argument("--record-dir", default=None,
                        help="save per-episode recordings for the metrics "
                             "module (python -m pmoe_tpu.eval.metrics_manager)")
    args = parser.parse_args(argv)

    cfg = get_conf(args.config)
    backend = make_backend(args.backend, args.town, cfg)
    stats = NoCrashStatisticsManager(args.log_dir, args.town, args.weather,
                                     resume=args.resume)
    from .nocrash import load_suite

    routes = load_suite(args.suite) if args.suite else None
    evaluator = NoCrashEvaluator(backend, stats, weather_group=args.weather,
                                 routes=routes, max_ticks=args.max_ticks,
                                 record_dir=args.record_dir)
    if args.routes is not None:
        evaluator.routes = evaluator.routes[:args.routes]

    if args.fleet and args.fleet > 1:
        if args.backend != "fake":
            raise SystemExit("--fleet requires the fake backend (real CARLA "
                             "keeps the per-episode path)")
        from .fleet import FleetNoCrashRunner, build_tasks

        tasks = build_tasks(args.town, evaluator.routes, evaluator.weathers,
                            stats)
        runner = FleetNoCrashRunner(cfg, n_slots=args.fleet,
                                    max_ticks=args.max_ticks)
        try:
            runner.run(tasks, stats)
        finally:
            stats.close()
            backend.close()
        return

    if args.workers > 1:
        tasks = [EvalTask(args.town, traffic, weather, s, t)
                 for traffic in range(3)
                 for (s, t) in evaluator.routes
                 for weather in evaluator.weathers
                 if not stats.is_finished(args.town, (s, t), weather, traffic)]
        runner = ParallelEvalRunner(
            _EpisodeWorkerBuilder(args.backend, args.town, args.config,
                                  args.max_ticks),
            num_workers=args.workers)
        try:
            for _task, row in runner.run(tasks):
                stats.log(*row)
        finally:
            stats.close()
            backend.close()
        return

    try:
        evaluator.run(lambda: ImageAgent(cfg))
    finally:
        stats.close()
        backend.close()


if __name__ == "__main__":
    main()

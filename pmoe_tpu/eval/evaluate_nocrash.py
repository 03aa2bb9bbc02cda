"""NoCrash benchmark entry point
(reference /root/reference/PMoE/eval/evaluate_nocrash.py + runners/nocrash_runner.py).

Usage: ``python -m pmoe_tpu.eval.evaluate_nocrash --town Town01 --weather train
[--config pmoe_tpu/conf/benchmark] [--backend fake|carla] [--resume]``
"""

from __future__ import annotations

import argparse
import sys

from ..agents.image_agent import ImageAgent
from ..sim.fake_carla import FakeCarlaBackend
from ..utils import get_conf
from .nocrash import NoCrashEvaluator
from .statistics import NoCrashStatisticsManager

__all__ = ["main"]


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
    args = parser.parse_args(argv)

    cfg = get_conf(args.config)
    backend = make_backend(args.backend, args.town, cfg)
    stats = NoCrashStatisticsManager(args.log_dir, args.town, args.weather,
                                     resume=args.resume)
    evaluator = NoCrashEvaluator(backend, stats, weather_group=args.weather,
                                 max_ticks=args.max_ticks)
    if args.routes is not None:
        evaluator.routes = evaluator.routes[:args.routes]
    try:
        evaluator.run(lambda: ImageAgent(cfg))
    finally:
        stats.close()
        backend.close()


if __name__ == "__main__":
    main()

"""Metrics runner CLI — the reference ``scenario_runner/metrics_manager.py``
analog: load an episode recording, import a user metric class, run it.

Usage::

    python -m pmoe_tpu.eval.metrics_manager --log episode.json \
        --metric pmoe_tpu.eval.metrics.distance_between_vehicles \
        [--out-prefix results/ep0]

The metric module must contain exactly one subclass of
:class:`pmoe_tpu.eval.metrics.BasicMetric` (same single-class contract as the
reference's ``_get_metric_class``).
"""

from __future__ import annotations

import argparse
import importlib
import inspect
import json

from .metrics.basic_metric import BasicMetric
from .recorder import MetricsLog

__all__ = ["run_metric", "main"]


def _get_metric_class(module_name: str):
    module = importlib.import_module(module_name)
    classes = [c for _n, c in inspect.getmembers(module, inspect.isclass)
               if issubclass(c, BasicMetric) and c is not BasicMetric
               and c.__module__ == module.__name__]
    if len(classes) != 1:
        raise ValueError(
            f"{module_name} must define exactly one BasicMetric subclass "
            f"(found {len(classes)})")
    return classes[0]


def run_metric(log_path: str, metric_module: str,
               out_prefix: str = "metric") -> BasicMetric:
    log = MetricsLog.load(log_path)
    metric_cls = _get_metric_class(metric_module)
    return metric_cls(log, log.criteria, out_prefix=out_prefix)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--log", required=True,
                        help="episode recording (.json from EpisodeRecorder)")
    parser.add_argument("--metric", required=True,
                        help="python module containing one BasicMetric subclass")
    parser.add_argument("--out-prefix", default="metric")
    args = parser.parse_args(argv)
    metric = run_metric(args.log, args.metric, args.out_prefix)
    print(json.dumps({k: v for k, v in metric.results.items()
                      if k != "series"}, indent=2))


if __name__ == "__main__":
    main()

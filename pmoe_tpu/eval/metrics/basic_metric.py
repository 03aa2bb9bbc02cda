"""Metric base class (srunner/metrics/examples/basic_metric.py contract):
subclasses implement ``_create_metric`` and call :meth:`write_json` /
:meth:`write_csv` with their results."""

from __future__ import annotations

import csv
import json

__all__ = ["BasicMetric"]


class BasicMetric:
    """A metric runs once over a :class:`~pmoe_tpu.eval.recorder.MetricsLog`."""

    def __init__(self, log, criteria: dict, out_prefix: str = "metric"):
        self.out_prefix = out_prefix
        self.results: dict = {}
        self._create_metric(log, criteria)

    def _create_metric(self, log, criteria) -> None:
        raise NotImplementedError

    def write_json(self, data, suffix: str = "") -> str:
        path = f"{self.out_prefix}{suffix}.json"
        with open(path, "w") as f:
            json.dump(data, f, indent=2)
        return path

    def write_csv(self, rows, fieldnames, suffix: str = "") -> str:
        path = f"{self.out_prefix}{suffix}.csv"
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fieldnames)
            w.writeheader()
            w.writerows(rows)
        return path

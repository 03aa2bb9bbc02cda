"""Dump the recorded criteria results to JSON
(srunner/metrics/examples/criteria_filter.py analog)."""

from __future__ import annotations

from .basic_metric import BasicMetric

__all__ = ["CriteriaFilter"]


class CriteriaFilter(BasicMetric):
    def _create_metric(self, log, criteria) -> None:
        self.results = dict(criteria)
        self.write_json(self.results, suffix="_criteria")

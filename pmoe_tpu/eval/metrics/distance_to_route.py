"""Ego lateral deviation from the recorded route polyline — the
lane-keeping signal (srunner/metrics/examples/distance_to_lane_center.py
analog; the route stands in for lane centers on the grid backend)."""

from __future__ import annotations

import numpy as np

from .basic_metric import BasicMetric

__all__ = ["DistanceToRoute"]


class DistanceToRoute(BasicMetric):
    def _create_metric(self, log, criteria) -> None:
        route = np.asarray(log.header.get("route", []), float)
        if route.size == 0:
            self.results = {"error": "recording has no route in its header"}
            self.write_json(self.results, suffix="_route_dist")
            return
        ego = log.get_ego_vehicle_id()
        series = []
        for i in range(log.get_total_frame_count()):
            ex, ey, _ = log.get_actor_transform(ego, i)
            d = float(np.sqrt(((route - [ex, ey]) ** 2).sum(-1)).min())
            series.append({"frame": i, "deviation": round(d, 3)})
        dev = np.array([s["deviation"] for s in series])
        self.results = {
            "mean_deviation": round(float(dev.mean()), 3),
            "max_deviation": round(float(dev.max()), 3),
            "p95_deviation": round(float(np.percentile(dev, 95)), 3),
            "series": series,
        }
        self.write_json(self.results, suffix="_route_dist")

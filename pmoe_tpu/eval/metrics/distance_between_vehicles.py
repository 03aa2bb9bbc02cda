"""Per-frame distance between the ego and the nearest scripted vehicle
(srunner/metrics/examples/distance_between_vehicles.py analog)."""

from __future__ import annotations

import math

from .basic_metric import BasicMetric

__all__ = ["DistanceBetweenVehicles"]


class DistanceBetweenVehicles(BasicMetric):
    def _create_metric(self, log, criteria) -> None:
        ego = log.get_ego_vehicle_id()
        vehicles = log.get_actor_ids_with_type("vehicle")
        series = []
        for i in range(log.get_total_frame_count()):
            ex, ey, _ = log.get_actor_transform(ego, i)
            best = None
            for vid in vehicles:
                tr = log.get_actor_transform(vid, i)
                if tr is None:
                    continue
                d = math.hypot(tr[0] - ex, tr[1] - ey)
                best = d if best is None else min(best, d)
            if best is not None:
                series.append({"frame": i, "t": log.get_simulation_time(i),
                               "distance": round(best, 3)})
        self.results = {
            "frames": len(series),
            "min_distance": min((s["distance"] for s in series), default=None),
            "mean_distance": (round(sum(s["distance"] for s in series)
                                    / len(series), 3) if series else None),
            "series": series,
        }
        self.write_json(self.results, suffix="_distance")

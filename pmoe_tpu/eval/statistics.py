"""Benchmark scoring & bookkeeping.

* :class:`NoCrashStatisticsManager` — the CSV episode log with resume
  (reference runners/nocrash_runner.py:28-110: headers town/traffic/weather/
  start/target/route_completion/lights_ran/duration).
* :class:`StatisticsManager` — leaderboard scoring with multiplicative
  infraction penalties (reference leaderboard/utils/statistics_manager.py:22-26:
  ped 0.50 / veh 0.60 / static 0.65 / red-light 0.70 / stop 0.80;
  score_composed = route_completion * penalty, :194-197) plus global
  aggregation and JSON records (:208-331).
"""

from __future__ import annotations

import csv
import json
import os
from pathlib import Path
from typing import Dict, List, Tuple

__all__ = ["NoCrashStatisticsManager", "StatisticsManager", "RouteRecord",
           "PENALTY_VALUES"]

PENALTY_VALUES = {
    "collision_pedestrian": 0.50,
    "collision_vehicle": 0.60,
    "collision_static": 0.65,
    "red_light": 0.70,
    "stop_infraction": 0.80,
}


class NoCrashStatisticsManager:
    headers = ["town", "traffic", "weather", "start", "target",
               "route_completion", "lights_ran", "duration"]

    def __init__(self, log_dir: str, town: str, weather: str,
                 resume: bool = False):
        Path(log_dir).mkdir(parents=True, exist_ok=True)
        self.path = os.path.join(log_dir, f"{town}_{weather}.csv")
        self.finished_tasks: Dict[str, Dict[Tuple, List]] = {
            "Town01": {}, "Town02": {}}
        # resume only onto a CSV that actually has its header row: a run
        # aborted between file creation and the header write leaves an empty
        # file, and appending to it produces a headerless CSV that poisons
        # every later DictReader (resume AND view_results)
        if (resume and os.path.exists(self.path)
                and os.path.getsize(self.path) > 0):
            self._load()
            self._file = open(self.path, "a", newline="")
            self._writer = csv.DictWriter(self._file, fieldnames=self.headers)
        else:
            self._file = open(self.path, "w", newline="")
            self._writer = csv.DictWriter(self._file, fieldnames=self.headers)
            self._writer.writeheader()

    def _load(self) -> None:
        with open(self.path) as f:
            for row in csv.DictReader(f):
                self.finished_tasks.setdefault(row["town"], {})[(
                    int(row["traffic"]), int(row["weather"]),
                    int(row["start"]), int(row["target"]))] = [
                    float(row["route_completion"]), int(row["lights_ran"]),
                    float(row["duration"])]

    def log(self, town, traffic, weather, start, target, route_completion,
            lights_ran, duration) -> None:
        self._writer.writerow({
            "town": town, "traffic": traffic, "weather": weather,
            "start": start, "target": target,
            "route_completion": route_completion, "lights_ran": lights_ran,
            "duration": duration})
        self._file.flush()

    def is_finished(self, town, route, weather, traffic) -> bool:
        start, target = route
        return (int(traffic), int(weather), int(start), int(target)) in \
            self.finished_tasks.get(town, {})

    def close(self) -> None:
        self._file.close()


class RouteRecord:
    def __init__(self, route_id: str = "", index: int = 0):
        self.route_id = route_id
        self.index = index
        self.status = "Started"
        self.infractions = {k: [] for k in (
            "collision_pedestrian", "collision_vehicle", "collision_static",
            "red_light", "stop_infraction", "outside_route_lanes",
            "route_dev", "vehicle_blocked", "route_timeout")}
        self.scores = {"score_route": 0.0, "score_penalty": 1.0,
                       "score_composed": 0.0}
        self.meta = {}

    def to_dict(self) -> dict:
        return {"route_id": self.route_id, "index": self.index,
                "status": self.status, "infractions": self.infractions,
                "scores": self.scores, "meta": self.meta}

    @classmethod
    def from_dict(cls, d: dict) -> "RouteRecord":
        r = cls(d.get("route_id", ""), d.get("index", 0))
        r.status = d.get("status", "Started")
        r.infractions.update(d.get("infractions", {}))
        r.scores.update(d.get("scores", {}))
        r.meta = d.get("meta", {})
        return r


class StatisticsManager:
    """Leaderboard scoring (reference statistics_manager.py:79-331)."""

    def __init__(self):
        self._registry: List[RouteRecord] = []

    def resume(self, checkpoint_path: str) -> None:
        if checkpoint_path and os.path.exists(checkpoint_path):
            data = json.load(open(checkpoint_path))
            self._registry = [RouteRecord.from_dict(d)
                              for d in data.get("_checkpoint", {}).get(
                                  "records", [])]

    def set_route(self, route_id: str, index: int) -> RouteRecord:
        record = RouteRecord(route_id, index)
        if index < len(self._registry):
            self._registry[index] = record
        else:
            self._registry.extend(
                RouteRecord(index=i)
                for i in range(len(self._registry), index))
            self._registry.append(record)
        return record

    def compute_route_statistics(self, index: int, route_completion: float,
                                 infraction_events: Dict[str, list],
                                 duration_game: float = 0.0,
                                 status: str = "Completed") -> RouteRecord:
        """score_composed = route_completion * prod(penalty^n_infractions)."""
        record = self._registry[index]
        penalty = 1.0
        for kind, events in infraction_events.items():
            if kind in record.infractions:
                record.infractions[kind].extend(events)
            if kind in PENALTY_VALUES:
                penalty *= PENALTY_VALUES[kind] ** len(events)
            elif kind == "outside_route_lanes":
                # fractional penalty: x (1 - pct/100)
                # (reference statistics_manager.py:163-166)
                for ev in events:
                    penalty *= max(
                        1.0 - float(ev.get("percentage", 0.0)) / 100.0, 0.0)
        record.scores["score_route"] = route_completion
        record.scores["score_penalty"] = penalty
        record.scores["score_composed"] = max(route_completion * penalty, 0.0)
        record.status = status
        record.meta["duration_game"] = duration_game
        return record

    def compute_global_statistics(self, total_routes: int | None = None) -> dict:
        n = total_routes or max(len(self._registry), 1)
        glob = {"score_composed": 0.0, "score_route": 0.0, "score_penalty": 0.0}
        infractions = {k: 0 for k in RouteRecord().infractions}
        for r in self._registry:
            for k in glob:
                glob[k] += r.scores[k] / n
            for k, v in r.infractions.items():
                infractions[k] += len(v)
        return {"scores": glob, "infractions": infractions,
                "total_routes": n, "finished_routes": len(self._registry)}

    def insert_record(self, record_dict: dict) -> None:
        """Merge a route record computed in a worker process (parallel eval)."""
        record = RouteRecord.from_dict(record_dict)
        self.set_route(record.route_id, record.index)
        self._registry[record.index] = record

    def save(self, checkpoint_path: str) -> None:
        Path(checkpoint_path).parent.mkdir(parents=True, exist_ok=True)
        payload = {"_checkpoint": {
            "records": [r.to_dict() for r in self._registry],
            "global_record": self.compute_global_statistics()}}
        json.dump(payload, open(checkpoint_path, "w"), indent=2)

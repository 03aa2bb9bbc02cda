"""Route x repetition work queue with JSON save/resume
(reference leaderboard/utils/route_indexer.py:13-77)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Optional

__all__ = ["RouteIndexer", "RouteConfig"]


class RouteConfig:
    def __init__(self, route_id: str, start_idx: int, target_idx: int,
                 town: str = "Town01", repetition_index: int = 0,
                 waypoints=None):
        self.name = route_id
        self.start_idx = start_idx
        self.target_idx = target_idx
        self.town = town
        self.repetition_index = repetition_index
        self.waypoints = waypoints      # explicit XML waypoints, else spawn idx
        self.index = 0


class RouteIndexer:
    """Accepts either (start_idx, target_idx) spawn pairs or parsed
    :class:`pmoe_tpu.eval.route_parser.RouteDescription` objects (XML routes,
    reference route_parser.py:23-58)."""

    def __init__(self, routes: List, repetitions: int = 1,
                 town: str = "Town01"):
        self._configs: List[RouteConfig] = []
        self._index = 0
        for rep in range(repetitions):
            for i, r in enumerate(routes):
                if isinstance(r, tuple):
                    cfg = RouteConfig(f"RouteScenario_{i}", r[0], r[1], town,
                                      rep)
                else:
                    cfg = RouteConfig(f"RouteScenario_{r.route_id}", -1, -1,
                                      r.town, rep, waypoints=r.waypoints)
                self._configs.append(cfg)
        for i, cfg in enumerate(self._configs):
            cfg.index = i
        self.total = len(self._configs)

    def peek(self) -> bool:
        return self._index < self.total

    def next(self) -> Optional[RouteConfig]:
        if not self.peek():
            return None
        cfg = self._configs[self._index]
        self._index += 1
        return cfg

    def save_state(self, endpoint: str) -> None:
        Path(endpoint).parent.mkdir(parents=True, exist_ok=True)
        json.dump({"index": self._index, "total": self.total},
                  open(endpoint, "w"))

    def resume(self, endpoint: str) -> None:
        if Path(endpoint).exists():
            data = json.load(open(endpoint))
            self._index = min(int(data.get("index", 0)), self.total)

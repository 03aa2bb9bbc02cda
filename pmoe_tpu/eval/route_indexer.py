"""Route x repetition work queue with JSON save/resume
(reference leaderboard/utils/route_indexer.py:13-77)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Optional

__all__ = ["RouteIndexer", "RouteConfig"]


class RouteConfig:
    def __init__(self, route_id: str, start_idx: int, target_idx: int,
                 town: str = "Town01", repetition_index: int = 0):
        self.name = route_id
        self.start_idx = start_idx
        self.target_idx = target_idx
        self.town = town
        self.repetition_index = repetition_index
        self.index = 0


class RouteIndexer:
    def __init__(self, routes: List[tuple], repetitions: int = 1,
                 town: str = "Town01"):
        self._configs: List[RouteConfig] = []
        self._index = 0
        for rep in range(repetitions):
            for i, (s, t) in enumerate(routes):
                cfg = RouteConfig(f"RouteScenario_{i}", s, t, town, rep)
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

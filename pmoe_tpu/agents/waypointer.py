"""GNSS -> navigation-command waypointer (reference autoagents/waypointer.py).

Converts GNSS to local xy with an equirectangular projection (the cos term is
the mean latitude of the plan, waypointer.py:20-25), then advances along the
downsampled global plan: a waypoint is consumed when the ego is within a
threshold of it AND it is the immediate successor of the current checkpoint
(waypointer.py:39-59). The threshold is tighter before a turn command.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np

from ..sim.interface import RoadOption

__all__ = ["Waypointer"]

EARTH_RADIUS = 6371e3


class Waypointer:
    def __init__(self, global_plan: Sequence, current_gnss,
                 threshold_lane: float = 10.0, threshold_before: float = 4.5,
                 threshold_after: float = 4.5, pop_lane_change: bool = True):
        self._threshold_before = threshold_before
        self._threshold_after = threshold_after
        self._threshold_lane = threshold_lane
        self._pop_lane_change = pop_lane_change
        self._lane_change_counter = 0

        # mean-latitude cosine reference (reference waypointer.py:20-25)
        cos_0 = sum(gnss["lat"] * (math.pi / 180)
                    for gnss, _ in global_plan) / max(len(global_plan), 1)
        self.cos_0 = cos_0

        self.global_plan: List[Tuple[float, float, RoadOption]] = []
        for gnss, cmd in global_plan:
            x, y = self.latlon_to_xy(gnss["lat"], gnss["lon"])
            self.global_plan.append((x, y, RoadOption(cmd)))

        lat, lon = current_gnss[0], current_gnss[1]
        cx, cy = self.latlon_to_xy(lat, lon)
        self.checkpoint: Tuple[float, float, RoadOption] = (
            cx, cy, RoadOption.LANEFOLLOW)
        self.current_idx = -1

    def tick(self, gnss) -> Tuple[float, float, RoadOption]:
        lat, lon = gnss[0], gnss[1]
        x, y = self.latlon_to_xy(lat, lon)
        for i, (wx, wy, cmd) in enumerate(self.global_plan):
            distance = float(np.hypot(x - wx, y - wy))
            if (self.checkpoint[2] == RoadOption.LANEFOLLOW
                    and cmd != RoadOption.LANEFOLLOW):
                threshold = self._threshold_before
            else:
                threshold = self._threshold_after
            if distance < threshold and i - self.current_idx == 1:
                self.checkpoint = (wx, wy, cmd)
                self.current_idx += 1
                break
        return self.checkpoint

    def latlon_to_xy(self, lat: float, lon: float) -> Tuple[float, float]:
        x = EARTH_RADIUS * lat * (math.pi / 180)
        y = EARTH_RADIUS * lon * (math.pi / 180) * math.cos(self.cos_0)
        return x, y

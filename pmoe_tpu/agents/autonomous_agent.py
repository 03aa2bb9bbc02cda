"""Leaderboard agent plug-in contract.

Mirrors the vendored CARLA leaderboard base class
(/root/reference/PMoE/leaderboard/leaderboard/autoagents/autonomous_agent.py:29-126):
module-level ``get_entry_point()`` names a class with
``setup / sensors / run_step / destroy`` and ``set_global_plan``. Keeping this
contract means our agents also run under stock CARLA tooling.
"""

from __future__ import annotations

import enum
import os
import time
from typing import Any, List, Optional

__all__ = ["Track", "AutonomousAgent", "downsample_plan"]


def downsample_plan(plan, sample_factor: float = 50.0):
    """Apply the reference's route downsampling to a gps plan (the transform
    ``set_global_plan`` performs before the waypointer sees the plan). Public
    so other plan consumers (eval/fleet.py) reproduce the agent's view."""
    plan = list(plan)
    return [plan[i] for i in _downsample_ids(plan, sample_factor)] or plan


def _downsample_ids(plan, sample_factor: float) -> List[int]:
    """Reference ``downsample_route`` (route_manipulation.py:86-129): keep
    lane-change nodes, every node where the road option changes, one node per
    ``sample_factor`` meters in between, and the final node."""
    import math

    from ..sim.interface import RoadOption

    lane_changes = {getattr(RoadOption, "CHANGELANELEFT", None),
                    getattr(RoadOption, "CHANGELANERIGHT", None)}
    ids: List[int] = []
    prev_option = None
    dist = 0.0
    for i, node in enumerate(plan):
        curr_option = node[1]
        if curr_option in lane_changes:
            ids.append(i)
            dist = 0.0
        elif prev_option != curr_option and prev_option not in lane_changes:
            ids.append(i)
            dist = 0.0
        elif dist > sample_factor:
            ids.append(i)
            dist = 0.0
        elif i == len(plan) - 1:
            ids.append(i)
            dist = 0.0
        else:
            x1, y1 = AutonomousAgent._plan_xy(node)
            x0, y0 = AutonomousAgent._plan_xy(plan[i - 1])
            dist += math.hypot(x1 - x0, y1 - y0)
        prev_option = curr_option
    return ids


class Track(enum.Enum):
    SENSORS = "SENSORS"
    MAP = "MAP"


class AutonomousAgent:
    def __init__(self, path_to_conf_file: Any = None):
        self.track = Track.SENSORS
        self._global_plan = None
        self._global_plan_world_coord = None
        self.wallclock_t0 = None
        self.realtime_ratio = 0.0
        self.setup(path_to_conf_file)

    def setup(self, path_to_conf_file: Any) -> None:
        """Initialize everything needed by the agent."""

    def sensors(self) -> List[dict]:
        """Declare the sensor suite (type/position/id dicts)."""
        return []

    def run_step(self, input_data: dict, timestamp: float):
        """One control step; returns a VehicleControl."""
        raise NotImplementedError

    def destroy(self) -> None:
        pass

    def __call__(self, input_data: dict, timestamp: float):
        """Step the agent, tracking the wallclock-vs-simtime ratio the
        reference prints every tick (autonomous_agent.py:108-113). The ratio
        is always computed (``self.realtime_ratio``); the per-tick print is
        opt-in (``PMOE_AGENT_VERBOSE=1``) to keep benchmark loops clean."""
        if self.wallclock_t0 is None:
            self.wallclock_t0 = time.time()
        wallclock = time.time() - self.wallclock_t0
        self.realtime_ratio = wallclock / timestamp if timestamp > 0 else 0.0
        if os.environ.get("PMOE_AGENT_VERBOSE"):
            print(f"======[Agent] Wallclock_time = {wallclock:.3f} / "
                  f"Sim_time = {timestamp:.3f} / "
                  f"Ratio = {self.realtime_ratio:.3f}x")
        return self.run_step(input_data, timestamp)

    @staticmethod
    def _plan_xy(node):
        from ..sim.interface import latlon_to_xy

        gnss = node[0]
        if isinstance(gnss, dict):
            return latlon_to_xy(gnss["lat"], gnss["lon"])
        return tuple(gnss[:2])

    def set_global_plan(self, global_plan_gps, global_plan_world_coord=None,
                        downsample: int = 50) -> None:
        """Store the downsampled route plan (reference
        autonomous_agent.py:120-126 + route_manipulation.py:86-129).

        The reference's ``downsample_route`` is NOT a stride: it keeps every
        node where the road option CHANGES (turn starts and ends), then one
        node per ``downsample`` meters between changes, plus the final node.
        A naive ``[::50]`` stride (this method's former behavior) skips the
        ~10-node turn windows with high probability, so the waypointer's
        plan contained no turn-labeled nodes and the command input
        degenerated to constant LANEFOLLOW — at collection AND eval."""
        plan = list(global_plan_gps)
        ids = _downsample_ids(plan, float(downsample))
        self._global_plan = [plan[i] for i in ids] or plan
        if global_plan_world_coord is not None:
            wc = list(global_plan_world_coord)
            self._global_plan_world_coord = [wc[i] for i in ids] or wc

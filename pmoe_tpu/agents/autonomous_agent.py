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

__all__ = ["Track", "AutonomousAgent"]


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

    def set_global_plan(self, global_plan_gps, global_plan_world_coord=None,
                        downsample: int = 50) -> None:
        """Store the (downsampled) route plan; the leaderboard hands agents a
        ~50x downsampled GPS plan (reference autonomous_agent.py:115-126)."""
        self._global_plan = list(global_plan_gps)[::downsample] or list(
            global_plan_gps)
        if global_plan_world_coord is not None:
            self._global_plan_world_coord = list(
                global_plan_world_coord)[::downsample]

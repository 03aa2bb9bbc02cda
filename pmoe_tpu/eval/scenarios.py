"""Adversarial scenario injection along routes.

The leaderboard reference injects scripted adversarial scenarios at trigger
positions parsed from ``all_towns_traffic_scenarios.json``
(route_scenario.py:362-415: crossing pedestrians, vehicle cut-ins, control
loss), built from the srunner atomic-behavior library (SURVEY §2.7). This is
the functional equivalent over the simulator seam: a
:class:`ScenarioInjector` walks the route, places triggers every
``spacing`` meters, and when the ego reaches one, spawns a scripted actor
(crossing walker / stopped vehicle) into the backend's NPC list.

Only the fake backend supports dynamic actor injection for now; on real CARLA
the native scenario machinery applies.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from ..sim.interface import Route

__all__ = ["ScenarioInjector", "ScenarioTrigger"]


@dataclass
class ScenarioTrigger:
    kind: str              # 'crossing_walker' | 'stopped_vehicle'
    position: np.ndarray   # (2,) trigger location on the route
    fired: bool = False


class ScenarioInjector:
    """Trigger-based scripted adversaries (route_scenario's scenario tree).

    Kinds (srunner analogs):
    * ``crossing_walker``       — DynamicObjectCrossing: a pedestrian crosses
      the road perpendicular to the route.
    * ``stopped_vehicle``       — StationaryObjectCrossing / blocked lane.
    * ``lead_vehicle_braking``  — FollowLeadingVehicle w/ brake: a slow
      vehicle shuttles along the route ahead of the trigger.
    * ``control_loss``          — ControlLoss: ~1.5 s of steering noise
      injected into the ego's controls (backend-side).
    """

    def __init__(self, route: Route, spacing: float = 80.0,
                 kinds=("crossing_walker", "stopped_vehicle",
                        "lead_vehicle_braking", "control_loss"),
                 seed: int = 0):
        rng = np.random.default_rng(seed)
        self.triggers: List[ScenarioTrigger] = []
        cum = np.concatenate([[0.0], np.cumsum(np.sqrt(
            (np.diff(route.positions, axis=0) ** 2).sum(-1)))])
        next_at = spacing
        for i, d in enumerate(cum):
            if d >= next_at:
                kind = kinds[int(rng.integers(len(kinds)))]
                self.triggers.append(
                    ScenarioTrigger(kind, route.positions[i].copy()))
                next_at += spacing
        self._rng = rng

    def update(self, backend, ego_xy) -> List[str]:
        """Fire triggers the ego is within 20 m of; returns fired kinds."""
        if not hasattr(backend, "_npcs"):
            # real-CARLA bridge: hazards come from the server-side scenario
            # machinery, not client-side injection
            return []
        from ..sim.fake_carla import _NPC

        fired = []
        ego = np.asarray(ego_xy, float)
        for trig in self.triggers:
            if trig.fired:
                continue
            if np.linalg.norm(trig.position - ego) < 20.0:
                trig.fired = True
                fired.append(trig.kind)
                if trig.kind == "crossing_walker":
                    # walker crossing the road perpendicular to the route
                    a = trig.position + np.array([0.0, -6.0])
                    b = trig.position + np.array([0.0, 6.0])
                    backend._npcs.append(_NPC("walker", a, b,
                                              speed=1.5, phase=0.0))
                elif trig.kind == "stopped_vehicle":
                    a = trig.position + np.array([8.0, 0.0])
                    backend._npcs.append(_NPC("vehicle", a, a + 0.1,
                                              speed=0.0, phase=0.0))
                elif trig.kind == "lead_vehicle_braking":
                    # slow vehicle shuttling along the road ahead
                    a = trig.position + np.array([12.0, 0.0])
                    b = trig.position + np.array([40.0, 0.0])
                    backend._npcs.append(_NPC("vehicle", a, b,
                                              speed=2.0, phase=0.0))
                elif trig.kind == "control_loss":
                    # ~1.5 s of steering noise on the ego's controls
                    if hasattr(backend, "inject_control_noise"):
                        backend.inject_control_noise(
                            duration=1.5,
                            magnitude=float(self._rng.uniform(0.15, 0.4)))
        return fired

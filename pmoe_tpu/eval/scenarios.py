"""Adversarial scenario injection along routes.

The leaderboard reference injects scripted adversarial scenarios at trigger
positions parsed from ``all_towns_traffic_scenarios.json``
(route_scenario.py:362-415), instantiated from the Scenario1-10 class table
(route_scenario.py:54-65) and built on the srunner atomic-behavior library
(SURVEY §2.7). This module is the functional equivalent over the simulator
seam, with BOTH construction paths:

* :meth:`ScenarioInjector.from_definitions` — the benchmark-definition path:
  scenario definitions produced by
  :func:`pmoe_tpu.eval.route_parser.scan_route_for_scenarios` +
  :func:`~pmoe_tpu.eval.route_parser.scenario_sampling` (trigger-JSON
  position+heading matching, the reference semantics);
* the spacing constructor — synthetic hazards every ``spacing`` meters for
  quick stress runs without an annotations file.

When the ego reaches a trigger, the scripted adversary spawns into the
backend's NPC list with geometry expressed in the route frame at the trigger
(forward/left of the lane, not world axes). Only the fake backend supports
dynamic actor injection; on real CARLA the server-side scenario machinery
applies.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..sim.interface import Route

__all__ = ["ScenarioInjector", "ScenarioTrigger", "SCENARIO_KIND"]

#: Scenario1-10 -> injector kind (the NUMBER_CLASS_TRANSLATION analog,
#: reference route_scenario.py:54-65)
SCENARIO_KIND = {
    "Scenario1": "control_loss",            # ControlLoss
    "Scenario2": "lead_vehicle_braking",    # FollowLeadingVehicle
    "Scenario3": "crossing_walker",         # DynamicObjectCrossing
    "Scenario4": "vehicle_turning",         # VehicleTurningRoute
    "Scenario5": "lead_vehicle_braking",    # OtherLeadingVehicle
    "Scenario6": "opposite_vehicle",        # ManeuverOppositeDirection
    "Scenario7": "junction_crossing",       # SignalJunctionCrossingRoute
    "Scenario8": "junction_crossing",
    "Scenario9": "junction_crossing",
    "Scenario10": "junction_crossing",      # NoSignalJunctionCrossingRoute
}


@dataclass
class ScenarioTrigger:
    kind: str              # see ScenarioInjector docstring
    position: np.ndarray   # (2,) trigger location on the route
    forward: np.ndarray = field(
        default_factory=lambda: np.array([1.0, 0.0]))  # route dir at trigger
    name: str = ""         # ScenarioN (trigger-JSON path) or == kind
    other_actors: Optional[dict] = None   # annotated adversary transforms
    fired: bool = False


def _route_frame_at(route: Route, position) -> np.ndarray:
    """Unit route-forward vector at the dense-route point nearest ``position``."""
    p = np.asarray(position, float)
    d = np.sqrt(((route.positions - p) ** 2).sum(-1))
    i = min(int(d.argmin()), len(route.positions) - 2)
    fwd = np.asarray(route.positions[i + 1], float) - route.positions[i]
    n = float(np.linalg.norm(fwd)) or 1.0
    return fwd / n


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
    * ``vehicle_turning``       — VehicleTurningRoute: a vehicle cuts across
      the lane just past the upcoming junction.
    * ``opposite_vehicle``      — ManeuverOppositeDirection: an oncoming
      vehicle shuttles toward the ego in the opposite lane.
    * ``junction_crossing``     — (No)SignalJunctionCrossingRoute: a vehicle
      crosses the junction perpendicular to the ego's path.
    """

    def __init__(self, route: Route, spacing: float = 80.0,
                 kinds=("crossing_walker", "stopped_vehicle",
                        "lead_vehicle_braking", "control_loss"),
                 seed: int = 0, triggers: Optional[List[ScenarioTrigger]] = None):
        rng = np.random.default_rng(seed)
        self.route = route
        if triggers is not None:
            self.triggers = triggers
        else:
            self.triggers = []
            cum = np.concatenate([[0.0], np.cumsum(np.sqrt(
                (np.diff(route.positions, axis=0) ** 2).sum(-1)))])
            next_at = spacing
            for i, d in enumerate(cum):
                if d >= next_at:
                    kind = kinds[int(rng.integers(len(kinds)))]
                    pos = route.positions[i].copy()
                    self.triggers.append(ScenarioTrigger(
                        kind, pos, _route_frame_at(route, pos), name=kind))
                    next_at += spacing
        self._rng = rng

    @classmethod
    def from_definitions(cls, route: Route, definitions: List[dict],
                         seed: int = 0) -> "ScenarioInjector":
        """Build from sampled trigger-JSON scenario definitions
        (``scan_route_for_scenarios`` + ``scenario_sampling`` output) — the
        reference ``_build_scenario_instances`` analog
        (route_scenario.py:362-415)."""
        triggers = []
        for d in definitions:
            tp = d["trigger_position"]
            pos = np.array([float(tp["x"]), float(tp["y"])])
            kind = SCENARIO_KIND.get(d["name"], "stopped_vehicle")
            triggers.append(ScenarioTrigger(
                kind, pos, _route_frame_at(route, pos), name=d["name"],
                other_actors=d.get("other_actors")))
        return cls(route, seed=seed, triggers=triggers)

    def update(self, backend, ego_xy) -> List[str]:
        """Fire triggers the ego is within 20 m of; returns fired names."""
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
                fired.append(trig.name or trig.kind)
                self._spawn(backend, trig, _NPC)
        return fired

    def _spawn(self, backend, trig: ScenarioTrigger, _NPC) -> None:
        fwd = trig.forward
        left = np.array([-fwd[1], fwd[0]])
        pos = trig.position
        if trig.kind == "crossing_walker":
            # walker crossing the road perpendicular to the route, a little
            # ahead of the trigger so the ego meets it mid-crossing
            c = pos + 12.0 * fwd
            backend._npcs.append(_NPC("walker", c - 6.0 * left, c + 6.0 * left,
                                      speed=1.5, phase=0.0))
        elif trig.kind == "stopped_vehicle":
            a = pos + 8.0 * fwd
            backend._npcs.append(_NPC("vehicle", a, a + 0.1 * fwd,
                                      speed=0.0, phase=0.0))
        elif trig.kind == "lead_vehicle_braking":
            # slow vehicle shuttling along the road ahead
            backend._npcs.append(_NPC("vehicle", pos + 12.0 * fwd,
                                      pos + 40.0 * fwd, speed=2.0, phase=0.0))
        elif trig.kind == "vehicle_turning":
            # cuts across the lane ahead, from the near side curb
            c = pos + 15.0 * fwd
            backend._npcs.append(_NPC("vehicle", c + 5.0 * left,
                                      c - 8.0 * left, speed=3.0, phase=0.0))
        elif trig.kind == "opposite_vehicle":
            # oncoming vehicle in the opposite (left) lane, driving at the ego
            a = pos + 45.0 * fwd + 3.5 * left
            backend._npcs.append(_NPC("vehicle", a, a - 60.0 * fwd,
                                      speed=6.0, phase=0.0))
        elif trig.kind == "junction_crossing":
            # crossing traffic through the junction ahead; annotated adversary
            # transforms (other_actors left/right/front) override the default
            placed = False
            for key in ("left", "right", "front"):
                for actor in (trig.other_actors or {}).get(key, []):
                    ax, ay = float(actor["x"]), float(actor["y"])
                    a = np.array([ax, ay])
                    backend._npcs.append(_NPC("vehicle", a, a + 25.0 * left,
                                              speed=5.0, phase=0.0))
                    placed = True
            if not placed:
                c = pos + 20.0 * fwd + 12.0 * left
                backend._npcs.append(_NPC("vehicle", c, c - 25.0 * left,
                                          speed=5.0, phase=0.0))
        elif trig.kind == "control_loss":
            # ~1.5 s of steering noise on the ego's controls
            if hasattr(backend, "inject_control_noise"):
                backend.inject_control_noise(
                    duration=1.5,
                    magnitude=float(self._rng.uniform(0.15, 0.4)))

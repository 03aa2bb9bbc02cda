"""Behavior-tree scenario engine — the srunner scenario-class subset.

The reference vendors CARLA scenario_runner: py_trees behavior/criteria trees
composed into scenario classes (srunner/scenarios/basic_scenario.py:26,
atomic behaviors/trigger conditions, SURVEY §2.7). This is the functional
equivalent over the simulator seam, dependency-free: a tiny tick-driven
behavior tree (Sequence / Parallel composites + atomic behaviors and trigger
conditions) and :class:`BasicScenario` subclasses that assemble behaviors
with the criteria from :mod:`pmoe_tpu.eval.criteria`.

Implemented scenario classes (srunner analogs):
* :class:`FollowLeadingVehicle`  — a lead vehicle drives ahead, brakes, and
  resumes (srunner/scenarios/follow_leading_vehicle.py).
* :class:`DynamicObjectCrossing` — a pedestrian crosses the road when the ego
  approaches (srunner/scenarios/object_crash_vehicle.py).
* :class:`ControlLoss`           — steering noise for a short window
  (srunner/scenarios/control_loss.py).

Run standalone with ``python -m pmoe_tpu.eval.scenario_cli``.
"""

from __future__ import annotations

import enum
from typing import List, Optional, Sequence as Seq

import numpy as np

from ..sim.interface import SIM_DT, EgoState, Route
from .criteria import CollisionTest, CriteriaTree, RouteCompletionTest

__all__ = ["Status", "Behavior", "Sequence", "Parallel", "Idle",
           "TriggerOnDistance", "WaitForSeconds", "SpawnNPC", "SetNPCSpeed",
           "InjectControlNoise", "DriveDistance", "BasicScenario",
           "FollowLeadingVehicle", "DynamicObjectCrossing", "ControlLoss",
           "SCENARIO_CLASSES"]


class Status(enum.Enum):
    RUNNING = 0
    SUCCESS = 1
    FAILURE = 2


class Behavior:
    """One node of the tree; ``tick`` is called once per sim step."""

    name = "behavior"

    def tick(self, backend, ego: EgoState) -> Status:
        raise NotImplementedError


class Sequence(Behavior):
    """Children run one after another; fails on the first failure
    (py_trees.composites.Sequence)."""

    def __init__(self, children: Seq[Behavior], name: str = "sequence"):
        self.children = list(children)
        self.name = name
        self._idx = 0

    def tick(self, backend, ego) -> Status:
        while self._idx < len(self.children):
            status = self.children[self._idx].tick(backend, ego)
            if status == Status.RUNNING:
                return Status.RUNNING
            if status == Status.FAILURE:
                return Status.FAILURE
            self._idx += 1
        return Status.SUCCESS


class Parallel(Behavior):
    """Children tick together; succeeds when one (or all) succeed
    (py_trees.composites.Parallel)."""

    def __init__(self, children: Seq[Behavior], success_on_one: bool = True,
                 name: str = "parallel"):
        self.children = list(children)
        self.success_on_one = success_on_one
        self.name = name

    def tick(self, backend, ego) -> Status:
        statuses = [c.tick(backend, ego) for c in self.children]
        if any(s == Status.FAILURE for s in statuses):
            return Status.FAILURE
        done = [s == Status.SUCCESS for s in statuses]
        if (any(done) if self.success_on_one else all(done)):
            return Status.SUCCESS
        return Status.RUNNING


class Idle(Behavior):
    """Runs forever (srunner Idle) — a Parallel terminator keeps it bounded."""

    def tick(self, backend, ego) -> Status:
        return Status.RUNNING


class TriggerOnDistance(Behavior):
    """SUCCESS once the ego is within ``radius`` of ``position``
    (srunner InTriggerDistanceToLocation)."""

    def __init__(self, position, radius: float = 15.0):
        self.position = np.asarray(position, float)
        self.radius = radius

    def tick(self, backend, ego) -> Status:
        d = float(np.hypot(ego.x - self.position[0], ego.y - self.position[1]))
        return Status.SUCCESS if d < self.radius else Status.RUNNING


class WaitForSeconds(Behavior):
    """SUCCESS after a fixed sim-time window (srunner TimeOut)."""

    def __init__(self, seconds: float):
        self.seconds = seconds
        self._left: Optional[float] = None

    def tick(self, backend, ego) -> Status:
        if self._left is None:
            self._left = self.seconds
        self._left -= SIM_DT
        return Status.SUCCESS if self._left <= 0 else Status.RUNNING


class SpawnNPC(Behavior):
    """Spawn a scripted actor; SUCCESS immediately (ActorSource analog).
    The spawned NPC handle is stored on ``self.npc``."""

    def __init__(self, kind: str, a, b, speed: float):
        self.kind, self.a, self.b, self.speed = kind, a, b, speed
        self.npc = None

    def tick(self, backend, ego) -> Status:
        if self.npc is None:
            from ..sim.fake_carla import _NPC

            self.npc = _NPC(self.kind, self.a, self.b, speed=self.speed,
                            phase=0.0)
            backend._npcs.append(self.npc)
        return Status.SUCCESS


class SetNPCSpeed(Behavior):
    """Change a spawned NPC's speed (StopVehicle / KeepVelocity analog).
    Re-anchors the segment at the NPC's current position so a speed change
    doesn't teleport it."""

    def __init__(self, spawner: SpawnNPC, speed: float):
        self.spawner = spawner
        self.speed = speed

    def tick(self, backend, ego) -> Status:
        npc = self.spawner.npc
        if npc is None:
            return Status.FAILURE
        pos = npc.position(backend.t)
        seg = npc.b - npc.a
        npc.a = pos
        npc.b = pos + seg
        npc.phase = 0.0
        npc.speed = self.speed
        return Status.SUCCESS


class InjectControlNoise(Behavior):
    """Steering noise on the ego (srunner ChangeNoiseParameters)."""

    def __init__(self, duration: float = 1.5, magnitude: float = 0.3):
        self.duration, self.magnitude = duration, magnitude

    def tick(self, backend, ego) -> Status:
        if hasattr(backend, "inject_control_noise"):
            backend.inject_control_noise(self.duration, self.magnitude)
        return Status.SUCCESS


class DriveDistance(Behavior):
    """SUCCESS after the ego drove ``distance`` meters (srunner DriveDistance)."""

    def __init__(self, distance: float):
        self.distance = distance
        self._driven = 0.0

    def tick(self, backend, ego) -> Status:
        self._driven += ego.speed * SIM_DT
        return Status.SUCCESS if self._driven >= self.distance else \
            Status.RUNNING


# ---------------------------------------------------------------------------
# scenario classes
# ---------------------------------------------------------------------------

class BasicScenario:
    """Behavior tree + criteria tree + timeout (srunner BasicScenario:26).

    Subclasses implement ``_create_behavior`` and may extend
    ``_create_criteria``. ``tick`` drives both; ``finished`` is SUCCESS when
    the behavior tree completed or a terminal criterion fired."""

    timeout = 60.0

    def __init__(self, backend, route: Route, seed: int = 0):
        self.backend = backend
        self.route = route
        self._rng = np.random.default_rng(seed)
        self.behavior = self._create_behavior()
        self.criteria = CriteriaTree(self._create_criteria())
        self.status = Status.RUNNING
        self._t = 0.0

    def _create_behavior(self) -> Behavior:
        raise NotImplementedError

    def _create_criteria(self) -> List:
        return [CollisionTest(), RouteCompletionTest(self.route)]

    def _trigger_position(self, meters_in: float):
        cum = np.concatenate([[0.0], np.cumsum(np.sqrt(
            (np.diff(self.route.positions, axis=0) ** 2).sum(-1)))])
        idx = int(np.searchsorted(cum, meters_in))
        return self.route.positions[min(idx, len(self.route.positions) - 1)]

    def tick(self, frame) -> Status:
        ego = self.backend.ego_state()
        if self.status == Status.RUNNING:
            self.status = self.behavior.tick(self.backend, ego)
        self.criteria.update(ego, frame)
        self._t += SIM_DT
        if self._t > self.timeout and self.status == Status.RUNNING:
            self.status = Status.FAILURE
        return self.status

    @property
    def finished(self) -> bool:
        return (self.status != Status.RUNNING
                or self.criteria.should_terminate)


class FollowLeadingVehicle(BasicScenario):
    """A lead vehicle ahead of the ego drives, brakes to a stop, waits, and
    resumes (srunner/scenarios/follow_leading_vehicle.py behavior shape)."""

    def _create_behavior(self) -> Behavior:
        trigger_at = self._trigger_position(20.0)
        ahead = self._trigger_position(45.0)
        far = self._trigger_position(95.0)
        spawner = SpawnNPC("vehicle", ahead, far, speed=4.0)
        return Sequence([
            TriggerOnDistance(trigger_at, 15.0),
            spawner,
            WaitForSeconds(4.0),
            SetNPCSpeed(spawner, 0.0),          # lead brakes
            WaitForSeconds(3.0),
            SetNPCSpeed(spawner, 4.0),          # lead resumes
            DriveDistance(40.0),
        ], name="follow_leading_vehicle")


class DynamicObjectCrossing(BasicScenario):
    """A pedestrian crosses the road when the ego approaches
    (srunner/scenarios/object_crash_vehicle.py)."""

    def _create_behavior(self) -> Behavior:
        trigger_at = self._trigger_position(25.0)
        cross_at = self._trigger_position(45.0)
        a = cross_at + np.array([0.0, -7.0])
        b = cross_at + np.array([0.0, 7.0])
        return Sequence([
            TriggerOnDistance(trigger_at, 15.0),
            SpawnNPC("walker", a, b, speed=1.8),
            DriveDistance(35.0),
        ], name="dynamic_object_crossing")


class ControlLoss(BasicScenario):
    """Steering noise when the ego reaches the trigger
    (srunner/scenarios/control_loss.py)."""

    def _create_behavior(self) -> Behavior:
        return Sequence([
            TriggerOnDistance(self._trigger_position(20.0), 15.0),
            InjectControlNoise(duration=1.5, magnitude=0.3),
            DriveDistance(30.0),
        ], name="control_loss")


SCENARIO_CLASSES = {
    "FollowLeadingVehicle": FollowLeadingVehicle,
    "DynamicObjectCrossing": DynamicObjectCrossing,
    "ControlLoss": ControlLoss,
}

"""Behavior-tree scenario engine — the srunner scenario-class subset.

The reference vendors CARLA scenario_runner: py_trees behavior/criteria trees
composed into scenario classes (srunner/scenarios/basic_scenario.py:26,
atomic behaviors/trigger conditions, SURVEY §2.7). This is the functional
equivalent over the simulator seam, dependency-free: a tiny tick-driven
behavior tree (Sequence / Parallel composites + atomic behaviors and trigger
conditions) and :class:`BasicScenario` subclasses that assemble behaviors
with the criteria from :mod:`pmoe_tpu.eval.criteria`.

Implemented scenario classes (srunner analogs — the full upstream
`srunner/scenarios/` class surface except RouteScenario, which lives in the
leaderboard evaluator, and OpenSCENARIO, which lives in
``eval/openscenario.py``):

* :class:`FollowLeadingVehicle` / :class:`FollowLeadingVehicleWithObstacle`
  — follow_leading_vehicle.py:41,175
* :class:`DynamicObjectCrossing`  — object_crash_vehicle.py (dynamic variant)
* :class:`StationaryObjectCrossing` — object_crash_vehicle.py (static variant)
* :class:`ControlLoss`            — control_loss.py:33
* :class:`CutIn`                  — cut_in.py:32
* :class:`ChangeLane`             — change_lane.py:36
* :class:`OtherLeadingVehicle`    — other_leading_vehicle.py:33
* :class:`ManeuverOppositeDirection` — maneuver_opposite_direction.py:32
* :class:`OppositeVehicleRunningRedLight` — opposite_vehicle_taking_priority.py:36
* :class:`NoSignalJunctionCrossing`  — no_signal_junction_crossing.py:28
* :class:`SignalizedJunctionLeftTurn` / `...RightTurn` —
  signalized_junction_{left,right}_turn.py
* :class:`SignalJunctionCrossingRoute` / :class:`NoSignalJunctionCrossingRoute`
  — junction_crossing_route.py:23,118 (route-simplified variants)
* :class:`VehicleTurningRight` / `VehicleTurningLeft` / `VehicleTurningRoute`
  — object_crash_intersection.py:107,274,441
* :class:`MasterScenario`         — master_scenario.py:25
* :class:`FreeRide`               — freeride.py
* :class:`BackgroundActivity`     — background_activity.py

Run standalone with ``python -m pmoe_tpu.eval.scenario_cli``.
"""

from __future__ import annotations

import enum
from typing import List, Optional, Sequence as Seq

import numpy as np

from ..sim.interface import SIM_DT, EgoState, RoadOption, Route
from .criteria import CollisionTest, CriteriaTree, RouteCompletionTest

__all__ = ["Status", "Behavior", "Sequence", "Parallel", "Idle",
           "TriggerOnDistance", "TriggerOnVehicleDistance", "WaitForSeconds",
           "SpawnNPC", "SetNPCSpeed", "SetNPCPath", "RemoveNPC", "SyncArrival",
           "WaitUntilGreen", "SetLightsGreen", "WaitEndJunction",
           "InjectControlNoise", "DriveDistance",
           "BasicScenario", "FollowLeadingVehicle",
           "FollowLeadingVehicleWithObstacle", "DynamicObjectCrossing",
           "StationaryObjectCrossing", "ControlLoss", "CutIn", "ChangeLane",
           "OtherLeadingVehicle", "ManeuverOppositeDirection",
           "OppositeVehicleRunningRedLight", "NoSignalJunctionCrossing",
           "SignalizedJunctionLeftTurn", "SignalizedJunctionRightTurn",
           "SignalJunctionCrossingRoute", "NoSignalJunctionCrossingRoute",
           "VehicleTurningRight", "VehicleTurningLeft", "VehicleTurningRoute",
           "MasterScenario", "FreeRide",
           "BackgroundActivity", "SCENARIO_CLASSES"]


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
        npc.retarget(backend.t, speed=self.speed)
        return Status.SUCCESS


class SetNPCPath(Behavior):
    """Redirect a spawned NPC toward a new destination (LaneChange /
    cut-in maneuver analog, srunner atomic_behaviors LaneChange)."""

    def __init__(self, spawner: SpawnNPC, target, speed: Optional[float] = None):
        self.spawner = spawner
        self.target = np.asarray(target, float)
        self.speed = speed

    def tick(self, backend, ego) -> Status:
        npc = self.spawner.npc
        if npc is None:
            return Status.FAILURE
        npc.retarget(backend.t, b=self.target, speed=self.speed)
        return Status.SUCCESS


class RemoveNPC(Behavior):
    """Despawn a scripted actor (srunner ActorDestroy)."""

    def __init__(self, spawner: SpawnNPC):
        self.spawner = spawner

    def tick(self, backend, ego) -> Status:
        npc = self.spawner.npc
        if npc is not None and npc in backend._npcs:
            backend._npcs.remove(npc)
        return Status.SUCCESS


class TriggerOnVehicleDistance(Behavior):
    """SUCCESS once the ego is within ``distance`` of a spawned NPC
    (srunner InTriggerDistanceToVehicle)."""

    def __init__(self, spawner: SpawnNPC, distance: float):
        self.spawner = spawner
        self.distance = distance

    def tick(self, backend, ego) -> Status:
        npc = self.spawner.npc
        if npc is None:
            return Status.FAILURE
        d = float(np.linalg.norm(
            npc.position(backend.t) - np.array([ego.x, ego.y])))
        return Status.SUCCESS if d < self.distance else Status.RUNNING


class SyncArrival(Behavior):
    """Pace an NPC so it reaches ``npc_target`` when the ego reaches
    ``ego_target`` (srunner SyncArrival, used by the junction scenarios).
    SUCCESS once the ego is within ``done_radius`` of its target."""

    def __init__(self, spawner: SpawnNPC, ego_target, npc_target,
                 done_radius: float = 15.0, max_speed: float = 15.0):
        self.spawner = spawner
        self.ego_target = np.asarray(ego_target, float)
        self.npc_target = np.asarray(npc_target, float)
        self.done_radius = done_radius
        self.max_speed = max_speed

    def tick(self, backend, ego) -> Status:
        npc = self.spawner.npc
        if npc is None:
            return Status.FAILURE
        p = np.array([ego.x, ego.y])
        d_ego = float(np.linalg.norm(self.ego_target - p))
        if d_ego < self.done_radius:
            return Status.SUCCESS
        t_ego = d_ego / max(ego.speed, 0.5)
        d_npc = float(np.linalg.norm(
            self.npc_target - npc.position(backend.t)))
        npc.retarget(backend.t, b=self.npc_target,
                     speed=float(np.clip(d_npc / t_ego, 0.0, self.max_speed)))
        return Status.RUNNING


class WaitUntilGreen(Behavior):
    """SUCCESS when the traffic light nearest ``position`` is green
    (srunner WaitForTrafficLightState). Backends without lights pass."""

    def __init__(self, position):
        self.position = np.asarray(position, float)

    def tick(self, backend, ego) -> Status:
        lights = getattr(backend, "_lights", None)
        if not lights:
            return Status.SUCCESS
        nearest = min(lights, key=lambda l: (l.x - self.position[0]) ** 2
                      + (l.y - self.position[1]) ** 2)
        return Status.RUNNING if nearest.is_red(backend.t) else Status.SUCCESS


class SetLightsGreen(Behavior):
    """Force the traffic lights nearest ``position`` green for ``duration``
    sim-seconds (srunner TrafficLightManipulator, used by the route variants
    of the junction scenarios: junction_crossing_route.py:23). Backends
    without manipulable lights pass."""

    def __init__(self, position, duration: float = 30.0, n_lights: int = 2):
        self.position = np.asarray(position, float)
        self.duration = duration
        self.n_lights = n_lights

    def tick(self, backend, ego) -> Status:
        lights = getattr(backend, "_lights", None)
        if lights:
            nearest = sorted(lights, key=lambda l: (l.x - self.position[0]) ** 2
                             + (l.y - self.position[1]) ** 2)[:self.n_lights]
            for light in nearest:
                if hasattr(light, "forced_green_until"):
                    light.forced_green_until = backend.t + self.duration
        return Status.SUCCESS


class WaitEndJunction(Behavior):
    """SUCCESS once the ego has passed ``radius`` beyond the junction point
    (srunner WaitEndIntersection, junction_crossing_route.py:166)."""

    def __init__(self, junction, radius: float = 20.0):
        self.junction = np.asarray(junction, float)
        self._was_inside = False
        self.radius = radius

    def tick(self, backend, ego) -> Status:
        d = float(np.hypot(ego.x - self.junction[0], ego.y - self.junction[1]))
        if d < self.radius:
            self._was_inside = True
        return Status.SUCCESS if (self._was_inside and d >= self.radius) \
            else Status.RUNNING


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

    def _route_frame(self, meters_in: float):
        """(position, unit forward, unit left) at arc length ``meters_in`` —
        the lane frame scenario geometry is expressed in."""
        cum = np.concatenate([[0.0], np.cumsum(np.sqrt(
            (np.diff(self.route.positions, axis=0) ** 2).sum(-1)))])
        idx = min(int(np.searchsorted(cum, meters_in)),
                  len(self.route.positions) - 2)
        pos = self.route.positions[idx]
        fwd = self.route.positions[idx + 1] - self.route.positions[idx]
        n = float(np.linalg.norm(fwd)) or 1.0
        fwd = fwd / n
        left = np.array([-fwd[1], fwd[0]])
        return pos, fwd, left

    def _junction_point(self):
        """First route node carrying a turn command (the junction the srunner
        junction scenarios key on); falls back to the route midpoint."""
        for pos, opt in zip(self.route.positions, self.route.options):
            if opt in (RoadOption.LEFT, RoadOption.RIGHT, RoadOption.STRAIGHT):
                return np.asarray(pos, float)
        return np.asarray(
            self.route.positions[len(self.route.positions) // 2], float)

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


class StationaryObjectCrossing(BasicScenario):
    """A static prop blocks the ego lane (srunner
    object_crash_vehicle.py StationaryObjectCrossing)."""

    def _create_behavior(self) -> Behavior:
        pos, _fwd, _left = self._route_frame(45.0)
        return Sequence([
            TriggerOnDistance(self._trigger_position(15.0), 15.0),
            SpawnNPC("static", pos, pos, speed=0.0),
            DriveDistance(50.0),
        ], name="stationary_object_crossing")


class CutIn(BasicScenario):
    """A fast vehicle in the adjacent lane overtakes and cuts in front of the
    ego (srunner/scenarios/cut_in.py:32 behavior shape: accelerate alongside,
    then a lane-change maneuver into the ego lane)."""

    timeout = 90.0

    def _create_behavior(self) -> Behavior:
        pos0, fwd, left = self._route_frame(8.0)
        cut_point, _, _ = self._route_frame(55.0)
        spawner = SpawnNPC("vehicle", pos0 + 3.5 * left,
                           pos0 + 3.5 * left + 130.0 * fwd, speed=7.5)
        return Sequence([
            TriggerOnDistance(self._trigger_position(5.0), 12.0),
            spawner,
            TriggerOnVehicleDistance(spawner, 14.0),
            SetNPCPath(spawner, cut_point, speed=6.0),   # the cut
            DriveDistance(60.0),
        ], name="cut_in")


class ChangeLane(BasicScenario):
    """A slow lead vehicle brakes in the ego lane, forcing a lane change while
    a fast vehicle holds the target lane (srunner/scenarios/change_lane.py:36
    three-vehicle setup)."""

    timeout = 90.0

    def _create_behavior(self) -> Behavior:
        lead_a, fwd, left = self._route_frame(40.0)
        fast_a, _, _ = self._route_frame(5.0)
        lead = SpawnNPC("vehicle", lead_a, lead_a + 70.0 * fwd, speed=3.0)
        fast = SpawnNPC("vehicle", fast_a + 3.5 * left,
                        fast_a + 3.5 * left + 140.0 * fwd, speed=9.0)
        return Sequence([
            TriggerOnDistance(self._trigger_position(15.0), 15.0),
            lead, fast,
            TriggerOnVehicleDistance(lead, 22.0),
            SetNPCSpeed(lead, 0.0),             # lead parks in-lane
            DriveDistance(60.0),
        ], name="change_lane")


class OtherLeadingVehicle(BasicScenario):
    """Two leading vehicles in neighboring lanes; the first decelerates hard
    once the ego closes in (srunner/scenarios/other_leading_vehicle.py:33)."""

    timeout = 90.0

    def _create_behavior(self) -> Behavior:
        lead_a, fwd, left = self._route_frame(35.0)
        other_a, _, _ = self._route_frame(42.0)
        lead = SpawnNPC("vehicle", lead_a, lead_a + 90.0 * fwd, speed=6.0)
        other = SpawnNPC("vehicle", other_a + 3.5 * left,
                         other_a + 3.5 * left + 90.0 * fwd, speed=6.0)
        return Sequence([
            TriggerOnDistance(self._trigger_position(10.0), 12.0),
            lead, other,
            TriggerOnVehicleDistance(lead, 28.0),
            SetNPCSpeed(lead, 1.5),             # sudden deceleration
            DriveDistance(55.0),
        ], name="other_leading_vehicle")


class ManeuverOppositeDirection(BasicScenario):
    """The ego lane is blocked by a parked vehicle and the ego must use the
    opposite lane while traffic approaches head-on
    (srunner/scenarios/maneuver_opposite_direction.py:32)."""

    timeout = 90.0

    def _create_behavior(self) -> Behavior:
        block, fwd, left = self._route_frame(50.0)
        far, _, _ = self._route_frame(110.0)
        blocker = SpawnNPC("vehicle", block, block, speed=0.0)
        oncoming = SpawnNPC("vehicle", far + 3.5 * left,
                            far + 3.5 * left - 100.0 * fwd, speed=6.0)
        return Sequence([
            TriggerOnDistance(self._trigger_position(10.0), 12.0),
            blocker, oncoming,
            DriveDistance(70.0),
        ], name="maneuver_opposite_direction")


class _JunctionCrossingScenario(BasicScenario):
    """Shared shape of the junction scenarios: an adversary vehicle crosses
    the junction perpendicular to the ego, paced by SyncArrival so both meet
    (srunner SyncArrival usage in no_signal_junction_crossing.py:77 and
    opposite_vehicle_taking_priority.py:112)."""

    timeout = 120.0
    approach = 40.0             # adversary spawn distance from the junction
    wait_for_green = False

    def _create_behavior(self) -> Behavior:
        junc = self._junction_point()
        _pos, _fwd, left = self._route_frame(30.0)
        start = junc + self.approach * left
        spawner = SpawnNPC("vehicle", start, start, speed=0.0)
        steps: List[Behavior] = [
            TriggerOnDistance(self._trigger_position(10.0), 12.0)]
        if self.wait_for_green:
            steps.append(WaitUntilGreen(junc))
        steps += [
            spawner,
            SyncArrival(spawner, junc, junc),
            SetNPCPath(spawner, junc - self.approach * left, speed=8.0),
            DriveDistance(45.0),
        ]
        return Sequence(steps, name=type(self).__name__)


class OppositeVehicleRunningRedLight(_JunctionCrossingScenario):
    """A crossing vehicle ignores its red light and takes priority as the ego
    enters the junction (srunner/scenarios/opposite_vehicle_taking_priority.py:36)."""


class NoSignalJunctionCrossing(_JunctionCrossingScenario):
    """Crossing traffic at an unsignalized junction
    (srunner/scenarios/no_signal_junction_crossing.py:28)."""

    approach = 30.0


class SignalizedJunctionLeftTurn(_JunctionCrossingScenario):
    """Ego turns left at a signalized junction against oncoming crossing
    traffic once the light is green
    (srunner/scenarios/signalized_junction_left_turn.py:30)."""

    wait_for_green = True


class SignalizedJunctionRightTurn(_JunctionCrossingScenario):
    """Right turn at a signalized junction with crossing traffic arriving
    from the other side (srunner/scenarios/signalized_junction_right_turn.py:35)."""

    wait_for_green = True
    approach = -35.0            # adversary approaches from the right


class _VehicleTurningScenario(BasicScenario):
    """A crossing actor appears right after the ego's junction turn
    (srunner/scenarios/object_crash_intersection.py — the upstream uses a
    cyclist; the walker kind plays that role here)."""

    timeout = 120.0
    side = 1.0                  # +1 crossing from the left, -1 from the right

    def _create_behavior(self) -> Behavior:
        junc = self._junction_point()
        _pos, fwd, left = self._route_frame(30.0)
        cross_at = junc + 12.0 * fwd
        a = cross_at + self.side * 8.0 * left
        b = cross_at - self.side * 8.0 * left
        return Sequence([
            TriggerOnDistance(junc, 25.0),
            SpawnNPC("walker", a, b, speed=2.5),
            DriveDistance(40.0),
        ], name=type(self).__name__)


class VehicleTurningRight(_VehicleTurningScenario):
    """object_crash_intersection.py:107 — crossing actor after a right turn."""

    side = -1.0


class VehicleTurningLeft(_VehicleTurningScenario):
    """object_crash_intersection.py:274 — crossing actor after a left turn."""

    side = 1.0


class FollowLeadingVehicleWithObstacle(BasicScenario):
    """FollowLeadingVehicle with an obstacle in the LEAD's lane: the lead
    drives, stops behind a standing cyclist, and resumes once the cyclist
    clears when the ego closes in
    (srunner/scenarios/follow_leading_vehicle.py:175 — first actor at 25 m
    @ 10 m/s, second actor 41 m further @ 1.5 m/s crossing)."""

    timeout = 120.0

    def _create_behavior(self) -> Behavior:
        lead_a, fwd, left = self._route_frame(25.0)
        obstacle_at, _, _ = self._route_frame(66.0)
        lead = SpawnNPC("vehicle", lead_a, obstacle_at - 8.0 * fwd, speed=7.0)
        cyclist = SpawnNPC("walker", obstacle_at, obstacle_at, speed=0.0)
        return Sequence([
            TriggerOnDistance(self._trigger_position(10.0), 12.0),
            cyclist, lead,
            TriggerOnVehicleDistance(lead, 20.0),     # ego caught up to lead
            SetNPCPath(cyclist, obstacle_at + 10.0 * left, speed=1.5),
            RemoveNPC(cyclist),
            SetNPCPath(lead, obstacle_at + 80.0 * fwd, speed=7.0),
            DriveDistance(50.0),
        ], name="follow_leading_vehicle_with_obstacle")


class SignalJunctionCrossingRoute(BasicScenario):
    """Route-simplified signalized junction crossing: the lights at the
    junction are forced green so background traffic can conflict with the
    ego, then the ego must clear the junction and drive on
    (srunner/scenarios/junction_crossing_route.py:23 — TrafficLightManipulator
    + DriveDistance(20); criteria MaxVelocity(20, optional) + Collision +
    DrivenDistance(50))."""

    timeout = 180.0
    max_velocity_allowed = 20.0
    expected_driven_distance = 50.0
    distance_to_drive = 20.0
    hack_lights = True

    def _create_behavior(self) -> Behavior:
        junc = self._junction_point()
        steps: List[Behavior] = []
        if self.hack_lights:
            steps.append(SetLightsGreen(junc, duration=120.0))
        else:
            steps.append(WaitEndJunction(junc))
        steps.append(DriveDistance(self.distance_to_drive))
        return Sequence(steps, name=type(self).__name__)

    def _create_criteria(self) -> List:
        from .criteria import DrivenDistanceTest, MaxVelocityTest

        return [MaxVelocityTest(self.max_velocity_allowed, optional=True),
                CollisionTest(),
                DrivenDistanceTest(self.expected_driven_distance),
                RouteCompletionTest(self.route)]


class NoSignalJunctionCrossingRoute(SignalJunctionCrossingRoute):
    """Unsignalized route variant: wait until the ego has left the junction,
    then a short drive-on (junction_crossing_route.py:118 —
    WaitEndIntersection + DriveDistance)."""

    hack_lights = False


class VehicleTurningRoute(_VehicleTurningScenario):
    """Route variant of VehicleTurning: the crossing actor appears after the
    junction on whichever side the route turns
    (srunner/scenarios/object_crash_intersection.py:441)."""

    @property
    def side(self) -> float:                      # type: ignore[override]
        for opt in self.route.options:
            if opt == RoadOption.LEFT:
                return 1.0
            if opt == RoadOption.RIGHT:
                return -1.0
        return 1.0


class MasterScenario(BasicScenario):
    """The route-controlling master scaffold: behavior is Idle (the ego agent
    drives), the criteria tree is the full leaderboard set
    (srunner/scenarios/master_scenario.py:25 — Collision, InRoute(30,
    terminal), RouteCompletion, OutsideRouteLanes, RunningRedLight,
    RunningStop, blocked ActorSpeedAboveThreshold(0.1, 90 s, terminal))."""

    timeout = 300.0

    def _create_behavior(self) -> Behavior:
        # Reference behavior is pure Idle (the criteria terminate the episode);
        # the DriveDistance terminator reports behavior SUCCESS just before the
        # RouteCompletion criterion ends the episode.
        return Parallel([Idle(), DriveDistance(0.85 * self.route.length)],
                        name="master_scenario")

    def _create_criteria(self) -> List:
        from .criteria import (BlockedTest, InRouteTest, OutsideRouteLanesTest,
                               RunningRedLightTest, RunningStopTest)

        return [CollisionTest(),
                InRouteTest(self.route, max_dist=30.0),
                RouteCompletionTest(self.route),
                OutsideRouteLanesTest(self.backend),
                RunningRedLightTest(self.backend),
                RunningStopTest(self.backend),
                BlockedTest(speed_threshold=0.1, max_time=90.0)]


class FreeRide(BasicScenario):
    """No scripted adversary — criteria-only free driving
    (srunner/scenarios/freeride.py)."""

    timeout = 300.0

    def _create_behavior(self) -> Behavior:
        return DriveDistance(max(0.5 * self.route.length, 30.0))


class BackgroundActivity(BasicScenario):
    """Town-wide ambient traffic around the ego's route
    (srunner/scenarios/background_activity.py)."""

    timeout = 300.0
    n_vehicles = 6
    n_walkers = 4

    def _create_behavior(self) -> Behavior:
        children: List[Behavior] = []
        mid = self.route.positions[len(self.route.positions) // 2]
        for _ in range(self.n_vehicles):
            a = mid + self._rng.uniform(-80.0, 80.0, 2)
            b = a + self._rng.uniform(-60.0, 60.0, 2)
            children.append(SpawnNPC("vehicle", a, b,
                                     speed=float(self._rng.uniform(3, 8))))
        for _ in range(self.n_walkers):
            a = mid + self._rng.uniform(-60.0, 60.0, 2)
            b = a + self._rng.uniform(-15.0, 15.0, 2)
            children.append(SpawnNPC("walker", a, b,
                                     speed=float(self._rng.uniform(0.5, 2))))
        children.append(DriveDistance(50.0))
        return Sequence(children, name="background_activity")


SCENARIO_CLASSES = {
    "FollowLeadingVehicle": FollowLeadingVehicle,
    "DynamicObjectCrossing": DynamicObjectCrossing,
    "StationaryObjectCrossing": StationaryObjectCrossing,
    "ControlLoss": ControlLoss,
    "CutIn": CutIn,
    "ChangeLane": ChangeLane,
    "OtherLeadingVehicle": OtherLeadingVehicle,
    "ManeuverOppositeDirection": ManeuverOppositeDirection,
    "OppositeVehicleRunningRedLight": OppositeVehicleRunningRedLight,
    "NoSignalJunctionCrossing": NoSignalJunctionCrossing,
    "SignalizedJunctionLeftTurn": SignalizedJunctionLeftTurn,
    "SignalizedJunctionRightTurn": SignalizedJunctionRightTurn,
    "VehicleTurningRight": VehicleTurningRight,
    "VehicleTurningLeft": VehicleTurningLeft,
    "VehicleTurningRoute": VehicleTurningRoute,
    "FollowLeadingVehicleWithObstacle": FollowLeadingVehicleWithObstacle,
    "SignalJunctionCrossingRoute": SignalJunctionCrossingRoute,
    "NoSignalJunctionCrossingRoute": NoSignalJunctionCrossingRoute,
    "MasterScenario": MasterScenario,
    "FreeRide": FreeRide,
    "BackgroundActivity": BackgroundActivity,
}

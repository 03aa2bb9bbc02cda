"""Scenario evaluation criteria — the functional subset of srunner's atomic
criteria that the PMoE benchmarks exercise (SURVEY §2.7):

* :class:`CollisionTest`      (atomic_criteria.py:285)  — per-type collision
  counting; optionally terminal (NoCrash terminates on collision,
  nocrash_eval_scenario.py:178-213).
* :class:`RouteCompletionTest` (atomic_criteria.py:1587) — % of route driven,
  by projection onto the dense route polyline.
* :class:`RunningRedLightTest` (atomic_criteria.py:1690) — crossings on red.
* :class:`InRouteTest`         (atomic_criteria.py:1456) — terminal when the ego
  strays beyond a max distance from the route.
* :class:`BlockedTest`         (ActorSpeedAboveThresholdTest:439) — terminal
  when speed stays below 0.1 m/s for 180 s.
* :class:`TimeoutTest`         — route timeout at 0.8 s/m (route_scenario.py:51).

Each criterion consumes the per-tick world view and exposes srunner-style
``test_status`` ('SUCCESS' | 'RUNNING' | 'FAILURE') plus an ``actual_value``.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..sim.interface import CollisionEvent, EgoState, Route, SIM_DT

__all__ = ["Criterion", "CollisionTest", "RouteCompletionTest",
           "RunningRedLightTest", "RunningStopTest", "OutsideRouteLanesTest",
           "InRouteTest", "BlockedTest", "TimeoutTest", "MaxVelocityTest",
           "DrivenDistanceTest", "AverageVelocityTest", "KeepLaneTest",
           "ReachedRegionTest", "OffRoadTest", "EndofRoadTest",
           "OnSidewalkTest", "WrongLaneTest", "InRadiusRegionTest",
           "CriteriaTree"]


class Criterion:
    name = "criterion"

    def __init__(self, terminate_on_failure: bool = False,
                 optional: bool = False):
        self.test_status = "RUNNING"
        self.actual_value = 0
        self.terminate_on_failure = terminate_on_failure
        #: srunner ``optional`` flag: recorded but excluded from pass/fail
        self.optional = optional
        self.events: List[dict] = []

    def update(self, ego: EgoState, frame) -> None:
        raise NotImplementedError

    def finalize(self) -> None:
        """Episode-end hook (srunner Criterion.terminate): criteria whose
        success must be *achieved* (velocity/region targets) flip a still-
        RUNNING status to FAILURE here."""

    @property
    def failed(self) -> bool:
        return self.test_status == "FAILURE"


class CollisionTest(Criterion):
    name = "CollisionTest"

    def update(self, ego: EgoState, frame) -> None:
        ev: Optional[CollisionEvent] = frame.collision
        if ev is not None:
            self.actual_value += 1
            self.test_status = "FAILURE"
            self.events.append({"type": f"collision_{ev.other_type}",
                                "frame": ev.frame,
                                "intensity": ev.intensity})


class RouteCompletionTest(Criterion):
    """Route progress by srunner's per-waypoint index accounting
    (atomic_criteria.py:1587-1683): the current index only advances within a
    WINDOWS_SIZE look-ahead, and a waypoint counts as passed when the ego is
    beyond it along the waypoint's own forward direction (dot test) — robust
    on self-intersecting and hairpin routes where distance-window projection
    can jump across the crossing."""

    name = "RouteCompletionTest"
    DISTANCE_THRESHOLD = 10.0     # meters (srunner :1597)
    WINDOWS_SIZE = 2              # waypoints of per-tick look-ahead (:1598)

    def __init__(self, route: Route, dist_success: Optional[float] = None,
                 **kw):
        super().__init__(**kw)
        self.route = route
        pos = np.asarray(route.positions, float)
        seg = np.diff(pos, axis=0)
        self._cum = np.concatenate([[0.0],
                                    np.cumsum(np.sqrt((seg ** 2).sum(-1)))])
        self._total = max(float(self._cum[-1]), 1e-6)
        # per-waypoint forward direction (last one inherits its predecessor's)
        norm = np.sqrt((seg ** 2).sum(-1, keepdims=True))
        fwd = seg / np.maximum(norm, 1e-9)
        self._fwd = np.concatenate([fwd, fwd[-1:]], axis=0)
        self._dist_success = (self.DISTANCE_THRESHOLD if dist_success is None
                              else dist_success)
        self._current_index = 0
        self.actual_value = 0.0

    def update(self, ego: EgoState, frame) -> None:
        if self.test_status == "SUCCESS":
            return
        p = np.array([ego.x, ego.y])
        pos = self.route.positions
        n = len(pos)
        hi = min(self._current_index + self.WINDOWS_SIZE + 1, n)
        for index in range(self._current_index, hi):
            # passed the waypoint along its own forward direction?
            if float(np.dot(p - pos[index], self._fwd[index])) > 0.0:
                self._current_index = index
                self.actual_value = round(
                    100.0 * self._cum[index] / self._total, 2)
        end_dist = float(np.linalg.norm(pos[-1] - p))
        if self.actual_value > 99.0 and end_dist < self._dist_success:
            self.actual_value = 100.0
            self.test_status = "SUCCESS"


class RunningRedLightTest(Criterion):
    name = "RunningRedLightTest"

    def __init__(self, backend, **kw):
        super().__init__(**kw)
        self._backend = backend

    def update(self, ego: EgoState, frame) -> None:
        if self._backend.ran_red_light():
            self.actual_value += 1
            ev = {"type": "red_light", "frame": frame.frame}
            detail = getattr(self._backend, "last_red_light_event",
                             lambda: None)()
            if detail:
                ev.update(detail)
            self.events.append(ev)


class InRouteTest(Criterion):
    name = "InRouteTest"

    def __init__(self, route: Route, max_dist: float = 30.0, **kw):
        super().__init__(terminate_on_failure=True, **kw)
        self.route = route
        self.max_dist = max_dist

    def update(self, ego: EgoState, frame) -> None:
        p = np.array([ego.x, ego.y])
        d = np.sqrt(((self.route.positions - p) ** 2).sum(-1)).min()
        if d > self.max_dist:
            self.test_status = "FAILURE"
            self.events.append({"type": "off_route", "frame": frame.frame})


class BlockedTest(Criterion):
    """Terminal failure when blocked (speed < threshold) too long
    (NoCrash: below_threshold_max_time=180 s, nocrash_eval_scenario.py:196-204)."""

    name = "BlockedTest"

    def __init__(self, speed_threshold: float = 0.1, max_time: float = 180.0,
                 **kw):
        super().__init__(terminate_on_failure=True, **kw)
        self.speed_threshold = speed_threshold
        self.max_time = max_time
        self._blocked_time = 0.0

    def update(self, ego: EgoState, frame) -> None:
        if ego.speed < self.speed_threshold:
            self._blocked_time += SIM_DT
        else:
            self._blocked_time = 0.0
        if self._blocked_time >= self.max_time:
            self.test_status = "FAILURE"
            self.events.append({"type": "blocked", "frame": frame.frame})


class MaxVelocityTest(Criterion):
    """Speed-limit check (srunner atomic_criteria.py MaxVelocityTest:83):
    failure when the ego exceeds ``max_velocity`` m/s. ``optional`` mirrors the
    srunner flag — recorded but not part of pass/fail aggregation."""

    name = "MaxVelocityTest"

    def __init__(self, max_velocity: float, optional: bool = False, **kw):
        super().__init__(optional=optional, **kw)
        self.max_velocity = max_velocity

    def update(self, ego: EgoState, frame) -> None:
        self.actual_value = max(self.actual_value, float(ego.speed))
        if ego.speed > self.max_velocity:
            self.test_status = "FAILURE"
            self.events.append({"type": "max_velocity", "frame": frame.frame,
                                "speed": float(ego.speed)})


class DrivenDistanceTest(Criterion):
    """Minimum-driven-distance check (srunner atomic_criteria.py
    DrivenDistanceTest:126): SUCCESS once the ego's integrated path length
    reaches ``distance_success``; reported as failure if the episode ends
    short (the evaluator reads ``test_status`` at teardown)."""

    name = "DrivenDistanceTest"

    def __init__(self, distance_success: float, **kw):
        super().__init__(**kw)
        self.distance_success = distance_success
        self.test_status = "FAILURE"        # until the distance is reached

    def update(self, ego: EgoState, frame) -> None:
        self.actual_value += float(ego.speed) * SIM_DT
        if self.actual_value >= self.distance_success:
            self.test_status = "SUCCESS"


class RunningStopTest(Criterion):
    """Stop-sign infractions (srunner atomic_criteria.py:1877): the backend
    flags the tick on which the ego left a stop zone without having stopped."""

    name = "RunningStopTest"

    def __init__(self, backend, **kw):
        super().__init__(**kw)
        self._backend = backend

    def update(self, ego: EgoState, frame) -> None:
        if getattr(self._backend, "ran_stop_sign", lambda: False)():
            self.actual_value += 1
            self.test_status = "FAILURE"
            self.events.append({"type": "stop_infraction",
                                "frame": frame.frame})


class OutsideRouteLanesTest(Criterion):
    """Percentage of driven distance spent outside road lanes (srunner
    atomic_criteria.py:1039). The leaderboard multiplies the score by
    (1 - percentage/100) (reference statistics_manager.py:163-166)."""

    name = "OutsideRouteLanesTest"

    def __init__(self, backend, **kw):
        super().__init__(**kw)
        self._backend = backend
        self._driven = 0.0
        self._outside = 0.0

    def update(self, ego: EgoState, frame) -> None:
        step = ego.speed * SIM_DT
        self._driven += step
        if getattr(self._backend, "off_lane", lambda: False)():
            self._outside += step
            self.test_status = "FAILURE"
        self.actual_value = round(
            100.0 * self._outside / max(self._driven, 1e-9), 2)

    @property
    def percentage(self) -> float:
        return float(self.actual_value)

    def summary_events(self):
        if self._outside > 0.0:
            return [{"type": "outside_route_lanes",
                     "percentage": self.percentage,
                     "meters": round(self._outside, 2)}]
        return []


class TimeoutTest(Criterion):
    """Route timeout: 0.8 s per meter of route (route_scenario.py:49-51)."""

    name = "TimeoutTest"

    def __init__(self, route: Route, seconds_per_meter: float = 0.8,
                 minimum: float = 20.0, **kw):
        super().__init__(terminate_on_failure=True, **kw)
        self.timeout = max(route.length * seconds_per_meter, minimum)

    def update(self, ego: EgoState, frame) -> None:
        if frame.timestamp > self.timeout:
            self.test_status = "FAILURE"
            self.events.append({"type": "timeout", "frame": frame.frame})


class AverageVelocityTest(Criterion):
    """Average-velocity target (srunner atomic_criteria.py:202): SUCCESS once
    distance/elapsed exceeds ``avg_velocity_success`` (ACCEPTABLE above the
    secondary threshold); still-RUNNING flips to FAILURE at episode end
    (reference ``terminate``)."""

    name = "AverageVelocityTest"

    def __init__(self, avg_velocity_success: float,
                 avg_velocity_acceptable: Optional[float] = None,
                 optional: bool = False, **kw):
        super().__init__(optional=optional, **kw)
        self.avg_velocity_success = avg_velocity_success
        self.avg_velocity_acceptable = avg_velocity_acceptable
        self._distance = 0.0
        self._elapsed = 0.0
        self.actual_value = 0.0

    def update(self, ego: EgoState, frame) -> None:
        self._distance += float(ego.speed) * SIM_DT
        self._elapsed += SIM_DT
        if self._elapsed > 0.0:
            self.actual_value = round(self._distance / self._elapsed, 3)
        if self.actual_value > self.avg_velocity_success:
            self.test_status = "SUCCESS"
        elif (self.avg_velocity_acceptable is not None
                and self.actual_value > self.avg_velocity_acceptable):
            self.test_status = "ACCEPTABLE"
        else:
            self.test_status = "RUNNING"

    def finalize(self) -> None:
        if self.test_status == "RUNNING":
            self.test_status = "FAILURE"


class KeepLaneTest(Criterion):
    """Lane-keeping (srunner atomic_criteria.py:513): upstream counts
    lane-invasion sensor events; here an invasion is the edge transition onto
    a lane-marking crossing reported by ``backend.off_lane``. Any invasion is
    FAILURE."""

    name = "KeepLaneTest"

    def __init__(self, backend, optional: bool = False, **kw):
        super().__init__(optional=optional, **kw)
        self._backend = backend
        self._was_off = False
        self.test_status = "SUCCESS"

    def update(self, ego: EgoState, frame) -> None:
        off = bool(getattr(self._backend, "off_lane", lambda: False)())
        if off and not self._was_off:
            self.actual_value += 1
            self.events.append({"type": "lane_invasion", "frame": frame.frame})
        self._was_off = off
        self.test_status = "FAILURE" if self.actual_value > 0 else "SUCCESS"


class ReachedRegionTest(Criterion):
    """Axis-aligned region goal (srunner atomic_criteria.py:573): SUCCESS
    latched once the ego enters [min_x,max_x] x [min_y,max_y]; an episode
    ending outside is a FAILURE."""

    name = "ReachedRegionTest"

    def __init__(self, min_x: float, max_x: float, min_y: float, max_y: float,
                 **kw):
        super().__init__(**kw)
        self.bounds = (min_x, max_x, min_y, max_y)

    def update(self, ego: EgoState, frame) -> None:
        if self.test_status == "SUCCESS":
            return
        min_x, max_x, min_y, max_y = self.bounds
        if min_x < ego.x < max_x and min_y < ego.y < max_y:
            self.test_status = "SUCCESS"

    def finalize(self) -> None:
        if self.test_status == "RUNNING":
            self.test_status = "FAILURE"


class InRadiusRegionTest(Criterion):
    """Radial region goal (srunner atomic_criteria.py:1408): SUCCESS latched
    when within ``radius`` of (x, y)."""

    name = "InRadiusRegionTest"

    def __init__(self, x: float, y: float, radius: float, **kw):
        super().__init__(**kw)
        self.center = (x, y)
        self.radius = radius

    def update(self, ego: EgoState, frame) -> None:
        if self.test_status == "SUCCESS":
            return
        if np.hypot(ego.x - self.center[0], ego.y - self.center[1]) \
                < self.radius:
            self.test_status = "SUCCESS"
            self.events.append({"type": "route_completed",
                                "frame": frame.frame})

    def finalize(self) -> None:
        if self.test_status == "RUNNING":
            self.test_status = "FAILURE"


class OffRoadTest(Criterion):
    """Time spent fully off the road network (srunner atomic_criteria.py:624):
    FAILURE once cumulative off-road time exceeds ``duration`` seconds
    (``backend.off_road`` is the map.get_waypoint(project_to_road=False)
    analog — no lane of any type under the actor)."""

    name = "OffRoadTest"

    def __init__(self, backend, duration: float = 0.0, optional: bool = False,
                 **kw):
        super().__init__(optional=optional, **kw)
        self._backend = backend
        self.duration = duration
        self._time_offroad = 0.0

    def update(self, ego: EgoState, frame) -> None:
        if bool(getattr(self._backend, "off_road", lambda: False)()):
            self._time_offroad += SIM_DT
        if self._time_offroad > self.duration:
            if self.test_status != "FAILURE":
                self.events.append({"type": "off_road", "frame": frame.frame})
            self.test_status = "FAILURE"


class EndofRoadTest(Criterion):
    """Road-change detector (srunner atomic_criteria.py:705): once the ego's
    road id differs from the initial one, a timer starts; after ``duration``
    seconds the criterion fails and counts the event."""

    name = "EndofRoadTest"

    def __init__(self, backend, duration: float = 0.0, optional: bool = False,
                 **kw):
        super().__init__(optional=optional, **kw)
        self._backend = backend
        self.duration = duration
        self._road_id: Optional[int] = None
        self._time_since_change: Optional[float] = None

    def update(self, ego: EgoState, frame) -> None:
        road = getattr(self._backend, "road_id", lambda: None)()
        if self._road_id is None:
            self._road_id = road
            return
        if self._time_since_change is None and road != self._road_id:
            self._time_since_change = 0.0
            return
        if self._time_since_change is not None:
            self._time_since_change += SIM_DT
            if self._time_since_change > self.duration \
                    and self.test_status != "FAILURE":
                self.test_status = "FAILURE"
                self.actual_value += 1
                self.events.append({"type": "end_of_road",
                                    "frame": frame.frame})


class OnSidewalkTest(Criterion):
    """Sidewalk invasion accounting (srunner atomic_criteria.py:774,
    point-ego simplification of the four-corner bbox test): accumulates the
    distance driven on the sidewalk band and the time spent outside driving
    lanes; FAILURE once that time exceeds ``duration`` seconds."""

    name = "OnSidewalkTest"

    def __init__(self, backend, duration: float = 0.0, optional: bool = False,
                 **kw):
        super().__init__(optional=optional, **kw)
        self._backend = backend
        self.duration = duration
        self._time_outside = 0.0
        self._sidewalk_distance = 0.0

    def update(self, ego: EgoState, frame) -> None:
        on_walk = bool(getattr(self._backend, "on_sidewalk", lambda: False)())
        off_road = bool(getattr(self._backend, "off_road", lambda: False)())
        if on_walk or off_road:
            self._time_outside += SIM_DT
            if on_walk:
                self._sidewalk_distance += float(ego.speed) * SIM_DT
        if self._time_outside > self.duration:
            if self.test_status != "FAILURE":
                self.events.append({"type": "on_sidewalk",
                                    "frame": frame.frame})
            self.test_status = "FAILURE"
        self.actual_value = round(self._sidewalk_distance, 2)


class WrongLaneTest(Criterion):
    """Wrong-direction driving (srunner atomic_criteria.py:1234): FAILURE
    (counted per entry) while the angle between the ego heading and the
    right-hand-traffic lane direction exceeds MAX_ALLOWED_ANGLE and the ego
    is on a road; accumulates the distance driven against traffic."""

    name = "WrongLaneTest"
    MAX_ALLOWED_ANGLE = 120.0

    def __init__(self, backend, optional: bool = False, **kw):
        super().__init__(optional=optional, **kw)
        self._backend = backend
        self._in_wrong_lane = False
        self._wrong_distance = 0.0

    def update(self, ego: EgoState, frame) -> None:
        lane_dir = getattr(self._backend, "lane_direction", lambda: None)()
        off_lane = bool(getattr(self._backend, "off_lane", lambda: False)())
        if lane_dir is None or off_lane:
            self._in_wrong_lane = False
            return
        heading = np.array([np.cos(ego.yaw), np.sin(ego.yaw)])
        cosang = float(np.clip(np.dot(heading, np.asarray(lane_dir)), -1, 1))
        wrong = np.degrees(np.arccos(cosang)) > self.MAX_ALLOWED_ANGLE
        if wrong and not self._in_wrong_lane:
            self.actual_value += 1
            self.test_status = "FAILURE"
            self.events.append({"type": "wrong_lane", "frame": frame.frame})
        if wrong:
            self._wrong_distance += float(ego.speed) * SIM_DT
        self._in_wrong_lane = wrong

    def summary_events(self):
        if self._wrong_distance > 0.0:
            return [{"type": "wrong_lane_meters",
                     "meters": round(self._wrong_distance, 2)}]
        return []


class CriteriaTree:
    """The per-episode criteria bundle (BasicScenario's criteria tree)."""

    def __init__(self, criteria: List[Criterion]):
        self.criteria = criteria

    def update(self, ego: EgoState, frame) -> None:
        for c in self.criteria:
            c.update(ego, frame)

    def finalize(self) -> None:
        """Episode-end pass (srunner terminate): settle achieved-goal criteria."""
        for c in self.criteria:
            c.finalize()

    @property
    def should_terminate(self) -> bool:
        return any(c.failed and c.terminate_on_failure for c in self.criteria) \
            or any(c.test_status == "SUCCESS"
                   and isinstance(c, RouteCompletionTest)
                   for c in self.criteria)

    def get(self, name: str) -> Optional[Criterion]:
        for c in self.criteria:
            if c.name == name or type(c).__name__ == name:
                return c
        return None

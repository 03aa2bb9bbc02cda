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
           "DrivenDistanceTest", "CriteriaTree"]


class Criterion:
    name = "criterion"

    def __init__(self, terminate_on_failure: bool = False):
        self.test_status = "RUNNING"
        self.actual_value = 0
        self.terminate_on_failure = terminate_on_failure
        self.events: List[dict] = []

    def update(self, ego: EgoState, frame) -> None:
        raise NotImplementedError

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
    name = "RouteCompletionTest"

    def __init__(self, route: Route, dist_success: float = 10.0, **kw):
        super().__init__(**kw)
        self.route = route
        self._cum = np.concatenate([
            [0.0], np.cumsum(np.sqrt(
                (np.diff(route.positions, axis=0) ** 2).sum(-1)))])
        self._total = max(float(self._cum[-1]), 1e-6)
        self._dist_success = dist_success
        self._best_idx = 0
        self.actual_value = 0.0

    def update(self, ego: EgoState, frame) -> None:
        p = np.array([ego.x, ego.y])
        # monotone progress: search a window ahead of the best index
        lo = self._best_idx
        hi = min(lo + 200, len(self.route.positions))
        d = np.sqrt(((self.route.positions[lo:hi] - p) ** 2).sum(-1))
        near = np.where(d < 6.0)[0]
        if near.size:
            self._best_idx = lo + int(near[-1])
        self.actual_value = round(
            100.0 * self._cum[self._best_idx] / self._total, 2)
        end_dist = float(np.linalg.norm(self.route.positions[-1] - p))
        if (end_dist < self._dist_success
                or self._best_idx >= len(self.route.positions) - 2):
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
            self.events.append({"type": "red_light", "frame": frame.frame})


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
        super().__init__(**kw)
        self.max_velocity = max_velocity
        self.optional = optional

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


class CriteriaTree:
    """The per-episode criteria bundle (BasicScenario's criteria tree)."""

    def __init__(self, criteria: List[Criterion]):
        self.criteria = criteria

    def update(self, ego: EgoState, frame) -> None:
        for c in self.criteria:
            c.update(ego, frame)

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

"""NoCrash benchmark evaluator over a :class:`DrivingBackend`.

The functional rebuild of the reference NoCrash stack
(/root/reference/PMoE/leaderboard/leaderboard/nocrash_evaluator.py +
scenarios/nocrash_eval_scenario.py + scenario_manager.py), programmed against
the simulator seam so it runs on the fake backend (tests/CI) and on real CARLA
alike:

* iterates traffic {empty, regular, dense} x routes x weathers with resume-skip
  (nocrash_evaluator.py:369-379);
* per-town traffic tables (nocrash_eval_scenario.py:98-106) and the 6 weather
  presets (:30-37);
* 20 Hz synchronous tick loop: sensors -> agent.run_step -> apply control ->
  criteria tick (scenario_manager.py:138-181);
* episode terminates on collision (NoCrash rule), blocked 180 s, off-route,
  timeout, or completion; logs (route_completion, lights_ran, duration) to the
  resume-aware CSV (nocrash_evaluator.py:332-336).
"""

from __future__ import annotations

import time
from typing import List, Sequence, Tuple

from ..sim.interface import DrivingBackend, SensorFrame, SIM_DT
from .criteria import (BlockedTest, CollisionTest, CriteriaTree, InRouteTest,
                       RouteCompletionTest, RunningRedLightTest, TimeoutTest)
from .manager import run_episode
from .statistics import NoCrashStatisticsManager

__all__ = ["NoCrashEvaluator", "WEATHERS", "TRAFFIC_TABLES",
           "build_input_data", "load_suite", "default_suite_path",
           "nocrash_criteria"]

# weather-preset indices (reference nocrash_eval_scenario.py:30-37)
WEATHERS = {1: "ClearNoon", 3: "WetNoon", 6: "HardRainNoon",
            8: "ClearSunset", 10: "WetSunset", 14: "SoftRainSunset"}
TRAIN_WEATHERS = [1, 3, 6, 8]
TEST_WEATHERS = [10, 14]

TRAFFIC_TABLES = {
    "Town01": {"cars": [0, 20, 100], "peds": [0, 50, 200]},
    "Town02": {"cars": [0, 15, 70], "peds": [0, 50, 150]},
}


def load_suite(path) -> List[Tuple[int, int]]:
    """Parse a NoCrash suite file: one 'start_idx target_idx' spawn pair per
    line (the reference's runners/suite/nocrash_<town>.txt format)."""
    routes = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                routes.append((int(parts[0]), int(parts[1])))
    return routes


def default_suite_path(town: str):
    from pathlib import Path

    p = (Path(__file__).resolve().parent.parent / "assets" / "suites"
         / f"nocrash_{town}.txt")
    return p if p.exists() else None


def build_input_data(frame: SensorFrame) -> dict:
    """Assemble the agent-facing input_data dict synchronously (sensor id ->
    (frame, payload)); cameras deliver BGR. The production episode loop goes
    through the blocking SensorHub engine instead (pmoe_tpu.sim.
    sensor_interface); this fast path serves the RL env and offline tools."""
    data = {}
    if frame.rgb is not None:
        data["Narrow_RGB"] = (frame.frame, frame.rgb[..., ::-1])
    data["EGO"] = (frame.frame, {"spd": frame.speed})
    data["GPS"] = (frame.frame, frame.gnss)
    data["COMPASS"] = (frame.frame, frame.compass)
    data["COLLISION"] = (frame.frame, frame.collision is not None)
    return data


def nocrash_criteria(backend, trace) -> CriteriaTree:
    """The NoCrash episode's criteria tree (nocrash_eval_scenario.py:178-213):
    terminate-on-collision, route completion, red lights, in-route, blocked
    180 s, route timeout. Shared by the per-episode evaluator and the fleet
    runner so both paths score identically."""
    return CriteriaTree([
        CollisionTest(terminate_on_failure=True),     # NoCrash rule
        RouteCompletionTest(trace),
        RunningRedLightTest(backend),
        InRouteTest(trace),
        BlockedTest(),
        TimeoutTest(trace),
    ])


class NoCrashEvaluator:
    def __init__(self, backend: DrivingBackend, stats: NoCrashStatisticsManager,
                 weather_group: str = "train",
                 routes: Sequence[Tuple[int, int]] | None = None,
                 max_ticks: int | None = None, verbose: bool = True,
                 sensor_hub=None, record_dir=None):
        self.backend = backend
        self.stats = stats
        self.sensor_hub = sensor_hub        # injectable for failure tests
        self.record_dir = record_dir       # per-episode recordings for metrics
        self.weathers = (TRAIN_WEATHERS if weather_group == "train"
                         else TEST_WEATHERS)
        if routes is not None:
            self.routes: List[Tuple[int, int]] = list(routes)
        else:
            # suite file (reference runners/suite/nocrash_<town>.txt), else
            # fabricated spawn pairs
            suite = default_suite_path(backend.town)
            if suite is not None:
                self.routes = load_suite(suite)
            else:
                n_spawn = len(backend.spawn_points())
                self.routes = [(i, (i + 5) % n_spawn)
                               for i in range(0, n_spawn, 3)]
        self.max_ticks = max_ticks
        self.verbose = verbose

    def run(self, agent_factory) -> None:
        """agent_factory() -> a fresh AutonomousAgent per episode."""
        town = self.backend.town
        table = TRAFFIC_TABLES.get(town, TRAFFIC_TABLES["Town01"])
        for traffic_idx in range(3):
            for route in self.routes:
                for weather in self.weathers:
                    if self.stats.is_finished(town, route, weather, traffic_idx):
                        if self.verbose:
                            print(f"skip finished {town} t{traffic_idx} "
                                  f"w{weather} route{route}")
                        continue
                    self._run_episode(agent_factory, town, traffic_idx,
                                      weather, route, table)

    def _run_episode(self, agent_factory, town, traffic_idx, weather, route,
                     table) -> None:
        start_idx, target_idx = route
        trace = self.backend.trace_route(start_idx, target_idx)
        frame = self.backend.reset(
            trace, weather=weather,
            n_vehicles=table["cars"][traffic_idx],
            n_pedestrians=table["peds"][traffic_idx],
            seed=hash((traffic_idx, weather, start_idx, target_idx)) % (2**31))

        agent = agent_factory()
        agent.set_global_plan(trace.gps_plan())

        criteria = nocrash_criteria(self.backend, trace)

        recorder = None
        if self.record_dir is not None:
            from pathlib import Path

            from .recorder import EpisodeRecorder

            Path(self.record_dir).mkdir(parents=True, exist_ok=True)
            recorder = EpisodeRecorder(town=town, route=trace)

        t0 = time.perf_counter()
        result = run_episode(self.backend, agent, criteria, frame,
                             max_ticks=self.max_ticks,
                             sensor_hub=self.sensor_hub, route=trace,
                             recorder=recorder)
        agent.destroy()
        if recorder is not None:
            from pathlib import Path

            recorder.save(str(
                Path(self.record_dir)
                / f"{town}_t{traffic_idx}_w{weather}_{start_idx}"
                  f"_{target_idx}.json"))
        rc = criteria.get("RouteCompletionTest")
        lights = criteria.get("RunningRedLightTest")
        duration_game = result.ticks * SIM_DT
        # an agent crash fails the episode with the completion it reached
        # (reference nocrash_evaluator.py:305-318 AgentError branch)
        self.stats.log(town, traffic_idx, weather, start_idx, target_idx,
                       float(rc.actual_value), int(lights.actual_value),
                       duration_game)
        if self.verbose:
            wall = time.perf_counter() - t0
            status = (f"AGENT-ERROR({result.agent_error})"
                      if result.crashed else "ok")
            print(f"[nocrash] {town} t{traffic_idx} w{weather} "
                  f"{start_idx}->{target_idx}: RC={rc.actual_value:.1f}% "
                  f"lights={lights.actual_value} game={duration_game:.1f}s "
                  f"wall={wall:.1f}s ({result.ticks / max(wall, 1e-9):.1f} fps) "
                  f"{status}")

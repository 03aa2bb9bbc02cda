"""CARLA-leaderboard-style route evaluator with composed scoring.

Functional rebuild of the reference ``LeaderboardEvaluator``
(leaderboard_evaluator.py:60-493) over the simulator seam: RouteIndexer work
queue with JSON resume (:407-428), per-route criteria, infraction records and
``route_completion x prod(penalties)`` scoring via
:class:`pmoe_tpu.eval.statistics.StatisticsManager` (:247-263,436-439).
"""

from __future__ import annotations

import time
from typing import List

from ..sim.interface import DrivingBackend, SIM_DT
from .criteria import (BlockedTest, CollisionTest, CriteriaTree, InRouteTest,
                       OutsideRouteLanesTest, RouteCompletionTest,
                       RunningRedLightTest, RunningStopTest, TimeoutTest)
from .manager import run_episode
from .route_indexer import RouteIndexer
from .scenarios import ScenarioInjector
from .statistics import StatisticsManager

__all__ = ["LeaderboardEvaluator"]


class LeaderboardEvaluator:
    def __init__(self, backend: DrivingBackend, stats: StatisticsManager,
                 checkpoint_path: str = "./simulation_results.json",
                 n_vehicles: int = 0, n_pedestrians: int = 0,
                 max_ticks: int | None = None, verbose: bool = True,
                 inject_scenarios: bool = True, scenario_spacing: float = 80.0,
                 sensor_hub=None, record_dir=None, scenarios_file=None):
        self.backend = backend
        self.stats = stats
        self.checkpoint_path = checkpoint_path
        self.n_vehicles = n_vehicles
        self.n_pedestrians = n_pedestrians
        self.max_ticks = max_ticks
        self.verbose = verbose
        self.inject_scenarios = inject_scenarios
        self.scenario_spacing = scenario_spacing
        self.sensor_hub = sensor_hub        # injectable for failure tests
        self.record_dir = record_dir       # per-route recordings for metrics
        # per-town trigger-JSON annotations (all_towns_traffic_scenarios.json
        # schema): when present, scenarios are position+heading-matched to
        # each route (reference semantics) instead of spacing-injected
        self.annotations = None
        if scenarios_file:
            from .route_parser import parse_annotations_file

            self.annotations = parse_annotations_file(scenarios_file)

    def run(self, agent_factory, route_indexer: RouteIndexer,
            resume: bool = False) -> dict:
        if resume:
            route_indexer.resume(self.checkpoint_path + ".index")
            self.stats.resume(self.checkpoint_path)
        while route_indexer.peek():
            cfg = route_indexer.next()
            self._run_route(agent_factory, cfg)
            route_indexer.save_state(self.checkpoint_path + ".index")
            self.stats.save(self.checkpoint_path)
        glob = self.stats.compute_global_statistics(route_indexer.total)
        self.stats.save(self.checkpoint_path)
        if self.verbose:
            print(f"[leaderboard] global: {glob['scores']}")
        return glob

    def _trace(self, cfg):
        """Resolve the dense route: explicit XML waypoints when the config
        carries them (reference route_parser.py), else spawn-point tracing."""
        if cfg.waypoints is not None:
            from .route_parser import interpolate_route
            return interpolate_route(cfg.waypoints)
        return self.backend.trace_route(cfg.start_idx, cfg.target_idx)

    def _make_injector(self, cfg, trace):
        if not self.inject_scenarios:
            return None
        if self.annotations is not None:
            from .route_parser import (scan_route_for_scenarios,
                                       scenario_sampling)

            possible = scan_route_for_scenarios(cfg.town, trace,
                                                self.annotations)
            defs = scenario_sampling(possible, seed=cfg.index)
            return ScenarioInjector.from_definitions(trace, defs,
                                                     seed=cfg.index)
        return ScenarioInjector(trace, spacing=self.scenario_spacing,
                                seed=cfg.index)

    def _run_route(self, agent_factory, cfg) -> None:
        if cfg.town != getattr(self.backend, "town", cfg.town) \
                and hasattr(self.backend, "load_world"):
            self.backend.load_world(cfg.town)   # route is town-parameterized
        trace = self._trace(cfg)
        frame = self.backend.reset(trace, weather=1,
                                   n_vehicles=self.n_vehicles,
                                   n_pedestrians=self.n_pedestrians,
                                   seed=cfg.index)
        agent = agent_factory()
        agent.set_global_plan(trace.gps_plan())
        self.stats.set_route(cfg.name, cfg.index)

        criteria = CriteriaTree([
            CollisionTest(),                       # NOT terminal on leaderboard
            RouteCompletionTest(trace),
            RunningRedLightTest(self.backend),
            RunningStopTest(self.backend),
            OutsideRouteLanesTest(self.backend),
            InRouteTest(trace),
            BlockedTest(),
            TimeoutTest(trace),
        ])
        injector = self._make_injector(cfg, trace)

        recorder = None
        if self.record_dir is not None:
            from pathlib import Path

            from .recorder import EpisodeRecorder

            Path(self.record_dir).mkdir(parents=True, exist_ok=True)
            recorder = EpisodeRecorder(town=self.backend.town, route=trace)

        result = run_episode(self.backend, agent, criteria, frame,
                             max_ticks=self.max_ticks, injector=injector,
                             sensor_hub=self.sensor_hub, route=trace,
                             recorder=recorder)
        ticks = result.ticks
        agent.destroy()
        if recorder is not None:
            from pathlib import Path

            recorder.save(str(Path(self.record_dir)
                              / f"{cfg.name}_rep{cfg.repetition_index}.json"))

        rc = criteria.get("RouteCompletionTest")
        events = {
            "collision_pedestrian": [], "collision_vehicle": [],
            "collision_static": [], "red_light": [],
            "vehicle_blocked": [], "route_timeout": [], "route_dev": [],
        }
        for ev in criteria.get("CollisionTest").events:
            kind = ev["type"].replace("collision_walker", "collision_pedestrian")
            events.setdefault(kind, []).append(ev)
        events["red_light"] = criteria.get("RunningRedLightTest").events
        events["stop_infraction"] = criteria.get("RunningStopTest").events
        events["outside_route_lanes"] = \
            criteria.get("OutsideRouteLanesTest").summary_events()
        events["vehicle_blocked"] = criteria.get("BlockedTest").events
        events["route_timeout"] = criteria.get("TimeoutTest").events
        events["route_dev"] = criteria.get("InRouteTest").events

        status = ("Failed - Agent crashed" if result.crashed
                  else "Completed" if rc.actual_value == 100.0 else "Failed")
        record = self.stats.compute_route_statistics(
            cfg.index, float(rc.actual_value), events,
            duration_game=ticks * SIM_DT, status=status)
        if self.verbose:
            fired = (f" scenarios={result.fired_scenarios}"
                     if result.fired_scenarios else "")
            print(f"[leaderboard] {cfg.name} rep{cfg.repetition_index}: "
                  f"composed={record.scores['score_composed']:.1f} "
                  f"route={record.scores['score_route']:.1f} "
                  f"penalty={record.scores['score_penalty']:.2f} "
                  f"status={status}{fired}")

"""Standalone scenario runner CLI (srunner's scenario_runner.py role).

Runs one behavior-tree scenario class against a backend with a scripted or
trained agent and prints the criteria results.

Usage: ``python -m pmoe_tpu.eval.scenario_cli --scenario FollowLeadingVehicle
[--agent follow|image] [--config CONF]``
"""

from __future__ import annotations

import argparse

import math

import numpy as np

from ..agents.autonomous_agent import AutonomousAgent
from ..agents.waypointer import Waypointer
from ..sim.fake_carla import FakeCarlaBackend
from ..sim.interface import VehicleControl
from .behaviors import SCENARIO_CLASSES, Status
from .manager import run_episode

__all__ = ["main", "run_scenario", "ScriptedFollowAgent"]


class ScriptedFollowAgent(AutonomousAgent):
    """Pure-pursuit follower on the GPS plan (no model) — the scripted ego
    driver for standalone scenario runs."""

    def setup(self, cfg) -> None:
        self.waypointer = None
        self.target_speed = float((cfg or {}).get("target_speed", 6.0)) \
            if isinstance(cfg, dict) else 6.0

    def run_step(self, input_data, timestamp):
        _, gps = input_data["GPS"]
        _, ego = input_data["EGO"]
        if self.waypointer is None:
            self.waypointer = Waypointer(self._global_plan, gps,
                                         threshold_before=25.0,
                                         threshold_after=25.0)
        self.waypointer.tick(gps)
        nxt = min(self.waypointer.current_idx + 1,
                  len(self.waypointer.global_plan) - 1)
        wx, wy, _cmd = self.waypointer.global_plan[max(nxt, 0)]
        x, y = self.waypointer.latlon_to_xy(gps[0], gps[1])
        heading = input_data.get("COMPASS", (0, 0.0))[1]
        err = (math.atan2(wy - y, wx - x) - heading + math.pi) \
            % (2 * math.pi) - math.pi
        return VehicleControl(
            steer=float(np.clip(err, -1, 1)),
            throttle=0.6 if ego["spd"] < self.target_speed else 0.0)


def run_scenario(backend, scenario_cls, agent, start_idx=0, target_idx=3,
                 max_ticks=2000, seed=0, verbose=True, record=None):
    route = backend.trace_route(start_idx, target_idx)
    frame = backend.reset(route, seed=seed)
    agent.set_global_plan(route.gps_plan())
    scenario = scenario_cls(backend, route, seed=seed)
    recorder = None
    if record is not None:
        from .recorder import EpisodeRecorder

        recorder = EpisodeRecorder(town=backend.town, route=route)

    class _ScenarioCriteria:
        """Adapter: the tick engine drives criteria.update; route the tick
        through the scenario so behaviors advance with the world."""

        should_terminate = False

        def update(self, ego, fr):
            scenario.tick(fr)
            self.should_terminate = scenario.finished

        def get(self, name):
            return scenario.criteria.get(name)

        def finalize(self):
            scenario.criteria.finalize()

    result = run_episode(backend, agent, _ScenarioCriteria(), frame,
                         max_ticks=max_ticks, route=route, recorder=recorder)
    if recorder is not None:
        recorder.record_criteria(scenario.criteria)   # the real criteria tree
        recorder.save(record)
    rc = scenario.criteria.get("RouteCompletionTest")
    col = scenario.criteria.get("CollisionTest")
    if verbose:
        print(f"[scenario] {scenario_cls.__name__}: behavior="
              f"{scenario.status.name} ticks={result.ticks} "
              f"RC={rc.actual_value:.1f}% collisions={col.actual_value}")
    return scenario, result


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--scenario", default="FollowLeadingVehicle",
                        choices=sorted(SCENARIO_CLASSES))
    parser.add_argument("--openscenario", default=None, metavar="FILE.xosc",
                        help="run an OpenSCENARIO document instead of a "
                             "named scenario class")
    parser.add_argument("--agent", default="follow",
                        choices=["follow", "image"])
    parser.add_argument("--config", default="pmoe_tpu/conf/benchmark")
    parser.add_argument("--town", default="Town01")
    parser.add_argument("--max-ticks", type=int, default=2000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--record", default=None, metavar="OUT.json",
                        help="save an episode recording for the metrics "
                             "module (python -m pmoe_tpu.eval.metrics_manager)")
    args = parser.parse_args(argv)

    if args.openscenario:
        from .openscenario import OpenScenario, load_xosc

        xosc_cfg = load_xosc(args.openscenario)

        def scenario_cls(backend, route, seed=0):
            return OpenScenario(backend, route, seed=seed, config=xosc_cfg)

        scenario_cls.__name__ = f"OpenScenario({xosc_cfg.name})"
    else:
        scenario_cls = SCENARIO_CLASSES[args.scenario]

    backend = FakeCarlaBackend(town=args.town,
                               render=(args.agent == "image"))
    if args.agent == "image":
        from ..agents.image_agent import ImageAgent
        from ..utils import get_conf

        agent = ImageAgent(get_conf(args.config))
    else:
        agent = ScriptedFollowAgent(None)
    try:
        scenario, _ = run_scenario(backend, scenario_cls,
                                   agent, max_ticks=args.max_ticks,
                                   seed=args.seed, record=args.record)
    finally:
        backend.close()
    raise SystemExit(0 if scenario.status == Status.SUCCESS else 1)


if __name__ == "__main__":
    main()

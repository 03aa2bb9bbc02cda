"""Closed-loop tests: fake backend physics, criteria, waypointer, and the full
NoCrash / leaderboard episode loop with a scripted agent (no simulator, no
neural net — the loop mechanics themselves)."""

import numpy as np
import pytest

from pmoe_tpu.agents.autonomous_agent import AutonomousAgent
from pmoe_tpu.agents.waypointer import Waypointer
from pmoe_tpu.eval import (LeaderboardEvaluator, NoCrashEvaluator,
                           NoCrashStatisticsManager, RouteIndexer,
                           StatisticsManager, view_results)
from pmoe_tpu.sim.fake_carla import FakeCarlaBackend
from pmoe_tpu.sim.interface import RoadOption, VehicleControl


class FollowAgent(AutonomousAgent):
    """Scripted pure-pursuit agent following the GPS plan."""

    def setup(self, _cfg):
        self.waypointer = None

    def run_step(self, input_data, timestamp):
        _, gps = input_data["GPS"]
        _, ego = input_data["EGO"]
        if self.waypointer is None:
            self.waypointer = Waypointer(self._global_plan, gps,
                                         threshold_after=25.0,
                                         threshold_before=25.0)
        self.waypointer.tick(gps)
        # pure pursuit: aim at the node AFTER the consumed checkpoint (the
        # checkpoint itself is at/behind the ego once consumed)
        nxt = min(self.waypointer.current_idx + 1,
                  len(self.waypointer.global_plan) - 1)
        wx, wy, _cmd = self.waypointer.global_plan[max(nxt, 0)]
        x, y = self.waypointer.latlon_to_xy(gps[0], gps[1])
        # steer toward the next checkpoint
        import math
        heading = input_data.get("COMPASS", (0, 0.0))[1]
        target = math.atan2(wy - y, wx - x)
        err = (target - heading + math.pi) % (2 * math.pi) - math.pi
        control = VehicleControl(steer=float(np.clip(err, -1, 1)),
                                 throttle=0.6 if ego["spd"] < 7 else 0.0,
                                 brake=0.0)
        return control




def test_backend_physics_basics():
    b = FakeCarlaBackend(render=False)
    route = b.trace_route(0, 5)
    assert route.length > 50
    f = b.reset(route)
    assert f.speed == 0.0
    for _ in range(40):
        f = b.tick(VehicleControl(throttle=1.0))
    assert b.ego_state().speed > 3.0          # accelerates
    v = b.ego_state().speed
    for _ in range(40):
        f = b.tick(VehicleControl(brake=1.0))
    assert b.ego_state().speed < 0.5          # brakes


def test_backend_determinism():
    def run():
        b = FakeCarlaBackend(render=False)
        r = b.trace_route(0, 7)
        b.reset(r, n_vehicles=10, seed=3)
        for _ in range(50):
            b.tick(VehicleControl(throttle=0.5, steer=0.1))
        e = b.ego_state()
        return (e.x, e.y, e.yaw, e.speed)

    assert run() == run()


def test_camera_renders():
    b = FakeCarlaBackend(img_width=160, img_height=120)
    f = b.reset(b.trace_route(0, 5))
    assert f.rgb.shape == (120, 160, 3) and f.rgb.dtype == np.uint8
    # road pixels present (gray band differs from grass)
    assert (np.abs(f.rgb.astype(int) - np.array([90, 90, 95])).sum(-1) < 30).any()


def test_waypointer_advances_and_commands():
    b = FakeCarlaBackend(render=False)
    route = b.trace_route(0, 9)      # includes a turn
    plan = route.gps_plan()[::10]
    wp = Waypointer(plan, (plan[0][0]["lat"], plan[0][0]["lon"], 0.0),
                    threshold_after=12.0, threshold_before=12.0)
    # walk along the route; the checkpoint should advance
    advanced = 0
    for (gnss, _cmd) in plan:
        wp.tick((gnss["lat"], gnss["lon"], 0.0))
        advanced = max(advanced, wp.current_idx)
    assert advanced > 0
    assert any(cmd in (RoadOption.LEFT, RoadOption.RIGHT)
               for _, _, cmd in wp.global_plan)


def test_nocrash_episode_loop(tmp_path):
    backend = FakeCarlaBackend(render=False)
    stats = NoCrashStatisticsManager(str(tmp_path), "Town01", "train")
    ev = NoCrashEvaluator(backend, stats, routes=[(0, 1)], max_ticks=400)
    ev.weathers = [1]
    ev.run(lambda: FollowAgent(None))
    stats.close()
    csv_path = tmp_path / "Town01_train.csv"
    lines = csv_path.read_text().strip().splitlines()
    assert len(lines) == 1 + 3        # header + 3 traffic levels x 1 route x 1 weather
    # resume skips finished episodes
    stats2 = NoCrashStatisticsManager(str(tmp_path), "Town01", "train",
                                      resume=True)
    assert stats2.is_finished("Town01", (0, 1), 1, 0)
    stats2.close()


def test_nocrash_resume_onto_empty_csv_writes_header(tmp_path):
    """Resuming onto an EMPTY csv (a run aborted between file creation and
    the header write) must start fresh with a header — appending produces a
    headerless file whose first data row becomes the DictReader header,
    poisoning later resume and view_results (KeyError: 'weather')."""
    csv_path = tmp_path / "Town01_train.csv"
    csv_path.write_text("")
    stats = NoCrashStatisticsManager(str(tmp_path), "Town01", "train",
                                     resume=True)
    stats.log("Town01", 0, 1, 0, 13, 42.0, 0, 8.5)
    stats.close()
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0].startswith("town,traffic,weather"), lines[0]
    stats2 = NoCrashStatisticsManager(str(tmp_path), "Town01", "train",
                                      resume=True)
    assert stats2.is_finished("Town01", (0, 13), 1, 0)
    stats2.close()


def test_nocrash_record_dir_feeds_metrics(tmp_path):
    """--record-dir on the NoCrash evaluator writes recordings the metrics
    module can replay (reference metrics_manager flow over recorder logs)."""
    from pmoe_tpu.eval.metrics_manager import run_metric

    backend = FakeCarlaBackend(render=False)
    stats = NoCrashStatisticsManager(str(tmp_path), "Town01", "train")
    rec_dir = tmp_path / "recordings"
    ev = NoCrashEvaluator(backend, stats, routes=[(0, 2)], max_ticks=400,
                          record_dir=str(rec_dir), verbose=False)
    ev.weathers = [1]
    ev._run_episode(lambda: FollowAgent(None), "Town01", 1, 1, (0, 2),
                    {"cars": [0, 3, 0], "peds": [0, 1, 0]})
    stats.close()
    recs = list(rec_dir.glob("*.json"))
    assert len(recs) == 1
    m = run_metric(str(recs[0]), "pmoe_tpu.eval.metrics.distance_to_route",
                   out_prefix=str(tmp_path / "m"))
    assert m.results["mean_deviation"] >= 0.0


def test_straight_route_completes(tmp_path):
    """A scripted follower on a straight route should reach high completion."""
    backend = FakeCarlaBackend(render=False)
    stats = NoCrashStatisticsManager(str(tmp_path), "Town01", "train")
    ev = NoCrashEvaluator(backend, stats, routes=[(0, 2)], max_ticks=3000)
    ev.weathers = [1]
    ev._run_episode(lambda: FollowAgent(None), "Town01", 0, 1, (0, 2),
                    {"cars": [0, 0, 0], "peds": [0, 0, 0]})
    stats.close()
    import csv as csvmod
    with open(tmp_path / "Town01_train.csv") as f:
        row = list(csvmod.DictReader(f))[0]
    assert float(row["route_completion"]) > 50.0


def test_leaderboard_scoring_penalties(tmp_path):
    stats = StatisticsManager()
    stats.set_route("r0", 0)
    rec = stats.compute_route_statistics(
        0, 80.0, {"collision_vehicle": [{"f": 1}], "red_light": [{"f": 2}]})
    np.testing.assert_allclose(rec.scores["score_penalty"], 0.6 * 0.7)
    np.testing.assert_allclose(rec.scores["score_composed"], 80 * 0.42)
    ckpt = tmp_path / "res.json"
    stats.save(str(ckpt))
    stats2 = StatisticsManager()
    stats2.resume(str(ckpt))
    glob = stats2.compute_global_statistics(1)
    np.testing.assert_allclose(glob["scores"]["score_composed"], 80 * 0.42)


def test_leaderboard_evaluator_runs(tmp_path):
    backend = FakeCarlaBackend(render=False)
    stats = StatisticsManager()
    ev = LeaderboardEvaluator(backend, stats,
                              checkpoint_path=str(tmp_path / "sim.json"),
                              max_ticks=200, verbose=False,
                              record_dir=str(tmp_path / "rec"))
    indexer = RouteIndexer([(0, 1), (2, 3)], repetitions=1)
    glob = ev.run(lambda: FollowAgent(None), indexer)
    assert glob["finished_routes"] == 2
    assert (tmp_path / "sim.json").exists()
    # --record-dir parity with the NoCrash evaluator: one recording per route
    from pmoe_tpu.eval.recorder import MetricsLog

    recs = sorted((tmp_path / "rec").glob("*.json"))
    assert len(recs) == 2
    assert MetricsLog.load(str(recs[0])).get_total_frame_count() > 0


def test_view_results(tmp_path, capsys):
    stats = NoCrashStatisticsManager(str(tmp_path), "Town01", "train")
    stats.log("Town01", 0, 1, 0, 1, 100.0, 2, 120.0)
    stats.log("Town01", 0, 3, 0, 1, 50.0, 0, 60.0)
    stats.close()
    out = view_results(str(tmp_path), "Success Rate")
    assert "Town01" in out and "50.0%" in out
    out2 = view_results(str(tmp_path), "Lights Ran")
    assert "per hour" in out2


# ---------------------------------------------------------------------------
# sensor-interface engine, exception taxonomy, scenario injection, XML routes
# ---------------------------------------------------------------------------

def test_sensor_interface_blocking_and_timeout():
    from pmoe_tpu.sim.sensor_interface import (SensorInterface,
                                               SensorReceivedNoData)

    iface = SensorInterface(timeout=0.2)
    iface.register("A")
    iface.register("B")
    iface.update_sensor("A", 1, "a")
    iface.update_sensor("B", 1, "b")
    data = iface.get_data()
    assert data == {"A": (1, "a"), "B": (1, "b")}
    iface.update_sensor("A", 2, "a2")      # B never delivers again
    with pytest.raises(SensorReceivedNoData, match="B"):
        iface.get_data()


def test_agent_crash_fails_episode_but_run_continues(tmp_path):
    """AgentError taxonomy (reference nocrash_evaluator.py:305-318): a crashing
    agent fails its episode; the evaluator moves on to the next one."""

    class CrashingAgent(FollowAgent):
        def run_step(self, input_data, timestamp):
            if input_data["EGO"][1]["spd"] > 2.0:
                raise RuntimeError("model blew up")
            return super().run_step(input_data, timestamp)

    backend = FakeCarlaBackend(render=False)
    stats = NoCrashStatisticsManager(str(tmp_path), "Town01", "train")
    ev = NoCrashEvaluator(backend, stats, routes=[(0, 1), (0, 2)],
                          max_ticks=300, verbose=False)
    ev.weathers = [1]
    ev.run(lambda: CrashingAgent(None))
    stats.close()
    import csv as csvmod
    with open(tmp_path / "Town01_train.csv") as f:
        rows = list(csvmod.DictReader(f))
    # 3 traffic levels x 2 routes x 1 weather — every episode logged despite
    # the agent crashing in each
    assert len(rows) == 6
    assert all(float(r["route_completion"]) < 100.0 for r in rows)


def test_sensor_loss_aborts_run():
    """A dead pseudo-sensor raises SensorReceivedNoData out of the episode
    loop (reference sensor_interface.py:434-438 -> run abort)."""
    from pmoe_tpu.eval import run_episode, SensorReceivedNoData
    from pmoe_tpu.eval.criteria import CriteriaTree, RouteCompletionTest
    from pmoe_tpu.sim.sensor_interface import SensorHub

    backend = FakeCarlaBackend(render=False)
    route = backend.trace_route(0, 2)
    frame = backend.reset(route)
    hub = SensorHub(timeout=0.3, with_camera=False)
    steps = {"n": 0}

    class KillerAgent(AutonomousAgent):
        def run_step(self, input_data, timestamp):
            steps["n"] += 1
            if steps["n"] == 5:
                hub.readers[0].kill()       # speedometer dies mid-episode
            return VehicleControl(throttle=0.5)

    agent = KillerAgent(None)
    agent.set_global_plan(route.gps_plan())
    criteria = CriteriaTree([RouteCompletionTest(route)])
    try:
        with pytest.raises(SensorReceivedNoData):
            run_episode(backend, agent, criteria, frame, max_ticks=100,
                        sensor_hub=hub)
        assert steps["n"] == 5
    finally:
        hub.stop()


def test_scenario_injection_spawns_hazards():
    """Triggers fire as the ego passes them and add NPCs the collision
    criterion can hit (reference route_scenario.py:362-415)."""
    from pmoe_tpu.eval import ScenarioInjector, run_episode
    from pmoe_tpu.eval.criteria import CollisionTest, CriteriaTree, \
        RouteCompletionTest

    backend = FakeCarlaBackend(render=False)
    route = backend.trace_route(0, 3)       # 300 m straight: >= 3 triggers
    frame = backend.reset(route)
    injector = ScenarioInjector(route, spacing=80.0, seed=1)
    assert len(injector.triggers) >= 3

    class BlindAgent(FollowAgent):
        pass                                 # follows route, ignores hazards

    agent = BlindAgent(None)
    agent.set_global_plan(route.gps_plan())
    criteria = CriteriaTree([CollisionTest(), RouteCompletionTest(route)])
    n_npc_before = len(backend._npcs)
    result = run_episode(backend, agent, criteria, frame, max_ticks=2500,
                         injector=injector)
    assert result.fired_scenarios            # at least one trigger fired
    assert len(backend._npcs) > n_npc_before


def test_leaderboard_xml_routes_end_to_end(tmp_path):
    """The shipped route XML drives the leaderboard benchmark (reference
    eval/evaluate.py:12-15 hardcodes a routes XML)."""
    from pmoe_tpu.eval import parse_routes_file
    from pmoe_tpu.eval.evaluate import DEFAULT_ROUTES_FILE

    routes = parse_routes_file(DEFAULT_ROUTES_FILE)
    assert len(routes) >= 4
    backend = FakeCarlaBackend(render=False)
    stats = StatisticsManager()
    ev = LeaderboardEvaluator(backend, stats,
                              checkpoint_path=str(tmp_path / "sim.json"),
                              max_ticks=250, verbose=False,
                              inject_scenarios=True)
    indexer = RouteIndexer(routes[:2], repetitions=1)
    glob = ev.run(lambda: FollowAgent(None), indexer)
    assert glob["finished_routes"] == 2
    # the dense trace really came from the XML waypoints
    rec = stats._registry[0]
    assert rec.route_id == "RouteScenario_0"


def test_single_route_filter():
    from pmoe_tpu.eval import parse_routes_file
    from pmoe_tpu.eval.evaluate import DEFAULT_ROUTES_FILE

    only = parse_routes_file(DEFAULT_ROUTES_FILE, single_route="2")
    assert len(only) == 1 and only[0].route_id == "2"


def test_camera_renders_npcs_and_lights():
    """NPCs and traffic lights appear in both rgb and seg so vision-dependent
    criteria correlate with what the model sees (VERDICT round-1 item 9)."""
    import math
    from pmoe_tpu.sim.fake_carla import _NPC

    b = FakeCarlaBackend(img_width=320, img_height=240, render_seg=True)
    route = b.trace_route(0, 2)
    b.reset(route)
    e = b.ego_state()
    ahead = np.array([e.x + 15 * math.cos(e.yaw), e.y + 15 * math.sin(e.yaw)])
    b._npcs.append(_NPC("vehicle", ahead, ahead + 0.1, speed=0.0, phase=0.0))
    side = ahead + np.array([2.0, 0.0])
    b._npcs.append(_NPC("walker", side, side + 0.1, speed=0.0, phase=0.0))
    f = b.tick(VehicleControl())
    assert (f.seg == 7).any()         # road
    assert (f.seg == 10).any()        # vehicle billboard
    assert (f.seg == 4).any()         # pedestrian
    # static scene furniture: sidewalk + dashed lane marking flank the road
    assert (f.seg == 8).any()         # SideWalk
    assert (f.seg == 6).any()         # RoadLine
    # drive toward the next intersection; its light should come into view
    seen_light = False
    for _ in range(600):
        f = b.tick(VehicleControl(throttle=0.8))
        if (f.seg == 18).any():
            seen_light = True
            break
    assert seen_light


def test_camera_renders_buildings_and_statics():
    """Block-interior buildings (Building=1) and scenario props (Static=19)
    render into rgb+seg; 12 of the 23 CARLA classes are producible."""
    import math
    from pmoe_tpu.sim.fake_carla import _NPC

    b = FakeCarlaBackend(img_width=320, img_height=240, render_seg=True)
    b.reset(b.trace_route(0, 5))
    e = b._ego
    e.x, e.y = 20.0, 20.0
    e.yaw = math.atan2(30.0, 30.0)            # face block center (50, 50)
    b._npcs.append(_NPC("static", (30.0, 30.0), (30.0, 30.0), 0.0, 0.0))
    f = b.tick(VehicleControl())
    assert (f.seg == 1).mean() > 0.01         # building fills real area
    assert (f.seg == 19).any()                # static prop


def test_off_lane_detection():
    b = FakeCarlaBackend(render=False)
    b.reset(b.trace_route(0, 1))
    b._ego.x, b._ego.y = 50.0, 2.0      # on the y=0 road corridor
    assert not b.off_lane()
    b._ego.x, b._ego.y = 50.0, 50.0     # mid-block, off every road
    assert b.off_lane()
    b._ego.x, b._ego.y = 102.0, 50.0    # on the x=100 road corridor
    assert not b.off_lane()


def test_running_stop_produces_penalized_score(tmp_path):
    """A scripted agent blowing through a stop sign gets the 0.80 stop
    penalty in the composed leaderboard score (VERDICT round-1 item 7)."""
    from pmoe_tpu.eval import RouteConfig

    backend = FakeCarlaBackend(render=False)
    # route along x=10 passes the stop sign at (6, 106) within its 10 m zone
    assert any(np.allclose(s, [6.0, 106.0]) for s in backend._stop_signs)
    stats = StatisticsManager()
    ev = LeaderboardEvaluator(backend, stats,
                              checkpoint_path=str(tmp_path / "s.json"),
                              max_ticks=2500, verbose=False,
                              inject_scenarios=False)
    cfg = RouteConfig("stoptest", 0, 3)   # spawn (10,2) -> (10,302)
    stats.set_route("stoptest", 0)
    cfg.index = 0
    ev._run_route(lambda: FollowAgent(None), cfg)
    rec = stats._registry[0]
    assert len(rec.infractions["stop_infraction"]) >= 1
    assert rec.scores["score_penalty"] <= 0.8 + 1e-9
    assert rec.scores["score_composed"] < rec.scores["score_route"]


def test_outside_lane_fractional_penalty():
    stats = StatisticsManager()
    stats.set_route("r", 0)
    rec = stats.compute_route_statistics(
        0, 90.0, {"outside_route_lanes": [{"percentage": 25.0}]})
    np.testing.assert_allclose(rec.scores["score_penalty"], 0.75)
    np.testing.assert_allclose(rec.scores["score_composed"], 90.0 * 0.75)


def test_birdview_renders_entities():
    from pmoe_tpu.sim.birdview import render_birdview, BIRDVIEW_CHANNELS
    from pmoe_tpu.sim.fake_carla import _NPC

    b = FakeCarlaBackend(render=False)
    route = b.trace_route(0, 3)
    b.reset(route)
    e = b.ego_state()
    import math
    ahead = np.array([e.x + 10 * math.cos(e.yaw), e.y + 10 * math.sin(e.yaw)])
    b._npcs.append(_NPC("vehicle", ahead, ahead + 0.1, speed=0.0, phase=0.0))
    bev = render_birdview(b, route)
    assert bev.shape == (192, 192, BIRDVIEW_CHANNELS)
    assert bev[..., 0].any()          # road
    assert bev[..., 2].any()          # route
    assert bev[..., 3].any()          # vehicle
    assert bev[..., 9].any()          # ego marker
    assert bev[..., 5].any() or bev[..., 7].any()   # some light state


def test_sensor_validation_track_rules():
    from pmoe_tpu.agents.autonomous_agent import Track
    from pmoe_tpu.sim.sensor_interface import (SensorConfigurationInvalid,
                                               validate_sensors)

    ok = [{"type": "sensor.camera.rgb", "x": 1.3, "z": 1.3, "id": "C"},
          {"type": "sensor.other.gnss", "id": "G"}]
    validate_sensors(ok, Track.SENSORS)
    with pytest.raises(SensorConfigurationInvalid, match="not allowed"):
        validate_sensors([{"type": "sensor.map", "id": "M"}], Track.SENSORS)
    validate_sensors([{"type": "sensor.map", "id": "M"}], Track.MAP)
    with pytest.raises(SensorConfigurationInvalid, match="too many"):
        validate_sensors([{"type": "sensor.other.gnss", "id": str(i)}
                          for i in range(2)], Track.SENSORS)
    with pytest.raises(SensorConfigurationInvalid, match="mounted"):
        validate_sensors([{"type": "sensor.camera.rgb", "x": 5.0, "id": "C"}],
                         Track.SENSORS)


def test_map_track_agent_receives_birdview(tmp_path):
    from pmoe_tpu.agents.autonomous_agent import Track
    from pmoe_tpu.eval import run_episode
    from pmoe_tpu.eval.criteria import CriteriaTree, RouteCompletionTest

    seen = {}

    class MapAgent(FollowAgent):
        def setup(self, cfg):
            super().setup(cfg)
            self.track = Track.MAP

        def sensors(self):
            return [{"type": "sensor.map", "id": "BIRDVIEW"},
                    {"type": "sensor.other.gnss", "id": "GPS"}]

        def run_step(self, input_data, timestamp):
            if "BIRDVIEW" in input_data:
                seen["bev"] = input_data["BIRDVIEW"][1]
            return super().run_step(input_data, timestamp)

    backend = FakeCarlaBackend(render=False)
    route = backend.trace_route(0, 1)
    frame = backend.reset(route)
    agent = MapAgent(None)
    agent.set_global_plan(route.gps_plan())
    criteria = CriteriaTree([RouteCompletionTest(route)])
    run_episode(backend, agent, criteria, frame, max_ticks=30, route=route)
    assert seen["bev"].shape[-1] == 12


def test_collect_roundtrip_feeds_datasets(tmp_path):
    """Collected episodes load straight into the stage-0/1/2 datasets —
    simulator data generation -> training pipeline, no conversion."""
    from pmoe_tpu.agents.collector_agent import collect_episode
    from pmoe_tpu.data.dataset import CarlaSeg, CarlaSegPred

    backend = FakeCarlaBackend(img_width=160, img_height=120, render_seg=True)
    n = collect_episode(backend, str(tmp_path), "episode_000",
                        max_ticks=24, noise_std=0.05)
    assert n == 24
    seg = CarlaSeg(root=str(tmp_path), crop=(8, 8), resize=(32, 32),
                   mode="train")
    img, mask = seg[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert mask.shape == (32, 32)
    assert set(np.unique(mask)) <= set(range(23))

    pred = CarlaSegPred(root=str(tmp_path), past_frames=4, future_frames=2,
                        crop=(8, 8), resize=(32, 32), mode="train",
                        load_measurements=True, batch_size=2)
    imgs, meas = pred[0]
    assert imgs.shape == (4, 32, 32, 3)
    assert {"speed", "control", "command"} <= set(meas)


def test_random_collector_agent(tmp_path):
    """RandomCollectorAgent (reference random_collector.py): actions repeat
    for num_repeat ticks, the first num_ignore_first frames are unrecorded,
    brake events are all-or-nothing, and a collision aborts via
    CollectorCollision."""
    from pmoe_tpu.agents.collector_agent import (CollectorCollision,
                                                 RandomCollectorAgent,
                                                 collect_episode)

    backend = FakeCarlaBackend(img_width=160, img_height=120, render_seg=True)
    n = collect_episode(backend, str(tmp_path), "episode_000", max_ticks=40,
                        agent_cls=RandomCollectorAgent, seed=3)
    assert 0 < n <= 40 - 10          # first 10 frames ignored
    import json as _json

    meas_dir = tmp_path / "episode_000" / "measurements"
    recs = [_json.loads(p.read_text()) for p in sorted(meas_dir.iterdir())]
    assert len(recs) == n
    # brake events are full-brake with zero steer/throttle
    for r in recs:
        if r["brake"] > 0:
            assert r["brake"] == 1.0 and r["steer"] == 0.0 \
                and r["throttle"] == 0.0
    # action-repeat: consecutive recorded actions change at most every tick
    # but identical (steer, throttle) runs of >= 2 must exist at repeat 4
    keys = [(r["steer"], r["throttle"], r["brake"]) for r in recs]
    assert any(a == b for a, b in zip(keys, keys[1:]))

    # collision aborts through the agent (reference raises, :126)
    agent = RandomCollectorAgent({"out_dir": str(tmp_path),
                                  "episode": "episode_001"})
    agent.set_global_plan([(0.0, 0.0, 4)])
    with pytest.raises(CollectorCollision):
        agent.run_step({"COLLISION": (0, True)}, 0.0)
    agent.destroy()


def test_weather_evolves_during_episode():
    """WeatherBehavior analog: illumination changes with game time."""
    b = FakeCarlaBackend(img_width=64, img_height=48)
    f0 = b.reset(b.trace_route(0, 1), weather=8)      # ClearSunset
    alt0 = b.weather_state()["sun_altitude"]
    m0 = float(f0.rgb.mean())
    for _ in range(300):                              # 15 game seconds
        f = b.tick(VehicleControl())
    assert b.weather_state()["sun_altitude"] < alt0
    assert float(f.rgb.mean()) < m0                   # sun went down -> darker


def test_control_loss_scenario_perturbs_steering():
    """ControlLoss injection: the ego deviates under steering noise even with
    zero commanded steer (srunner scenarios/control_loss.py analog)."""
    from pmoe_tpu.eval import ScenarioInjector

    def run(inject):
        b = FakeCarlaBackend(render=False)
        route = b.trace_route(0, 2)
        b.reset(route, seed=1)
        if inject:
            b.inject_control_noise(duration=3.0, magnitude=0.5)
        for _ in range(120):
            b.tick(VehicleControl(throttle=0.6, steer=0.0))
        e = b.ego_state()
        return abs(e.x - 10.0)       # lateral deviation from the x=10 lane

    assert run(True) > run(False) + 0.05


def test_injector_covers_all_kinds():
    from pmoe_tpu.eval import ScenarioInjector

    backend = FakeCarlaBackend(render=False)
    route = backend.trace_route(0, 3)
    backend.reset(route)
    inj = ScenarioInjector(route, spacing=40.0, seed=2)
    kinds = {t.kind for t in inj.triggers}
    assert len(kinds) >= 3           # several scenario types placed
    # walk the route firing everything
    for pos in route.positions[::10]:
        inj.update(backend, pos)
    assert all(t.fired for t in inj.triggers)


def test_world_state_provider_caches_per_tick():
    """CarlaDataProvider semantics: within one tick every get_* hits the
    cache (one RPC per actor per tick); on_tick invalidates."""
    from pmoe_tpu.sim.data_provider import WorldStateProvider

    class MockActor:
        def __init__(self, aid):
            self.id = aid
            self.calls = 0

        def get_location(self):
            self.calls += 1
            return (1.0 * self.calls, 0.0, 0.0)

        def get_velocity(self):
            self.calls += 1
            return (0.0, 0.0, 0.0)

        def get_transform(self):
            self.calls += 1
            return "tf"

    p = WorldStateProvider()
    ego = MockActor(1)
    p.register_actor(ego, role="hero")
    p.on_tick(1)
    a = p.get_location(ego)
    b = p.get_location(ego)
    assert a == b and ego.calls == 1          # cached within the tick
    p.on_tick(2)
    c = p.get_location(ego)
    assert c != a and ego.calls == 2          # invalidated across ticks
    assert p.get_actor_by_role("hero") is ego
    p.set_ego_route("route")
    assert p.get_ego_route() == "route"
    p.clear()
    assert p.actors() == []


def test_stitch_camera_panorama():
    """3-camera panorama pseudo-sensor (reference StitchCameraReader)."""
    b = FakeCarlaBackend(img_width=120, img_height=90)
    b.reset(b.trace_route(0, 2))
    pano = b.render_stitch()
    assert pano.shape == (90, 360, 3)
    # the three views differ (yaw offsets see different scenery)
    left, center, right = pano[:, :120], pano[:, 120:240], pano[:, 240:]
    assert not np.array_equal(left, center)
    assert not np.array_equal(center, right)

    from pmoe_tpu.sim.sensor_interface import SensorHub

    class StitchAgent(FollowAgent):
        def sensors(self):
            return [{"type": "sensor.stitch_camera.rgb", "id": "STITCH_RGB"},
                    {"type": "sensor.other.gnss", "id": "GPS"}]

    hub = SensorHub.for_agent(StitchAgent(None), b)
    try:
        hub.on_frame(b.tick(VehicleControl()))
        data = hub.get_data()
        assert data["STITCH_RGB"][1].shape == (90, 360, 3)
    finally:
        hub.stop()


def test_opendrive_map_pseudo_sensor():
    """sensor.opendrive_map delivers the town's .xodr document through the
    hub (reference OpenDriveMapReader, sensor_interface.py:322-324); the fake
    backend emits a parseable OpenDRIVE grid with driving lanes and the
    geoReference header the reference's GPS conversion reads."""
    import xml.etree.ElementTree as ET

    from pmoe_tpu.sim.sensor_interface import SensorHub

    b = FakeCarlaBackend(render=False)
    b.reset(b.trace_route(0, 2))
    root = ET.fromstring(b.to_opendrive())
    assert root.tag == "OpenDRIVE"
    roads = root.findall("road")
    assert len(roads) == 2 * (b._grid_n + 1)
    assert root.find("header/geoReference") is not None
    lane_types = {l.get("type") for l in roads[0].iter("lane")}
    assert "driving" in lane_types

    class MapAgent(FollowAgent):
        def setup(self, cfg):
            super().setup(cfg)
            from pmoe_tpu.agents.autonomous_agent import Track

            self.track = Track.MAP

        def sensors(self):
            return [{"type": "sensor.opendrive_map", "id": "OPENDRIVE"},
                    {"type": "sensor.other.gnss", "id": "GPS"}]

    hub = SensorHub.for_agent(MapAgent(None), b)
    try:
        hub.on_frame(b.tick(VehicleControl()))
        data = hub.get_data()
        assert data["OPENDRIVE"][1]["opendrive"] == b.to_opendrive()
    finally:
        hub.stop()


def test_nocrash_suite_files():
    """Route suites load from the reference's one-pair-per-line format and
    back the evaluator's default route list."""
    from pmoe_tpu.eval.nocrash import default_suite_path, load_suite

    p = default_suite_path("Town01")
    assert p is not None
    routes = load_suite(p)
    assert len(routes) >= 8 and all(len(r) == 2 for r in routes)
    backend = FakeCarlaBackend(render=False)
    ev = NoCrashEvaluator(backend, None, verbose=False)
    assert ev.routes == routes


def test_watchdog_detects_simulator_hang():
    """A backend that stops ticking trips the watchdog, which surfaces as a
    RuntimeError (reference scenario_manager.py:64-70 hang detection)."""
    import time
    from pmoe_tpu.eval import run_episode
    from pmoe_tpu.eval.criteria import CriteriaTree, RouteCompletionTest

    backend = FakeCarlaBackend(render=False)
    route = backend.trace_route(0, 2)
    frame = backend.reset(route)
    orig_tick = backend.tick
    calls = {"n": 0}

    def hanging_tick(control):
        calls["n"] += 1
        if calls["n"] >= 3:
            time.sleep(6.0)           # simulator freeze
        return orig_tick(control)

    backend.tick = hanging_tick
    agent = FollowAgent(None)
    agent.set_global_plan(route.gps_plan())
    criteria = CriteriaTree([RouteCompletionTest(route)])
    with pytest.raises(RuntimeError, match="stopped ticking"):
        run_episode(backend, agent, criteria, frame, max_ticks=50,
                    watchdog_timeout=1.0)


def _all_scenario_names():
    from pmoe_tpu.eval.behaviors import SCENARIO_CLASSES

    return sorted(SCENARIO_CLASSES)


@pytest.mark.parametrize("name", _all_scenario_names())
def test_scenario_classes_run_to_success(name):
    """Behavior-tree scenario classes (the srunner scenario surface) complete
    with a scripted ego and spawn their actors (eval/behaviors.py)."""
    from pmoe_tpu.eval.behaviors import SCENARIO_CLASSES, Status
    from pmoe_tpu.eval.scenario_cli import ScriptedFollowAgent, run_scenario

    backend = FakeCarlaBackend(render=False)
    # target 5 gives the route a junction turn (corner scenarios key on it)
    scenario, result = run_scenario(
        backend, SCENARIO_CLASSES[name], ScriptedFollowAgent(None),
        target_idx=5, max_ticks=4000, verbose=False)
    assert scenario.status == Status.SUCCESS
    if name not in ("ControlLoss", "FreeRide", "SignalJunctionCrossingRoute",
                    "NoSignalJunctionCrossingRoute", "MasterScenario"):
        assert backend._npcs            # scenario spawned its adversary


def test_max_velocity_and_driven_distance_criteria():
    """MaxVelocityTest peaks-and-fails above the limit; DrivenDistanceTest
    flips to SUCCESS once the integrated path length is reached (srunner
    atomic_criteria.py:83,126 semantics)."""
    from pmoe_tpu.eval.criteria import DrivenDistanceTest, MaxVelocityTest
    from pmoe_tpu.sim.interface import SIM_DT, EgoState

    class _F:
        frame = 0

    mv = MaxVelocityTest(5.0, optional=True)
    dd = DrivenDistanceTest(4.0)
    ego_slow = EgoState(x=0, y=0, yaw=0, speed=3.0)
    ego_fast = EgoState(x=0, y=0, yaw=0, speed=6.0)
    for _ in range(int(1.0 / SIM_DT)):           # 1 s at 3 m/s -> 3 m
        mv.update(ego_slow, _F)
        dd.update(ego_slow, _F)
    assert mv.test_status != "FAILURE" and dd.test_status == "FAILURE"
    for _ in range(int(1.0 / SIM_DT)):           # 1 s at 6 m/s -> 9 m total
        mv.update(ego_fast, _F)
        dd.update(ego_fast, _F)
    assert mv.test_status == "FAILURE" and mv.actual_value == 6.0
    assert dd.test_status == "SUCCESS"


def test_set_lights_green_behavior():
    """SetLightsGreen (TrafficLightManipulator analog) forces the nearest
    lights green for the window, then the phase schedule resumes."""
    from pmoe_tpu.eval.behaviors import SetLightsGreen, Status
    from pmoe_tpu.sim.interface import EgoState

    backend = FakeCarlaBackend(render=False)
    backend.reset(backend.trace_route(0, 1))
    light = min(backend._lights, key=lambda l: l.x ** 2 + l.y ** 2)
    # find a sim time where the light is red on its own schedule
    t_red = next(t * 0.5 for t in range(200) if light.is_red(t * 0.5))
    backend.t = t_red
    assert light.is_red(backend.t)
    ego = EgoState(x=light.x, y=light.y, yaw=0, speed=0.0)
    assert SetLightsGreen((light.x, light.y), duration=10.0).tick(
        backend, ego) == Status.SUCCESS
    assert not light.is_red(backend.t)
    assert light.forced_green_until == backend.t + 10.0
    # past the forced window the phase schedule resumes: t_red's phase repeats
    from pmoe_tpu.sim.fake_carla import _LIGHT_PERIOD

    resumed = t_red + 2 * _LIGHT_PERIOD * int(10.0 / (2 * _LIGHT_PERIOD) + 1)
    assert light.is_red(resumed)


def test_npc_retarget_is_phase_continuous():
    """Speed/destination changes re-anchor the NPC path without teleporting
    it (fake_carla._NPC.retarget; srunner actors keep their pose across
    KeepVelocity/LaneChange transitions)."""
    from pmoe_tpu.sim.fake_carla import _NPC

    backend = FakeCarlaBackend(render=False)
    backend.reset(backend.trace_route(0, 1))
    npc = _NPC("vehicle", (0.0, 0.0), (50.0, 0.0), speed=5.0, phase=0.0)
    backend._npcs.append(npc)
    for _ in range(40):                      # advance 2 s of sim time
        backend.tick(__import__("pmoe_tpu.sim.interface",
                                fromlist=["VehicleControl"]).VehicleControl())
    before = npc.position(backend.t).copy()
    npc.retarget(backend.t, b=(0.0, 80.0), speed=9.0)
    after = npc.position(backend.t)
    assert float(np.linalg.norm(after - before)) < 1e-6
    # and it now moves toward the new destination
    later = npc.position(backend.t + 1.0)
    assert later[1] > after[1]


def test_remove_npc_behavior():
    from pmoe_tpu.eval.behaviors import RemoveNPC, SpawnNPC, Status

    backend = FakeCarlaBackend(render=False)
    backend.reset(backend.trace_route(0, 1))
    ego = backend.ego_state()
    spawner = SpawnNPC("vehicle", (0.0, 0.0), (10.0, 0.0), speed=2.0)
    assert spawner.tick(backend, ego) == Status.SUCCESS
    assert backend._npcs
    assert RemoveNPC(spawner).tick(backend, ego) == Status.SUCCESS
    assert not backend._npcs


def test_behavior_tree_composites():
    from pmoe_tpu.eval.behaviors import (Idle, Parallel, Sequence, Status,
                                         WaitForSeconds)

    b = FakeCarlaBackend(render=False)
    b.reset(b.trace_route(0, 1))
    ego = b.ego_state()
    seq = Sequence([WaitForSeconds(0.1), WaitForSeconds(0.1)])
    ticks = 0
    while seq.tick(b, ego) == Status.RUNNING:
        ticks += 1
    assert 2 <= ticks <= 5              # two 2-tick waits
    par = Parallel([Idle(), WaitForSeconds(0.1)], success_on_one=True)
    assert par.tick(b, ego) == Status.RUNNING   # 0.1 s = 2 ticks at 20 Hz
    assert par.tick(b, ego) == Status.SUCCESS


# ---------------------------------------------------------------------------
# the 8 remaining srunner criterion classes (18/18 parity — VERDICT r1 #5)
# ---------------------------------------------------------------------------

class _Frame:
    frame = 0


def test_average_velocity_criterion():
    """AverageVelocityTest (srunner atomic_criteria.py:202): SUCCESS above the
    target, ACCEPTABLE between thresholds, RUNNING->FAILURE at finalize."""
    from pmoe_tpu.eval.criteria import AverageVelocityTest
    from pmoe_tpu.sim.interface import SIM_DT, EgoState

    av = AverageVelocityTest(5.0, avg_velocity_acceptable=2.0)
    ego = EgoState(x=0, y=0, yaw=0, speed=3.0)
    for _ in range(int(1.0 / SIM_DT)):
        av.update(ego, _Frame)
    assert av.test_status == "ACCEPTABLE" and 2.9 < av.actual_value <= 3.0
    fast = EgoState(x=0, y=0, yaw=0, speed=20.0)
    for _ in range(int(1.0 / SIM_DT)):
        av.update(fast, _Frame)
    assert av.test_status == "SUCCESS"
    slow = AverageVelocityTest(5.0)
    slow.update(EgoState(x=0, y=0, yaw=0, speed=1.0), _Frame)
    slow.finalize()
    assert slow.test_status == "FAILURE"    # never reached the target


def test_keep_lane_criterion():
    """KeepLaneTest (srunner :513): each on->off lane edge counts one
    invasion; any invasion is FAILURE."""
    from pmoe_tpu.eval.criteria import KeepLaneTest
    from pmoe_tpu.sim.interface import EgoState

    backend = FakeCarlaBackend(render=False)
    backend.reset(backend.trace_route(0, 3))
    kl = KeepLaneTest(backend)
    ego = backend.ego_state()
    kl.update(ego, _Frame)
    assert kl.test_status == "SUCCESS" and kl.actual_value == 0
    backend._ego.x, backend._ego.y = 50.0, 50.0     # mid-block: off every lane
    kl.update(backend.ego_state(), _Frame)
    kl.update(backend.ego_state(), _Frame)          # still off: no double count
    assert kl.test_status == "FAILURE" and kl.actual_value == 1
    backend.close()


def test_region_criteria():
    """ReachedRegionTest (:573) and InRadiusRegionTest (:1408): SUCCESS latched
    inside the region; still-RUNNING flips to FAILURE at finalize."""
    from pmoe_tpu.eval.criteria import InRadiusRegionTest, ReachedRegionTest
    from pmoe_tpu.sim.interface import EgoState

    rr = ReachedRegionTest(40.0, 60.0, -10.0, 10.0)
    ir = InRadiusRegionTest(50.0, 0.0, 5.0)
    far = EgoState(x=0, y=0, yaw=0, speed=0)
    rr.update(far, _Frame); ir.update(far, _Frame)
    assert rr.test_status == "RUNNING" and ir.test_status == "RUNNING"
    inside = EgoState(x=50, y=2, yaw=0, speed=0)
    rr.update(inside, _Frame); ir.update(inside, _Frame)
    assert rr.test_status == "SUCCESS" and ir.test_status == "SUCCESS"
    out = ReachedRegionTest(40.0, 60.0, -10.0, 10.0)
    out.update(far, _Frame); out.finalize()
    assert out.test_status == "FAILURE"


def test_off_road_and_sidewalk_criteria():
    """OffRoadTest (:624) fails after `duration` s beyond the sidewalk band;
    OnSidewalkTest (:774) accumulates sidewalk meters and fails on time
    outside driving lanes."""
    from pmoe_tpu.eval.criteria import OffRoadTest, OnSidewalkTest
    from pmoe_tpu.sim.interface import SIM_DT

    backend = FakeCarlaBackend(render=False)
    backend.reset(backend.trace_route(0, 3))
    off = OffRoadTest(backend, duration=0.2)
    sw = OnSidewalkTest(backend, duration=0.2)
    # on the lane: neither fires
    for _ in range(10):
        off.update(backend.ego_state(), _Frame)
        sw.update(backend.ego_state(), _Frame)
    assert off.test_status == "RUNNING" and sw.test_status == "RUNNING"
    # sidewalk band (5 m off the horizontal road at y=0): sidewalk, NOT offroad
    backend._ego.x, backend._ego.y, backend._ego.speed = 30.0, 5.0, 2.0
    assert backend.on_sidewalk() and not backend.off_road()
    for _ in range(int(0.3 / SIM_DT)):
        off.update(backend.ego_state(), _Frame)
        sw.update(backend.ego_state(), _Frame)
    assert off.test_status == "RUNNING"            # sidewalk isn't off-road
    assert sw.test_status == "FAILURE" and sw.actual_value > 0
    # mid-block: truly off-road
    backend._ego.x, backend._ego.y = 50.0, 50.0
    assert backend.off_road()
    for _ in range(int(0.3 / SIM_DT)):
        off.update(backend.ego_state(), _Frame)
    assert off.test_status == "FAILURE"
    backend.close()


def test_end_of_road_criterion():
    """EndofRoadTest (:705): a road-id change starts the timer; FAILURE and
    count after `duration` seconds."""
    from pmoe_tpu.eval.criteria import EndofRoadTest
    from pmoe_tpu.sim.interface import SIM_DT

    backend = FakeCarlaBackend(render=False)
    backend.reset(backend.trace_route(0, 3))
    er = EndofRoadTest(backend, duration=0.2)
    backend._ego.x, backend._ego.y = 30.0, 1.0      # horizontal road y=0
    for _ in range(5):
        er.update(backend.ego_state(), _Frame)
    assert er.test_status == "RUNNING"
    backend._ego.x, backend._ego.y = 1.0, 30.0      # vertical road x=0
    assert backend.road_id() != 1
    for _ in range(int(0.4 / SIM_DT)):
        er.update(backend.ego_state(), _Frame)
    assert er.test_status == "FAILURE" and er.actual_value == 1
    backend.close()


def test_wrong_lane_criterion():
    """WrongLaneTest (:1234): heading >120 degrees off the right-hand-traffic
    lane direction counts a wrong-lane entry and accumulates meters."""
    import math

    from pmoe_tpu.eval.criteria import WrongLaneTest
    from pmoe_tpu.sim.interface import EgoState

    backend = FakeCarlaBackend(render=False)
    backend.reset(backend.trace_route(0, 3))
    wl = WrongLaneTest(backend)
    # right-hand lane of the horizontal road (y=+2) heads +x
    backend._ego.x, backend._ego.y, backend._ego.yaw = 30.0, 2.0, 0.0
    backend._ego.speed = 5.0
    wl.update(backend.ego_state(), _Frame)
    assert wl.test_status == "RUNNING" and wl.actual_value == 0
    backend._ego.yaw = math.pi                      # against traffic
    wl.update(backend.ego_state(), _Frame)
    wl.update(backend.ego_state(), _Frame)          # still wrong: one entry
    assert wl.test_status == "FAILURE" and wl.actual_value == 1
    assert wl.summary_events()[0]["meters"] > 0
    backend.close()


def test_criteria_tree_finalize_runs_in_episode():
    """run_episode settles achieved-goal criteria at episode end (srunner
    terminate semantics): an unreached region reads FAILURE afterwards."""
    from pmoe_tpu.eval.criteria import CriteriaTree, InRadiusRegionTest
    from pmoe_tpu.eval.manager import run_episode
    from pmoe_tpu.eval.scenario_cli import ScriptedFollowAgent

    backend = FakeCarlaBackend(render=False)
    route = backend.trace_route(0, 3)
    frame = backend.reset(route)
    agent = ScriptedFollowAgent(None)
    agent.set_global_plan(route.gps_plan())
    ir = InRadiusRegionTest(1e6, 1e6, 1.0)          # unreachable
    run_episode(backend, agent, CriteriaTree([ir]), frame, max_ticks=5)
    assert ir.test_status == "FAILURE"
    backend.close()


def test_q_collector_agent(tmp_path):
    """QCollectorAgent (the reference q_collector's role, rebuilt — its
    rails.* deps were never vendored): action values over the discretized
    table favor route progress, the brake action wins when the path ahead is
    blocked, and per-tick Q labels land in measurements."""
    import json as _json

    from pmoe_tpu.agents.collector_agent import QCollectorAgent, collect_episode

    backend = FakeCarlaBackend(img_width=160, img_height=120, render_seg=True)
    n = collect_episode(backend, str(tmp_path), "episode_000", max_ticks=30,
                        agent_cls=QCollectorAgent, seed=1)
    assert n > 0
    meas_dir = tmp_path / "episode_000" / "measurements"
    recs = [_json.loads(p.read_text()) for p in sorted(meas_dir.iterdir())]
    A = 9 * 3 + 1                        # steer x throttle grid + brake
    assert all(len(r["q_values"]) == A and len(r["actions"]) == A
               for r in recs)
    backend.close()

    # unit-level Q semantics on synthetic birdviews
    agent = QCollectorAgent({"out_dir": str(tmp_path), "episode": "ep_q"})
    bv = np.zeros((192, 192, 12), np.uint8)
    bv[:, 94:99, 2] = 255                # route straight ahead (heading up)
    q_free = agent._action_values(bv, spd=4.0)
    best = agent.actions[int(np.argmax(q_free))]
    assert best[1] > 0 and best[2] == 0.0        # drive, don't brake
    assert abs(best[0]) < 0.5                     # roughly straight
    bv_blocked = bv.copy()
    bv_blocked[120:138, 90:103, 3] = 255          # vehicle dead ahead
    q_blocked = agent._action_values(bv_blocked, spd=4.0)
    assert int(np.argmax(q_blocked)) == len(agent.actions) - 1   # brake wins


def test_route_completion_srunner_semantics_on_self_intersection():
    """RouteCompletionTest uses srunner's windowed per-waypoint index
    accounting (atomic_criteria.py:1587): on a self-crossing route, standing
    at the crossing point early on the first leg must NOT jump completion to
    the later leg, and driving the route through yields monotone progress to
    SUCCESS."""
    from pmoe_tpu.eval.criteria import RouteCompletionTest
    from pmoe_tpu.eval.route_parser import interpolate_route
    from pmoe_tpu.sim.interface import EgoState

    route = interpolate_route([(0.0, 0.0), (100.0, 0.0), (100.0, 30.0),
                               (50.0, 30.0), (50.0, -30.0)])
    rc = RouteCompletionTest(route)
    # ego early on leg 1, exactly at the future crossing point (50, 0)
    at_crossing = EgoState(x=50.0, y=0.0, yaw=0.0, speed=5.0)
    for _ in range(5):
        rc.update(at_crossing, _Frame)
    assert rc.actual_value < 40.0          # leg-1 progress, no jump to ~75%
    # now drive the whole route: progress is monotone and ends in SUCCESS
    prev = 0.0
    for i in range(0, len(route.positions), 2):
        p = route.positions[i] + 0.2 * rc._fwd[i]    # just past waypoint i
        rc.update(EgoState(x=float(p[0]), y=float(p[1]), yaw=0.0, speed=5.0),
                  _Frame)
        assert rc.actual_value >= prev - 1e-9
        prev = rc.actual_value
    rc.update(EgoState(x=50.0, y=-30.0, yaw=0.0, speed=0.0), _Frame)
    assert rc.test_status == "SUCCESS" and rc.actual_value == 100.0

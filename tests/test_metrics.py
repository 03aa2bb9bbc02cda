"""Episode recorder + metrics module tests (pmoe_tpu/eval/recorder.py,
metrics_manager.py — reference scenario_runner/metrics_manager.py +
srunner/metrics/ analog)."""

import json

import pytest

from pmoe_tpu.eval.metrics_manager import run_metric
from pmoe_tpu.eval.recorder import EpisodeRecorder, MetricsLog
from pmoe_tpu.eval.scenario_cli import ScriptedFollowAgent, run_scenario
from pmoe_tpu.sim.fake_carla import FakeCarlaBackend


@pytest.fixture(scope="module")
def recording(tmp_path_factory):
    """One recorded FollowLeadingVehicle episode shared by the tests."""
    from pmoe_tpu.eval.behaviors import FollowLeadingVehicle

    path = tmp_path_factory.mktemp("rec") / "ep.json"
    backend = FakeCarlaBackend(render=False)
    run_scenario(backend, FollowLeadingVehicle, ScriptedFollowAgent(None),
                 max_ticks=2500, verbose=False, record=str(path))
    backend.close()
    return str(path)


def test_recording_contents(recording):
    log = MetricsLog.load(recording)
    assert log.get_total_frame_count() > 100
    assert log.get_ego_vehicle_id() == 0
    assert log.get_actor_ids_with_type("vehicle") == [1]
    # ego transform/velocity queryable at every frame
    x, y, yaw = log.get_actor_transform(0, 0)
    assert log.get_actor_velocity(0, 0) >= 0.0
    # the lead vehicle is alive only after its SpawnNPC behavior fired
    first, last = log.get_actor_alive_frames(1)
    assert first > 0 and last == log.get_total_frame_count() - 1
    assert log.get_actor_transform(1, 0) is None
    # route + criteria captured
    assert "route" in log.header
    assert "RouteCompletionTest" in log.criteria


def test_distance_between_vehicles_metric(recording, tmp_path):
    m = run_metric(recording, "pmoe_tpu.eval.metrics.distance_between_vehicles",
                   out_prefix=str(tmp_path / "m"))
    assert m.results["frames"] > 0
    assert m.results["min_distance"] > 0
    data = json.loads((tmp_path / "m_distance.json").read_text())
    assert data["min_distance"] == m.results["min_distance"]


def test_distance_to_route_metric(recording, tmp_path):
    m = run_metric(recording, "pmoe_tpu.eval.metrics.distance_to_route",
                   out_prefix=str(tmp_path / "m"))
    # the scripted follower tracks the route within a couple of meters
    assert m.results["mean_deviation"] < 5.0
    assert (tmp_path / "m_route_dist.json").exists()


def test_criteria_filter_metric(recording, tmp_path):
    m = run_metric(recording, "pmoe_tpu.eval.metrics.criteria_filter",
                   out_prefix=str(tmp_path / "m"))
    assert "RouteCompletionTest" in m.results


def test_metric_class_contract(tmp_path):
    """Modules with zero (or many) BasicMetric subclasses are rejected
    (reference _get_metric_class contract)."""
    rec = tmp_path / "r.json"
    EpisodeRecorder(town="T").save(str(rec))
    with pytest.raises(ValueError, match="exactly one"):
        run_metric(str(rec), "pmoe_tpu.eval.metrics.basic_metric")


def test_recorder_captures_collisions():
    from pmoe_tpu.sim.interface import VehicleControl
    from pmoe_tpu.sim.fake_carla import _NPC

    backend = FakeCarlaBackend(render=False)
    route = backend.trace_route(0, 1)
    frame = backend.reset(route)
    # park an NPC right on the ego
    e = backend.ego_state()
    backend._npcs.append(_NPC("vehicle", (e.x + 1, e.y), (e.x + 1, e.y),
                              speed=0.0, phase=0.0))
    rec = EpisodeRecorder(town=backend.town, route=route)
    for _ in range(3):
        frame = backend.tick(VehicleControl(throttle=1.0))
        rec.on_tick(backend, frame)
    log = MetricsLog(
        {"header": rec.header, "frames": rec.frames, "criteria": {}})
    assert log.get_collisions()
    backend.close()


def test_pretty_print_leaderboard_json(tmp_path):
    """pretty_print renders a StatisticsManager checkpoint: progress line,
    global tables, per-route analysis with per-km infraction rates
    (reference leaderboard/scripts/pretty_print_json.py)."""
    from pmoe_tpu.eval.pretty_print import prettify
    from pmoe_tpu.eval.statistics import StatisticsManager

    sm = StatisticsManager()
    sm.set_route("route_0", 0)
    rec = sm.compute_route_statistics(
        0, 80.0, {"collision_vehicle": [{"type": "vehicle"}]},
        duration_game=120.0)
    rec.meta["route_length"] = 2000.0          # 80% of 2 km -> 1.6 km
    path = tmp_path / "results.json"
    sm.save(str(path))

    text = prettify(str(path))
    assert "routes completed" in text
    assert "Global average metrics" in text
    assert "score_composed" in text
    assert "Per-route analysis" in text
    assert "collision_vehicle" in text
    assert "0.625 (1 occurrences)" in text     # 1 / 1.6 km
    assert "distance driven" in text


def test_scenario_lint_reports_counts_and_coverage():
    """scenario_lint validates the shipped annotations against the shipped
    route library: per-town trigger counts, per-route matcher results, and a
    global coverage line (reference leaderboard/scripts/set_new_scenarios.py
    semantics, minus the live-world debug drawing)."""
    from pmoe_tpu.eval.scenario_lint import lint

    text = lint("pmoe_tpu/assets/scenarios/all_towns_traffic_scenarios.json",
                "pmoe_tpu/assets/routes/routes_all.xml")
    assert "== Town01:" in text and "== Town02:" in text
    assert "route 0:" in text
    assert "coverage:" in text
    # the shipped assets must not contain aliasing duplicate triggers
    assert "DUP" not in text


def test_scenario_lint_flags_aliasing_triggers(tmp_path):
    """Two same-type triggers closer than 4 m / 10 deg alias at injection
    time (set_new_scenarios.py apart_enough) — lint must flag them."""
    import json

    from pmoe_tpu.eval.scenario_lint import lint

    ann = {"available_scenarios": [{"Town01": [{
        "scenario_type": "Scenario3",
        "available_event_configurations": [
            {"transform": {"x": 100.0, "y": 55.0, "z": 0.0, "yaw": 0.0}},
            {"transform": {"x": 101.5, "y": 55.0, "z": 0.0, "yaw": 5.0}},
        ]}]}]}
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    text = lint(str(p))
    assert "DUP Scenario3" in text

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

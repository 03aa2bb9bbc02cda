"""Traffic-aware privileged expert (VERDICT r3 missing #2: the scripted
collector never braked, so BC data carried no stop-at-red / follow-vehicle
braking signal; the reference's datasets have real brake labels —
reference model/data_loader.py:216-243 pedal folding)."""

import json
import math

import numpy as np
import pytest

from pmoe_tpu.agents.collector_agent import (CollectorAgent,
                                             TrafficAwareExpert,
                                             collect_episode)
from pmoe_tpu.sim.fake_carla import FakeCarlaBackend, _NPC, _TrafficLight
from pmoe_tpu.sim.interface import (ActorState, TrafficLightState,
                                    VehicleControl)


def _run_expert(backend, route, max_ticks, tmp_path, name="ep"):
    """Drive the TrafficAwareExpert over a route; returns (agent, frames,
    recorded measurement dicts)."""
    from pmoe_tpu.eval.nocrash import build_input_data

    agent = TrafficAwareExpert({"out_dir": str(tmp_path), "episode": name,
                                "backend": backend})
    agent.set_global_plan(route.gps_plan())
    frame = backend._sensor_frame(collision=None)
    frames = [frame]
    for _ in range(max_ticks):
        data = build_input_data(frame)
        data["COMPASS"] = (frame.frame, frame.compass)
        control = agent.run_step(data, frame.timestamp)
        frame = backend.tick(control)
        frames.append(frame)
        if frame.collision is not None:
            break
    meas = sorted((tmp_path / name / "measurements").glob("*.json"))
    return agent, frames, [json.loads(p.read_text()) for p in meas]


def test_privileged_world_state_api():
    """actor_states / traffic_light_states expose positions, velocities and
    light phase (carla.World.get_actors / TrafficLight.get_state analogs)."""
    backend = FakeCarlaBackend(img_width=64, img_height=48, render=False)
    route = backend.trace_route(0, 5)
    backend.reset(route, n_vehicles=3, n_pedestrians=2, seed=1)
    actors = backend.actor_states()
    assert len(actors) == 5
    assert {a.kind for a in actors} == {"vehicle", "walker"}
    # finite-difference velocity must match the NPC's own motion
    npc = backend._npcs[0]
    a = actors[0]
    p0, p1 = npc.position(backend.t), npc.position(backend.t + 0.05)
    assert np.isclose(a.vx, (p1[0] - p0[0]) / 0.05)
    assert np.isclose(a.vy, (p1[1] - p0[1]) / 0.05)
    lights = backend.traffic_light_states()
    assert len(lights) == len(backend._lights)
    assert all(isinstance(l.red, bool) for l in lights)


def test_expert_brakes_for_lead_vehicle(tmp_path):
    """A stopped NPC on the lane ahead: the expert must brake inside the
    time-headway envelope, record brake labels, and not collide."""
    backend = FakeCarlaBackend(img_width=64, img_height=48)
    route = backend.trace_route(0, 1)           # straight leg
    backend.reset(route, seed=0)
    # park a vehicle 35 m down the lane, directly on the route
    x0, y0 = route.positions[0]
    x1, y1 = route.positions[min(35, len(route.positions) - 1)]
    backend._npcs = [_NPC("vehicle", (x1, y1), (x1, y1), speed=0.0, phase=0.0)]
    _, frames, meas = _run_expert(backend, route, 400, tmp_path)
    assert frames[-1].collision is None, "expert hit the parked lead vehicle"
    brakes = [m["brake"] for m in meas]
    assert max(brakes) == 1.0, "no brake label recorded"
    # the ego must actually have stopped short of the NPC
    ego = backend.ego_state()
    assert math.hypot(ego.x - x1, ego.y - y1) > 2.0
    assert ego.speed < 0.5


def test_expert_stops_at_red_light_and_resumes(tmp_path):
    """Red light ahead: stop outside the 8 m enforcement radius, never
    trigger ran_red_light, and continue once green."""
    backend = FakeCarlaBackend(img_width=64, img_height=48)
    route = backend.trace_route(0, 1)
    backend.reset(route, seed=0)
    # single light on the route, red for the first 15 s, green afterwards
    lx, ly = route.positions[min(60, len(route.positions) - 1)]
    light = _TrafficLight(float(lx), float(ly), phase_offset=0.0)
    light.is_red = lambda t: t < 15.0          # deterministic phase
    backend._lights = [light]
    backend._was_before_light = {}
    violations = []
    min_d_while_red = [1e9]

    class _Probe(TrafficAwareExpert):
        def run_step(self, input_data, timestamp):
            ctrl = super().run_step(input_data, timestamp)
            if backend.ran_red_light():
                violations.append(backend.t)
            if light.is_red(backend.t):
                e = backend.ego_state()
                min_d_while_red[0] = min(min_d_while_red[0],
                                         math.hypot(e.x - lx, e.y - ly))
            return ctrl

    from pmoe_tpu.eval.nocrash import build_input_data

    agent = _Probe({"out_dir": str(tmp_path), "episode": "light",
                    "backend": backend})
    agent.set_global_plan(route.gps_plan())
    frame = backend._sensor_frame(collision=None)
    stopped_during_red = False
    for _ in range(800):
        data = build_input_data(frame)
        data["COMPASS"] = (frame.frame, frame.compass)
        frame = backend.tick(agent.run_step(data, frame.timestamp))
        e = backend.ego_state()
        if light.is_red(backend.t) and e.speed < 0.1 and backend.t > 2.0:
            stopped_during_red = True
    assert stopped_during_red, "expert never stopped for the red light"
    assert min_d_while_red[0] > 8.0, "entered the enforcement radius on red"
    assert not violations, f"ran the red light at t={violations}"
    # after green it moved on past the light
    e = backend.ego_state()
    assert math.hypot(e.x - lx, e.y - ly) > 8.0 and e.speed > 1.0


def test_collect_with_traffic_carries_brake_labels(tmp_path):
    """collect_episode with traffic + TrafficAwareExpert produces dataset
    episodes whose measurements contain brake events (the signal missing
    from all round-3 training data)."""
    backend = FakeCarlaBackend(img_width=64, img_height=48, render_seg=True)
    n = collect_episode(backend, str(tmp_path), "episode_000",
                        start_idx=5, target_idx=10, max_ticks=900,
                        agent_cls=TrafficAwareExpert, n_vehicles=20,
                        n_pedestrians=10, seed=0)
    assert n > 0
    meas = sorted((tmp_path / "episode_000" / "measurements").glob("*.json"))
    brakes = [json.loads(p.read_text())["brake"] for p in meas]
    assert max(brakes) == 1.0
    # pedal folding downstream: a brake label becomes a negative pedal
    from pmoe_tpu.data.dataset import preprocess_measurements

    folded = preprocess_measurements(
        json.loads(meas[int(np.argmax(brakes))].read_text()),
        n_commands=6, speed_factor=10)
    assert folded["control"][1] == -1.0


def test_base_collector_never_brakes_contract(tmp_path):
    """The plain CollectorAgent keeps its traffic-blind contract (its
    _brake_decision hook returns 0) — existing empty-traffic data stays
    byte-stable."""
    backend = FakeCarlaBackend(img_width=64, img_height=48, render=False)
    route = backend.trace_route(0, 1)
    backend.reset(route, seed=0)
    agent = CollectorAgent({"out_dir": str(tmp_path), "episode": "plain",
                            "backend": backend})
    assert agent._brake_decision(0.0, 0.0, 0.0, 5.0) == 0.0


def test_offline_labeler_matches_online_expert(tmp_path):
    """TrafficAwareExpert.labeler (the DAgger brake labeler) must produce the
    same decision as the online expert for the same state — same DEFAULTS,
    same rule."""
    backend = FakeCarlaBackend(img_width=64, img_height=48, render=False)
    route = backend.trace_route(5, 10)
    backend.reset(route, n_vehicles=15, n_pedestrians=8, seed=2)
    agent = TrafficAwareExpert({"out_dir": str(tmp_path), "episode": "x",
                                "backend": backend, "save_every": 10**9})
    labeler = TrafficAwareExpert.labeler(backend)
    rng = np.random.default_rng(0)
    for _ in range(50):
        x, y = rng.uniform(0, 300, 2)
        heading = rng.uniform(-math.pi, math.pi)
        spd = rng.uniform(0, 8)
        assert agent._brake_decision(x, y, heading, spd) == \
            labeler._brake_decision(x, y, heading, spd)
        backend.tick(VehicleControl(steer=0.0, throttle=0.3, brake=0.0))


def test_npc_yield_and_reroute():
    """NPC yield pass (CARLA TrafficManager / walker-AI analog): an actor
    whose path closes in on the ego inside its yield radius freezes instead
    of ramming, and after 5 s stuck it reroutes away. Receding motion is
    never paused."""
    backend = FakeCarlaBackend(img_width=64, img_height=48, render=False)
    route = backend.trace_route(0, 1)
    backend.reset(route, seed=0)
    e = backend.ego_state()
    # walker marching straight at the (stationary) ego from 6 m ahead
    npc = _NPC("walker", (e.x + 6.0, e.y), (e.x - 20.0, e.y),
               speed=2.0, phase=0.0)
    backend._npcs = [npc]
    idle = VehicleControl(steer=0.0, throttle=0.0, brake=1.0)
    min_d = 1e9
    for _ in range(80):                         # 4 s
        backend.tick(idle)
        d = float(np.linalg.norm(npc.position(backend.t)
                                 - [backend._ego.x, backend._ego.y]))
        min_d = min(min_d, d)
    assert min_d > 2.0, "yield failed: walker entered collision radius"
    assert npc.paused_for > 0.5, "walker never yielded"
    # keep standing: reroute fires after 5 s stuck and the walker walks away
    for _ in range(140):                        # 7 more seconds
        backend.tick(idle)
    d_end = float(np.linalg.norm(npc.position(backend.t)
                                 - [backend._ego.x, backend._ego.y]))
    assert d_end > 3.5, f"walker never rerouted away (d={d_end:.2f})"

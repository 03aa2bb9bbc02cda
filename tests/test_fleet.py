"""Fleet runner parity: batched lockstep episodes must reproduce the official
per-episode evaluator's results (same criteria, same RNG streams, same
pipeline semantics) — the guarantee that lets the full NoCrash protocol run
through eval/fleet.py without changing what is measured."""

import numpy as np
import pytest

from pmoe_tpu.agents.image_agent import ImageAgent
from pmoe_tpu.eval.evaluate_nocrash import _CollectingStats
from pmoe_tpu.eval.fleet import FleetNoCrashRunner, FleetTask, build_tasks
from pmoe_tpu.eval.nocrash import NoCrashEvaluator, TRAFFIC_TABLES
from pmoe_tpu.sim.fake_carla import FakeCarlaBackend
from pmoe_tpu.utils import Config


def _mlp(dims, act="relu", l_act=False):
    return {"dims": dims, "act": act, "l_act": l_act, "bn": False,
            "dropout": 0.0}


@pytest.fixture(scope="module")
def agent_cfg():
    actor = {
        "type": "moe", "n_experts": 2, "loss_coefs": [0.7, 0.3],
        "n_commands": 6, "model_dir": "",
        "speed_encoder": _mlp([1, 16, 32]),
        "command_encoder": _mlp([6, 16, 32]),
        "speed_prediction": _mlp([96, 16, 1]),
        "action_head": _mlp([96, 16, 32], "elu", True),
        "backbone": {"type": "rgb", "n_frames": 4,
                     "rgb": {"arch": "tiny", "pretrained": False,
                             "gamma": 2, "b": 1}},
    }
    return Config({
        "sensors": {"img_width": 800, "img_height": 600},
        "logger": {"disabled": True},
        "model": {"actor": actor},
    })


ROUTES = [(0, 5), (3, 12), (5, 10)]
MAX_TICKS = 60


def _sequential_rows(agent_cfg):
    backend = FakeCarlaBackend(img_width=800, img_height=600)
    stats = _CollectingStats()
    ev = NoCrashEvaluator(backend, stats, routes=ROUTES,
                          max_ticks=MAX_TICKS, verbose=False)
    table = TRAFFIC_TABLES["Town01"]
    for route in ROUTES:
        ev._run_episode(lambda: ImageAgent(agent_cfg), "Town01", 0, 1, route,
                        table)
    backend.close()
    return stats.rows


def test_fleet_matches_sequential_evaluator(agent_cfg):
    seq = _sequential_rows(agent_cfg)

    fleet_stats = _CollectingStats()
    runner = FleetNoCrashRunner(agent_cfg, n_slots=2, max_ticks=MAX_TICKS,
                                verbose=False)
    tasks = [FleetTask("Town01", 0, 1, s, t) for s, t in ROUTES]
    runner.run(tasks, fleet_stats)

    assert len(fleet_stats.rows) == len(seq)
    seq_by_route = {(r[3], r[4]): r for r in seq}
    for row in fleet_stats.rows:
        ref = seq_by_route[(row[3], row[4])]
        assert row[:5] == ref[:5]                      # town/traffic/weather
        np.testing.assert_allclose(row[5], ref[5], atol=1e-6)   # RC %
        assert row[6] == ref[6]                        # lights
        np.testing.assert_allclose(row[7], ref[7], atol=1e-9)   # duration


def test_build_tasks_resume_skip():
    class Stats:
        def is_finished(self, town, route, weather, traffic):
            return traffic == 0 and route == (0, 5) and weather == 1

    tasks = build_tasks("Town01", [(0, 5), (1, 6)], [1, 3], Stats())
    assert len(tasks) == 3 * 2 * 2 - 1
    assert all(isinstance(t, FleetTask) for t in tasks)


def test_fleet_more_slots_than_tasks(agent_cfg):
    stats = _CollectingStats()
    runner = FleetNoCrashRunner(agent_cfg, n_slots=4, max_ticks=20,
                                verbose=False)
    runner.run([FleetTask("Town01", 0, 1, 0, 5)], stats)
    assert len(stats.rows) == 1


def test_fleet_matches_sequential_with_traffic(agent_cfg):
    """Regular-traffic parity (the round-4 grid's new cells): NPC spawns,
    yield passes and collision outcomes must be identical between the
    batched fleet and the sequential evaluator — same seed formula, same
    per-tick order."""
    backend = FakeCarlaBackend(img_width=800, img_height=600)
    stats = _CollectingStats()
    ev = NoCrashEvaluator(backend, stats, routes=ROUTES,
                          max_ticks=MAX_TICKS, verbose=False)
    table = TRAFFIC_TABLES["Town01"]
    for route in ROUTES:
        ev._run_episode(lambda: ImageAgent(agent_cfg), "Town01", 1, 3, route,
                        table)
    backend.close()
    seq = stats.rows

    fleet_stats = _CollectingStats()
    runner = FleetNoCrashRunner(agent_cfg, n_slots=3, max_ticks=MAX_TICKS,
                                verbose=False)
    runner.run([FleetTask("Town01", 1, 3, s, t) for s, t in ROUTES],
               fleet_stats)
    assert len(fleet_stats.rows) == len(seq)
    seq_by_route = {(r[3], r[4]): r for r in seq}
    for row in fleet_stats.rows:
        ref = seq_by_route[(row[3], row[4])]
        assert row[:5] == ref[:5]
        np.testing.assert_allclose(row[5], ref[5], atol=1e-6)
        assert row[6] == ref[6]
        np.testing.assert_allclose(row[7], ref[7], atol=1e-9)

"""Closed-loop ImageAgent tests: the one-tick-latency action pipeline.

The NoCrash hot loop (reference leaderboard/scenarios/scenario_manager.py:138-181)
runs agent -> apply_control -> world.tick at 20 Hz. The pipelined agent
dispatches tick t's jitted ``sample`` asynchronously and applies the action
computed from tick t-1's frame, so the device round-trip overlaps the sim
tick instead of landing inside it. These tests pin the alignment contract:
exactly one tick of latency, never more, no skew over the episode.
"""

import numpy as np

from pmoe_tpu.agents.image_agent import ImageAgent
from pmoe_tpu.utils.config import Config


def _mk_agent(tiny_moe_cfg, pipeline: bool) -> ImageAgent:
    cfg = Config({
        "pipeline": pipeline,
        "logger": {"disabled": True},
        "model": {"actor": dict(tiny_moe_cfg, n_commands=4, model_dir="")},
    })
    agent = ImageAgent(cfg)
    plan = [({"lat": 0.0, "lon": 0.0}, 4), ({"lat": 1e-4, "lon": 0.0}, 4)]
    agent.set_global_plan(plan)
    return agent


def _inputs(i: int) -> dict:
    rng = np.random.default_rng(i)
    frame = rng.integers(0, 255, (600, 800, 3), np.uint8)
    return {
        "Narrow_RGB": (i, frame),
        "EGO": (i, {"spd": 3.0 + 0.1 * i}),
        "GPS": (i, np.array([0.0, 0.0, 0.0])),
    }


def test_pipeline_applies_previous_ticks_action(tiny_moe_cfg):
    sync_agent = _mk_agent(tiny_moe_cfg, pipeline=False)
    pipe_agent = _mk_agent(tiny_moe_cfg, pipeline=True)
    n = 6
    sync, pipe = [], []
    for t in range(n):
        data = _inputs(t)
        sync.append(sync_agent.run_step(data, t * 0.05))
        pipe.append(pipe_agent.run_step(data, t * 0.05))
    as_tuple = lambda c: (c.steer, c.throttle, c.brake)
    # tick 0 has no previous action: identical to the synchronous agent
    assert as_tuple(pipe[0]) == as_tuple(sync[0])
    # tick t >= 1 applies the action computed from tick t-1's inputs —
    # exactly one tick of latency, for every tick of the episode
    for t in range(1, n):
        assert as_tuple(pipe[t]) == as_tuple(sync[t - 1]), f"tick {t}"
    sync_agent.destroy()
    pipe_agent.destroy()


def test_restored_variables_are_device_resident(tiny_moe_cfg, tmp_path):
    """Checkpoint restore must commit the variables to the device ONCE.

    ``graft`` returns host numpy leaves; if those stay in
    ``agent._variables``, every jitted ``run_step`` re-uploads the whole
    param tree (~90 MB/tick for the benchmark agent — 7.5 s/tick over a
    12 MB/s tunneled link, observed as a wedged NoCrash run). jit-init'd
    agents were never affected; only the model_dir path regressed.
    """
    import jax

    from pmoe_tpu.utils.io import save_checkpoint

    donor = _mk_agent(tiny_moe_cfg, pipeline=False)
    # perturb the donor away from the PRNGKey(0) init the restored agent
    # also starts from — otherwise the equality check below is vacuous and
    # would pass even if the graft silently restored nothing
    donor._variables = dict(donor._variables)
    donor._variables["params"] = jax.tree_util.tree_map(
        lambda x: np.asarray(x) + 1.0, donor._variables["params"])
    save_checkpoint({"model": jax.tree_util.tree_map(np.asarray,
                                                     donor._variables["params"])},
                    False, tmp_path, "tiny")
    cfg = Config({
        "logger": {"disabled": True},
        "model": {"actor": dict(tiny_moe_cfg, n_commands=4,
                                model_dir=str(tmp_path / "tiny.ckpt"))},
    })
    agent = ImageAgent(cfg)
    leaves = jax.tree_util.tree_leaves(agent._variables)
    assert leaves, "agent has no variables"
    hosts = [l for l in leaves if not isinstance(l, jax.Array)]
    assert not hosts, f"{len(hosts)}/{len(leaves)} leaves are host arrays"
    # and the restored weights actually made it in
    ref = jax.tree_util.tree_leaves(donor._variables["params"])
    got = jax.tree_util.tree_leaves(agent._variables["params"])
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]))
    agent.destroy()
    donor.destroy()


def test_pipeline_default_on_and_config_off(tiny_moe_cfg):
    assert _mk_agent(tiny_moe_cfg, True)._pipeline is True
    cfg = Config({
        "logger": {"disabled": True},
        "model": {"actor": dict(tiny_moe_cfg, n_commands=4, model_dir="")},
    })
    assert ImageAgent(cfg)._pipeline is True          # default: pipelined
    assert _mk_agent(tiny_moe_cfg, False)._pipeline is False

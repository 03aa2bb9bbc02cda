"""Stage-3 tests: replay memory, DrivingGym env semantics, and a few DDPG
learn steps on the fake backend with a tiny actor."""

import numpy as np
import pytest

from pmoe_tpu.models.replay import ReplayMemory, Transition
from pmoe_tpu.sim.env import DrivingGym, postprocess_action
from pmoe_tpu.sim.fake_carla import FakeCarlaBackend


def test_replay_ring_buffer():
    mem = ReplayMemory(8, rng=np.random.default_rng(0))
    for i in range(12):
        mem.push(np.full((2, 4, 4, 3), i, np.uint8), np.array([i / 10]),
                 np.eye(4)[i % 4].astype(np.float32),
                 np.array([0.1, 0.2], np.float32), np.float32(i),
                 np.full((2, 4, 4, 3), i + 1, np.uint8), np.array([i / 10]),
                 np.eye(4)[i % 4].astype(np.float32), np.float32(0))
    assert len(mem) == 8                     # capacity wraps
    batch = mem.sample(4)
    assert batch.images.shape == (4, 2, 4, 4, 3)
    assert batch.reward.shape == (4,)
    # oldest entries overwritten: rewards all >= 4
    assert (mem._buffers["reward"] >= 4).all()


def test_postprocess_action():
    c = postprocess_action(np.array([0.3, 0.8]))
    assert c.throttle == pytest.approx(0.8) and c.brake == 0.0
    c2 = postprocess_action(np.array([-2.0, -0.6]))
    assert c2.steer == -1.0 and c2.brake == pytest.approx(0.6)
    assert c2.throttle == 0.0


def test_driving_gym_episode():
    backend = FakeCarlaBackend(img_width=160, img_height=240)
    env = DrivingGym(backend, past_frames=2, crop=(20, 20), resize=(32, 32),
                     episode_length=50)
    (images, speed, command) = env.reset(0, 2)
    assert images.shape == (1, 2, 32, 32, 3) and images.dtype == np.uint8
    assert speed.shape == (1, 1) and command.shape == (1, 4)
    total_r, done, steps = 0.0, False, 0
    while not done:
        obs, r, done, info = env.step(np.array([0.0, 0.8]))
        total_r += r
        steps += 1
    assert steps <= 50
    assert "route_completion" in info
    # driving forward on the route earns progress reward
    assert info["route_completion"] > 0.0


def test_ddpg_learn_step(tiny_moe_cfg):
    import jax.numpy as jnp

    from pmoe_tpu.models.rl_agent import Agent

    critic_mlp = lambda dims: {"dims": dims, "act": "relu", "l_act": False,
                               "bn": False, "dropout": 0.0}
    params = {
        "gamma": 0.9, "tau": 0.01, "buffer_size": 64, "batch_size": 8,
        "OU": {"mu": [0.0, 0.0], "sigma": [0.3, 0.1], "theta": 0.6},
        "actor": dict(tiny_moe_cfg, lr=1e-4, exclude_freeze=["action_pred"]),
        "critic": {
            "lr": 1e-3,
            "backbone": tiny_moe_cfg["backbone"],
            "speed_encoder": critic_mlp([1, 32, 128]),
            "command_encoder": critic_mlp([4, 32, 128]),
            "action_encoder": critic_mlp([2, 32, 128]),
            "value_prediction": critic_mlp([896, 64, 1]),
        },
    }
    obs = (jnp.zeros((1, 4, 32, 32, 3)), jnp.zeros((1, 1)), jnp.zeros((1, 4)))
    agent = Agent(params, obs)

    a = agent.sample(np.zeros((1, 4, 32, 32, 3), np.uint8),
                     np.zeros((1, 1), np.float32), np.zeros((1, 4), np.float32))
    assert a.shape == (1, 2)

    # fill replay and learn
    rng = np.random.default_rng(0)
    for i in range(16):
        agent.remember(
            rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)[None][0],
            np.array([0.1], np.float32), np.eye(4)[0].astype(np.float32),
            np.array([0.0, 0.5], np.float32), np.float32(1.0),
            rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
            np.array([0.1], np.float32), np.eye(4)[0].astype(np.float32),
            np.float32(i == 15))
    before_alpha = np.asarray(
        agent.state.actor_params["experts"]["action_pred"]["kernel"]).copy()
    before_backbone = np.asarray(
        agent.state.actor_params["experts"]["backbone"]["fc"]["kernel"]).copy()
    metrics = agent.learn()
    assert np.isfinite(metrics["critic_loss"])
    assert np.isfinite(metrics["actor_loss"])
    after_alpha = np.asarray(
        agent.state.actor_params["experts"]["action_pred"]["kernel"])
    after_backbone = np.asarray(
        agent.state.actor_params["experts"]["backbone"]["fc"]["kernel"])
    # only the exclude_freeze subset ('action_pred') trains in the actor
    assert not np.allclose(before_alpha, after_alpha)
    np.testing.assert_array_equal(before_backbone, after_backbone)
    # target nets moved toward the new params (soft update)
    tgt = np.asarray(
        agent.state.target_actor_params["experts"]["action_pred"]["kernel"])
    assert not np.allclose(tgt, before_alpha) or np.allclose(
        after_alpha, before_alpha)

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


def _tiny_ddpg_params(tiny_moe_cfg, actor_overrides):
    critic_mlp = lambda dims: {"dims": dims, "act": "relu", "l_act": False,
                               "bn": False, "dropout": 0.0}
    return {
        "gamma": 0.9, "tau": 0.01, "buffer_size": 64, "batch_size": 8,
        "OU": {"mu": [0.0, 0.0], "sigma": [0.3, 0.1], "theta": 0.6},
        "actor": dict(tiny_moe_cfg, lr=1e-4, **actor_overrides),
        "critic": {
            "lr": 1e-3,
            "backbone": tiny_moe_cfg["backbone"],
            "speed_encoder": critic_mlp([1, 32, 128]),
            "command_encoder": critic_mlp([4, 32, 128]),
            "action_encoder": critic_mlp([2, 32, 128]),
            "value_prediction": critic_mlp([896, 64, 1]),
        },
    }


def test_pmoe_head_grads_match_full_forward(tiny_moe_cfg):
    """The fused DDPG path hoists the PMoE trunk out of the gradient; the
    mixer gradients through apply(method='head') must equal the gradients
    through the full __call__ with the same sample rng (rl_agent fused path
    exactness)."""
    import jax
    import jax.numpy as jnp

    from pmoe_tpu.models import get_model
    from pmoe_tpu.utils.nn import jit_init, make_freeze_mask, \
        stop_gradient_frozen

    cfg = dict(tiny_moe_cfg, type="pmoe")
    model = get_model(cfg)
    imgs = jnp.linspace(0, 1, 2 * 4 * 32 * 32 * 3).reshape(2, 4, 32, 32, 3)
    spd = jnp.ones((2, 1))
    cmd = jax.nn.one_hot(jnp.array([0, 1]), 4)
    variables = jit_init(model, {"params": jax.random.PRNGKey(0),
                                 "sample": jax.random.PRNGKey(1)},
                         imgs, spd, cmd)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    trainable = make_freeze_mask(params, ["lat_weights", "long_weights"])
    k = jax.random.PRNGKey(7)
    w = jax.random.normal(jax.random.PRNGKey(8), (2, 2))

    def loss_full(p):
        p = stop_gradient_frozen(p, trainable)
        a, _ = model.apply({"params": p, "batch_stats": bstats},
                           imgs, spd, cmd, False, rngs={"sample": k})
        return jnp.sum(a * w)

    moe_a, punet_a = model.apply({"params": params, "batch_stats": bstats},
                                 imgs, spd, cmd, False,
                                 method="trunk", rngs={"sample": k})

    def loss_head(p):
        p = stop_gradient_frozen(p, trainable)
        a = model.apply({"params": p, "batch_stats": bstats},
                        moe_a, punet_a, method="head")
        return jnp.sum(a * w)

    g_full = jax.grad(loss_full)(params)
    g_head = jax.grad(loss_head)(params)
    for name in ("lat_weights", "long_weights"):
        np.testing.assert_allclose(
            np.asarray(g_full[name]["kernel"]),
            np.asarray(g_head[name]["kernel"]), rtol=1e-6)
        assert np.abs(np.asarray(g_head[name]["kernel"])).sum() > 0


def test_ddpg_fused_pmoe_learn_step(tiny_moe_cfg):
    """PMoE actor with the stage-3 freeze recipe takes the fused-trunk path:
    one double-batch trunk forward, exact frozen-leaf invariants."""
    import jax
    import jax.numpy as jnp

    from pmoe_tpu.models.rl_agent import Agent

    params = _tiny_ddpg_params(
        tiny_moe_cfg,
        {"type": "pmoe", "exclude_freeze": ["model_weights", "alpha"]})
    obs = (jnp.zeros((1, 4, 32, 32, 3)), jnp.zeros((1, 1)), jnp.zeros((1, 4)))
    agent = Agent(params, obs)
    assert agent._fused_trunk

    rng = np.random.default_rng(0)
    for i in range(16):
        agent.remember(
            rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
            np.array([0.1], np.float32), np.eye(4)[0].astype(np.float32),
            np.array([0.0, 0.5], np.float32), np.float32(1.0),
            rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
            np.array([0.1], np.float32), np.eye(4)[0].astype(np.float32),
            np.float32(i == 15))
    trunk_before = np.asarray(jax.tree_util.tree_leaves(
        agent.state.actor_params["moe"])[0]).copy()
    metrics = agent.learn()
    assert np.isfinite(metrics["critic_loss"])
    assert np.isfinite(metrics["actor_loss"])
    # the fusion's invariant: trunk leaves never move, so the actor and
    # target-actor trunks stay identical
    trunk_after = np.asarray(jax.tree_util.tree_leaves(
        agent.state.actor_params["moe"])[0])
    np.testing.assert_array_equal(trunk_before, trunk_after)
    for a, t in zip(jax.tree_util.tree_leaves(agent.state.actor_params["moe"]),
                    jax.tree_util.tree_leaves(
                        agent.state.target_actor_params["moe"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(t))


def test_reference_stage3_recipe_trains_nothing(tiny_moe_cfg):
    """The reference's stage-3 actor recipe is a no-op — proven, not assumed.

    conf/stage_3.yaml:73-75 sets actor.type=pmoe with
    exclude_freeze=['model_weights','alpha']. Substring freeze
    (reference utils/nn.py:22-58) then keeps ONLY the expert alpha gates
    trainable: no parameter is named 'model_weights', and the lat/long
    mixers ('lat_weights'/'long_weights') match neither string. But alpha
    reaches the action exclusively through the mixture's component CHOICE —
    torch's dists.sample() detaches, and this framework's Gumbel-max argmax
    is likewise zero-gradient — so every trainable leaf receives an exactly
    zero gradient and the actor cannot change, bitwise, no matter how long
    DDPG runs. This is the analytic core of the round-5 "run A"
    falsification of the reference recipe (VERDICT r4 item 1b)."""
    import jax
    import jax.numpy as jnp

    from pmoe_tpu.models.rl_agent import Agent

    params = _tiny_ddpg_params(
        tiny_moe_cfg,
        {"type": "pmoe", "exclude_freeze": ["model_weights", "alpha"]})
    obs = (jnp.zeros((1, 4, 32, 32, 3)), jnp.zeros((1, 1)), jnp.zeros((1, 4)))
    agent = Agent(params, obs)

    rng = np.random.default_rng(3)
    for i in range(16):
        agent.remember(
            rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
            np.array([0.1], np.float32), np.eye(4)[0].astype(np.float32),
            rng.uniform(-1, 1, 2).astype(np.float32),
            np.float32(rng.uniform(-1, 1)),
            rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
            np.array([0.2], np.float32), np.eye(4)[1].astype(np.float32),
            np.float32(i == 15))
    before = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(),
                                    agent.state.actor_params)
    for _ in range(3):
        metrics = agent.learn()
    assert np.isfinite(metrics["critic_loss"])   # the critic DOES learn
    after = jax.tree_util.tree_map(np.asarray, agent.state.actor_params)
    for b, a in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(b, a)


def test_ddpg_window_trunk_matches_stacked(tiny_moe_cfg):
    """Consecutive transitions (s' = s shifted one tick) take the window path:
    the 5-frame union is uploaded once and the frozen seg U-Net runs on 5
    instead of 8 frames. The update must match the plain stacked fused path
    on the same batch + rng to fp32 tolerance."""
    import jax
    import jax.numpy as jnp

    from pmoe_tpu.models.rl_agent import Agent

    params = _tiny_ddpg_params(
        tiny_moe_cfg,
        {"type": "pmoe", "exclude_freeze": ["model_weights", "alpha"]})
    params["device_replay"] = False     # the pool path has its own test below
    obs = (jnp.zeros((1, 4, 32, 32, 3)), jnp.zeros((1, 1)), jnp.zeros((1, 4)))
    agent = Agent(params, obs)
    assert agent._fused_trunk

    rng = np.random.default_rng(0)
    for i in range(16):
        window = rng.integers(0, 255, (5, 32, 32, 3), dtype=np.uint8)
        agent.remember(
            window[:4], np.array([0.1], np.float32),
            np.eye(4)[0].astype(np.float32),
            np.array([0.0, 0.5], np.float32), np.float32(1.0),
            window[1:], np.array([0.1], np.float32),
            np.eye(4)[0].astype(np.float32), np.float32(i == 15))
    assert agent._windows_ok

    tr = agent.memory.sample(agent.batch_size)
    plain = {k: jnp.asarray(v) for k, v in tr._asdict().items()}
    windowed = dict(plain)
    windowed["window"] = jnp.concatenate(
        [windowed.pop("images"), windowed.pop("new_images")[:, -1:]], axis=1)

    k = jax.random.PRNGKey(3)
    # eager (unjitted) on purpose: two full XLA compiles of the pmoe DDPG
    # learn step cost ~2 min each on this CPU; op-by-op execution of the tiny
    # shapes is much cheaper and numerically identical for the exactness claim
    state_p, metrics_p = agent._learn_step(agent.state, plain, k)
    state_w, metrics_w = agent._learn_step(agent.state, windowed, k)
    np.testing.assert_allclose(float(metrics_p["critic_loss"]),
                               float(metrics_w["critic_loss"]),
                               rtol=1e-5, atol=1e-6)
    for lp, lw in zip(jax.tree_util.tree_leaves(state_p),
                      jax.tree_util.tree_leaves(state_w)):
        np.testing.assert_allclose(np.asarray(lp, np.float32),
                                   np.asarray(lw, np.float32),
                                   rtol=2e-4, atol=2e-6)

    # a non-consecutive transition flips the detector off
    agent.remember(
        rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
        np.array([0.1], np.float32), np.eye(4)[0].astype(np.float32),
        np.array([0.0, 0.5], np.float32), np.float32(1.0),
        rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
        np.array([0.1], np.float32), np.eye(4)[0].astype(np.float32),
        np.float32(0.0))
    assert not agent._windows_ok
    assert "window" not in agent._stage_batch()


def test_device_frame_pool_matches_window_path(tiny_moe_cfg):
    """Device-resident replay frame pool: one new frame crosses host->device
    per remember, the learn step gathers windows from the pool by index, and
    the update matches the host-window path to fp32 tolerance. A later
    non-consecutive transition spills the pool back to host stacks."""
    import jax
    import jax.numpy as jnp

    from pmoe_tpu.models.rl_agent import Agent

    params = _tiny_ddpg_params(
        tiny_moe_cfg,
        {"type": "pmoe", "exclude_freeze": ["model_weights", "alpha"]})
    params["device_replay"] = True
    obs = (jnp.zeros((1, 4, 32, 32, 3)), jnp.zeros((1, 1)), jnp.zeros((1, 4)))
    agent = Agent(params, obs)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (16 + 5, 32, 32, 3), dtype=np.uint8)
    recs = []
    for i in range(16):                      # one rolling episode
        recs.append((frames[i:i + 4].copy(), frames[i + 1:i + 5].copy()))
        agent.remember(
            recs[-1][0], np.array([0.1], np.float32),
            np.eye(4)[0].astype(np.float32),
            np.array([0.0, 0.5], np.float32), np.float32(1.0),
            recs[-1][1], np.array([0.1], np.float32),
            np.eye(4)[0].astype(np.float32), np.float32(i == 15))
    assert agent._pool is not None
    # one frame per tick after the initial 5 = 16 + 4 uploads total
    assert agent._pool_w == 16 + 4

    staged = agent._stage_batch()
    assert "frame_start" in staged and "images" not in staged
    batch_pool = dict(staged, frame_pool=agent._pool)
    # equivalent host-window batch for the same sampled entries
    starts = np.asarray(staged["frame_start"])
    pool_np = np.asarray(agent._pool)
    win = np.stack([pool_np[(s + np.arange(5)) % agent._pool_F]
                    for s in starts])
    batch_win = {k: v for k, v in staged.items() if k != "frame_start"}
    batch_win["window"] = jnp.asarray(win)

    k = jax.random.PRNGKey(3)
    state_p, metrics_p = agent._learn_step(agent.state, batch_pool, k)
    state_w, metrics_w = agent._learn_step(agent.state, batch_win, k)
    for lp, lw in zip(jax.tree_util.tree_leaves(state_p),
                      jax.tree_util.tree_leaves(state_w)):
        np.testing.assert_allclose(np.asarray(lp, np.float32),
                                   np.asarray(lw, np.float32),
                                   rtol=2e-4, atol=2e-6)

    # learn() end-to-end through the pool
    m = agent.learn()
    assert np.isfinite(m["critic_loss"])

    # a non-consecutive transition spills the pool into host frame stacks
    agent.remember(
        rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
        np.array([0.1], np.float32), np.eye(4)[0].astype(np.float32),
        np.array([0.0, 0.5], np.float32), np.float32(1.0),
        rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
        np.array([0.1], np.float32), np.eye(4)[0].astype(np.float32),
        np.float32(0.0))
    assert agent._pool is None and not agent._windows_ok
    assert len(agent.memory) == 17
    # the spilled stacks are the original frames (check one entry)
    spilled = agent.memory._buffers["images"]
    assert spilled.shape[1:] == (4, 32, 32, 3)
    found = any(np.array_equal(spilled[j], recs[0][0])
                for j in range(len(agent.memory)))
    assert found
    m = agent.learn()                        # host path still learns
    assert np.isfinite(m["critic_loss"])


def test_nonfused_actor_window_path_matches_stacked(tiny_moe_cfg):
    """A plain moe actor (no trunk fusion) with consecutive transitions also
    takes the window/pool staging; the non-fused learn branch slices s/s'
    out of the window and must match the explicit-stacks batch exactly."""
    import jax
    import jax.numpy as jnp

    from pmoe_tpu.models.rl_agent import Agent

    params = _tiny_ddpg_params(tiny_moe_cfg, {"exclude_freeze": ["alpha"]})
    params["device_replay"] = True
    obs = (jnp.zeros((1, 4, 32, 32, 3)), jnp.zeros((1, 1)), jnp.zeros((1, 4)))
    agent = Agent(params, obs)
    assert not agent._fused_trunk

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (16 + 5, 32, 32, 3), dtype=np.uint8)
    for i in range(12):
        agent.remember(
            frames[i:i + 4], np.array([0.1], np.float32),
            np.eye(4)[0].astype(np.float32),
            np.array([0.0, 0.5], np.float32), np.float32(1.0),
            frames[i + 1:i + 5], np.array([0.1], np.float32),
            np.eye(4)[0].astype(np.float32), np.float32(0.0))
    assert agent._pool is not None
    staged = agent._stage_batch()
    assert "frame_start" in staged

    batch_pool = dict(staged, frame_pool=agent._pool)
    starts = np.asarray(staged["frame_start"])
    pool_np = np.asarray(agent._pool)
    win = np.stack([pool_np[(s + np.arange(5)) % agent._pool_F]
                    for s in starts])
    batch_plain = {k: v for k, v in staged.items() if k != "frame_start"}
    batch_plain["images"] = jnp.asarray(win[:, :4])
    batch_plain["new_images"] = jnp.asarray(win[:, 1:])

    k = jax.random.PRNGKey(9)
    state_p, _ = agent._learn_step(agent.state, batch_pool, k)
    state_s, _ = agent._learn_step(agent.state, batch_plain, k)
    for lp, ls in zip(jax.tree_util.tree_leaves(state_p),
                      jax.tree_util.tree_leaves(state_s)):
        np.testing.assert_allclose(np.asarray(lp, np.float32),
                                   np.asarray(ls, np.float32),
                                   rtol=2e-4, atol=2e-6)
    m = agent.learn()
    assert np.isfinite(m["critic_loss"])


def test_fuse_gate_rejects_trainable_trunk():
    """Unfreezing real trunk weights (not alpha) must disable the fusion;
    non-pmoe actors never fuse (no full Agent init needed — the gate only
    reads actor_type and the trainable mask)."""
    import types

    import jax.numpy as jnp

    from pmoe_tpu.models.rl_agent import Agent
    from pmoe_tpu.utils.nn import make_freeze_mask

    params = {
        "moe": {"experts": {"alpha": {"kernel": jnp.zeros((2, 1))},
                            "action_pred": {"kernel": jnp.zeros((2, 4))}}},
        "punet": {"action_out": {"kernel": jnp.zeros((2, 2))}},
        "lat_weights": {"kernel": jnp.zeros((2, 1))},
        "long_weights": {"kernel": jnp.zeros((2, 1))},
    }
    gate = Agent._can_fuse_trunk

    pmoe_agent = types.SimpleNamespace(actor_type="pmoe")
    ok_mask = make_freeze_mask(params, ["model_weights", "alpha"])
    assert gate(pmoe_agent, ok_mask)
    # 'action_pred' unfreezes a real trunk weight -> no fusion
    bad_mask = make_freeze_mask(params, ["action_pred"])
    assert not gate(pmoe_agent, bad_mask)
    # non-pmoe actors never fuse
    moe_agent = types.SimpleNamespace(actor_type="moe")
    assert not gate(moe_agent, ok_mask)


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


def test_ddpg_critic_warmup_leaves_actor_untouched(tiny_moe_cfg):
    """learn(critic_only=True) — the critic-warmup phase used by
    tools/ddpg_improve.py — must train the critic while leaving the actor,
    its target, and its optimizer state bitwise untouched."""
    import jax
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
    rng = np.random.default_rng(0)
    for i in range(16):
        agent.remember(
            rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
            np.array([0.1], np.float32), np.eye(4)[0].astype(np.float32),
            np.array([0.0, 0.5], np.float32), np.float32(1.0),
            rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
            np.array([0.1], np.float32), np.eye(4)[0].astype(np.float32),
            np.float32(i == 15))
    actor_before = jax.tree_util.tree_map(
        lambda a: np.asarray(a).copy(), agent.state.actor_params)
    tgt_before = jax.tree_util.tree_map(
        lambda a: np.asarray(a).copy(), agent.state.target_actor_params)
    opt_before = jax.tree_util.tree_map(
        lambda a: np.asarray(a).copy(), agent.state.actor_opt)
    critic_before = np.asarray(
        agent.state.critic_params["value_pred"]["dense_0"]["kernel"]
    ).copy()
    metrics = agent.learn(critic_only=True)
    assert np.isfinite(metrics["critic_loss"])
    assert metrics["actor_loss"] == 0.0
    for name, before, after in [
            ("actor", actor_before, agent.state.actor_params),
            ("target", tgt_before, agent.state.target_actor_params),
            ("opt", opt_before, agent.state.actor_opt)]:
        jax.tree_util.tree_map(
            lambda b, a: np.testing.assert_array_equal(b, np.asarray(a)),
            before, after)
    critic_after = np.asarray(
        agent.state.critic_params["value_pred"]["dense_0"]["kernel"])
    assert not np.allclose(critic_before, critic_after)
    # a normal learn still works after warmup (both jit specializations alive)
    metrics = agent.learn()
    assert np.isfinite(metrics["actor_loss"])


def test_actor_adam_state_only_for_trainable(tiny_moe_cfg):
    """The actor optimizer keeps Adam moments ONLY for the exclude_freeze
    subset: frozen leaves are optax.MaskedNode (no mu/nu buffers — at
    stage-3 scale that is ~480 MB of HBM for parameters that never train),
    and the frozen target leaves pass through the soft update untouched."""
    import jax.numpy as jnp
    import optax

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

    import jax

    # MaskedNode is an empty pytree node: frozen leaves contribute NO mu/nu
    # arrays at all, so every remaining moment leaf belongs to the trainable
    # subset and the moment tree is strictly smaller than the param tree.
    masked_state = agent.state.actor_opt.inner_state[0]
    mu_leaves = jax.tree_util.tree_flatten_with_path(masked_state.mu)[0]
    assert mu_leaves
    assert all("action_pred" in jax.tree_util.keystr(p) for p, _ in mu_leaves)
    n_params = len(jax.tree_util.tree_leaves(agent.state.actor_params))
    assert len(mu_leaves) < n_params

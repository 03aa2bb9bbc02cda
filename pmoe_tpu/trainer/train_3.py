"""Stage 3 — DDPG fine-tuning in the driving simulator.

Reference: /root/reference/PMoE/trainer/train_3.py 'train(config)' — episode x
weather loops over a driving env, OU-noised ``agent.sample``, per-tick
``remember`` + ``learn`` (train_3.py:74-188). The reference ships broken
(missing env modules, SURVEY §2.4); this is the working equivalent over the
:class:`pmoe_tpu.sim.env.DrivingGym` seam (fake backend by default, real CARLA
via ``env.backend: carla``). The Agent is created ONCE (the reference
re-created it per route, train_3.py:102 — a bug).

Usage: ``python -m pmoe_tpu.trainer.train_3 [conf/stage_3]``
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models.rl_agent import Agent
from ..sim.env import DrivingGym
from ..sim.fake_carla import FakeCarlaBackend
from ..utils import get_conf, init_logger, load_checkpoint, graft, save_checkpoint
from ..utils.config import Config

__all__ = ["train", "make_env"]

WEATHERS_TRAIN = [1, 3, 6, 8]


def make_env(cfg) -> DrivingGym:
    env_cfg = cfg.get("env", {})
    backend_kind = env_cfg.get("backend", "fake")
    if backend_kind == "carla":
        from .. import sim
        from ..sim.carla_bridge import CarlaBackend

        backend = CarlaBackend(host=env_cfg.get("host", "localhost"),
                               port=int(env_cfg.get("port", 2000)),
                               town=env_cfg.get("town", "Town01"),
                               img_width=int(env_cfg.get("img_width", 800)),
                               img_height=int(env_cfg.get("img_height", 600)))
    else:
        backend = FakeCarlaBackend(
            town=env_cfg.get("town", "Town01").replace("FullTown01-v1", "Town01"),
            img_width=int(env_cfg.get("img_width", 800)),
            img_height=int(env_cfg.get("img_height", 600)))
    ds = cfg.get("dataset", {})
    tp = cfg.get("train_params", {})
    return DrivingGym(
        backend,
        past_frames=int(cfg.get("model", {}).get("actor", {})
                        .get("backbone", {}).get("n_frames", 4)),
        crop=tuple(ds.get("crop", (125, 90))),
        resize=tuple(ds.get("resize", (224, 224))),
        n_commands=int(tp.get("n_commands", 4)),
        speed_factor=float(ds.get("speed_factor", 10)),
        episode_length=int(tp.get("episode_length", 1000)),
    )


def train(cfg) -> Agent:
    cfg = get_conf(cfg) if isinstance(cfg, (str, Path)) else cfg
    logger = init_logger(cfg.get("logger", {}))
    env = make_env(cfg)
    tp = cfg.get("train_params", {})
    mcfg = cfg.get("model", {})

    obs = env.reset()
    example = (jnp.asarray(obs[0]).astype(jnp.float32) / 255.0,
               jnp.asarray(obs[1]), jnp.asarray(obs[2]))
    from ..utils.nn import parse_dtype

    agent = Agent(mcfg, example, dtype=parse_dtype(tp.get("dtype", "float32")),
                  parallel=cfg.get("parallel", None))

    # restore the pretrained actor (reference rl_agent.py:26-31)
    model_dir = str(mcfg.get("actor", {}).get("model_dir", ""))
    if model_dir and Path(model_dir).exists():
        ck = load_checkpoint(model_dir)
        # device_put: graft returns host numpy leaves, which jitted calls
        # would otherwise re-upload on every agent.sample until the first
        # learn() returns a device-resident state (ruinous over a tunnel)
        restored = jax.device_put(
            graft(agent.state.actor_params, ck.get("model", ck),
                  verbose=True))
        agent.state = agent.state._replace(
            actor_params=restored,
            target_actor_params=jax.tree_util.tree_map(jnp.array, restored))

    max_episodes = int(tp.get("max_episodes", 10))
    # critic-only learn steps before any actor ascent: a fresh critic's
    # early gradients are noise and measurably damage a good BC actor
    # (PERF.md "Stage-3 DDPG before/after" run 1); warmup fits Q to the BC
    # policy's returns first. 0 = the reference recipe (train_3.py:45).
    critic_warmup = int(tp.get("critic_warmup", 0))
    save_dir = cfg.get("directory", {}).get("save", "checkpoint")
    model_name = cfg.get("directory", {}).get("model_name", "PMoE-RL")

    step = 0
    for episode in range(max_episodes):
        weather = WEATHERS_TRAIN[episode % len(WEATHERS_TRAIN)]
        n_spawn = len(env.backend.spawn_points())
        (images, speed, command) = env.reset(
            start_idx=episode % n_spawn,
            target_idx=(episode + 5) % n_spawn,
            weather=weather, seed=episode)
        agent.noise.reset()
        ep_reward, done = 0.0, False
        while not done:
            action = agent.sample(images, speed, command)[0]
            (n_images, n_speed, n_command), reward, done, info = env.step(action)
            agent.remember(images[0], speed[0], command[0],
                           action.astype(np.float32), np.float32(reward),
                           n_images[0], n_speed[0], n_command[0],
                           np.float32(done))
            # fetch (device->host sync) the learn metrics only on logging
            # ticks: every other step stays fully asynchronous, so the 20 Hz
            # env loop never blocks on the tunnel round-trip
            fetch = (step + 1) % 50 == 0
            metrics = agent.learn(fetch_metrics=fetch,
                                  critic_only=step < critic_warmup)
            images, speed, command = n_images, n_speed, n_command
            ep_reward += reward
            step += 1
            if metrics and fetch:
                logger.log_metrics(metrics, step=step, epoch=episode)
        logger.log_metrics({"episode_reward": ep_reward,
                            "route_completion": info["route_completion"]},
                           step=step, epoch=episode)
        print(f"[stage3] episode {episode}: reward={ep_reward:.1f} "
              f"RC={info['route_completion']:.1f}%")
        save_checkpoint({"model": agent.state.actor_params,
                         "critic": agent.state.critic_params,
                         "epoch": np.int64(episode)},
                        False, save_dir, f"{model_name}-e{episode}",
                        best_prefix=model_name)
    logger.end()
    return agent


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg_path = argv[0] if argv else "pmoe_tpu/conf/stage_3"
    train(cfg_path)


if __name__ == "__main__":
    main()

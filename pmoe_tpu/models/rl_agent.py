"""DDPG actor/critic for stage-3 fine-tuning (reference /root/reference/PMoE/model/rl_agent.py).

The whole DDPG update — target-actor rollout, critic TD regression, actor
ascent, soft target update — is ONE jitted function over device-resident
parameters. Replay scalars live in host numpy ring buffers; replay FRAMES
live in a device-resident uint8 ring pool when they fit the HBM budget
(``device_replay: auto``) — each transition uploads its one new frame and
learn batches gather their (B, T+1)-frame windows on device by index. Buffers
too large for the pool stream as host-built windows (or plain stacks when
transitions are not consecutive).

Reference bugs fixed (they make stage 3 un-runnable / wrong as shipped,
SURVEY §2.1):
* ``target.vew(...)`` typo (rl_agent.py:172) — n/a here;
* done-mask not inverted (rl_agent.py:169) — we use ``(1 - done)``;
* ``params.backbone.type`` vs ``params.critic.backbone.type`` (rl_agent.py:47).

Network shapes follow conf/stage_3.yaml: critic = backbone(512) + speed/command/
action MLP encoders (128 each) -> value MLP(896 -> ... -> 1).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Mapping, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..nn.blocks import MLP
from ..utils.nn import jit_init, make_freeze_mask, stop_gradient_frozen
from ..utils.noise import OrnsteinUhlenbeckActionNoise
from .moe import get_model, _build_backbone, _mlp, _fold_time
from .replay import ReplayMemory, Transition

__all__ = ["Critic", "Agent", "DDPGState"]

#: minimum slack between the frame pool and the replay ring: entries whose
#: window start is within this many frames of being overwritten are excluded
#: from sampling (covers the one-step staging gap of the double-buffered
#: batch). The effective margin scales with past_frames — see Agent._init_pool
#: — and staged indices are re-validated against the pool at learn() time.
_POOL_MARGIN = 8


class Critic(nn.Module):
    """Q(s, a): backbone + 3 MLP encoders -> value head (reference rl_agent.py:42-73)."""

    cfg: Mapping          # the critic config block
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, speed, command, action, train: bool = False):
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        state = _build_backbone(self.cfg["backbone"], name="backbone", **dt)(
            _fold_time(images), train)
        spd = _mlp(self.cfg["speed_encoder"], name="speed_encoder", **dt)(
            speed, train)
        act = _mlp(self.cfg["action_encoder"], name="action_encoder", **dt)(
            action, train)
        cmd = _mlp(self.cfg["command_encoder"], name="command_encoder", **dt)(
            command, train)
        feats = jnp.concatenate([state, spd, cmd, act], axis=-1)
        return _mlp(self.cfg["value_prediction"], name="value_pred", **dt)(
            feats, train)


class DDPGState(NamedTuple):
    actor_params: Any
    actor_batch_stats: Any
    actor_opt: Any
    critic_params: Any
    critic_batch_stats: Any
    critic_opt: Any
    target_actor_params: Any
    target_critic_params: Any


class Agent:
    """DDPG agent (reference rl_agent.py:76-219): replay buffer, OU noise,
    target networks with soft update tau, jitted learn step."""

    def __init__(self, params: Mapping, example_obs, rng=None,
                 dtype=jnp.float32, parallel: Mapping | None = None):
        self.gamma = float(params["gamma"])
        self.tau = float(params["tau"])
        self.batch_size = int(params["batch_size"])
        self.memory = ReplayMemory(int(params["buffer_size"]))

        # optional device mesh (stage-3 DP/EP): replay batches shard over the
        # 'data' axis, stacked-expert params over 'expert'; XLA inserts the
        # gradient all-reduce / expert all-gather collectives under jit.
        par = dict(parallel if parallel is not None
                   else params.get("parallel", {}) or {})
        d, e = int(par.get("data", 1)), int(par.get("expert", 1))
        self.mesh = None
        if d * e > 1:
            from ..parallel import make_mesh

            self.mesh = make_mesh(jax.devices()[:d * e], data=d, expert=e)
            if self.batch_size % d:
                raise ValueError(
                    f"batch_size {self.batch_size} not divisible by the "
                    f"data-parallel degree {d}")

        ou = params["OU"]
        self.noise = OrnsteinUhlenbeckActionNoise(
            mu=np.array(ou["mu"], float), sigma=np.array(ou["sigma"], float),
            theta=np.array(ou["theta"], float)[0]
            if np.ndim(ou["theta"]) else float(ou["theta"]))

        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        actor_cfg = params["actor"]
        critic_cfg = params["critic"]
        self.actor_model = get_model(actor_cfg, dtype=dtype)
        self.actor_type = actor_cfg.get("type", "pmoe")
        self.critic_model = Critic(cfg=critic_cfg, dtype=dtype)

        images, speed, command = example_obs
        k1, k2, k3 = jax.random.split(self._next_rng(), 3)
        with self._packing_ctx():
            avars = jit_init(self.actor_model, {"params": k1, "sample": k2},
                             images, speed, command)
            cvars = jit_init(self.critic_model, {"params": k3}, images, speed,
                             command, jnp.zeros((images.shape[0], 2)))

        actor_params = avars["params"]
        self.actor_batch_stats = avars.get("batch_stats", {})
        critic_params = cvars["params"]
        self.critic_batch_stats = cvars.get("batch_stats", {})

        # actor trains only the exclude_freeze subset (e.g. mixers + alphas)
        trainable = make_freeze_mask(actor_params,
                                     list(actor_cfg.get("exclude_freeze", [])))
        self._actor_trainable = trainable
        self._fused_trunk = self._can_fuse_trunk(trainable)
        # Adam runs ONLY on the trainable leaves (mixers + alphas): the frozen
        # ~60M-param trunk carries no mu/nu buffers (~480 MB HBM at fp32) and
        # no per-step moment math. Frozen updates pass through unchanged —
        # exact zeros, since actor_loss_fn prunes the frozen backward with
        # stop_gradient_frozen.
        self.actor_tx = optax.masked(
            optax.adam(float(actor_cfg.get("lr", 1e-5))), trainable)
        self.critic_tx = optax.adam(float(critic_cfg.get("lr", 1e-3)))

        self.state = DDPGState(
            actor_params=actor_params,
            actor_batch_stats=self.actor_batch_stats,
            actor_opt=self.actor_tx.init(actor_params),
            critic_params=critic_params,
            critic_batch_stats=self.critic_batch_stats,
            critic_opt=self.critic_tx.init(critic_params),
            # update_network_parameters(tau=1): hard copy at init
            target_actor_params=jax.tree_util.tree_map(jnp.array, actor_params),
            target_critic_params=jax.tree_util.tree_map(jnp.array, critic_params),
        )
        if self.mesh is not None:
            from ..parallel import shard_params

            # expert-stacked leaves over 'expert', everything else replicated
            self.state = DDPGState(
                **{f: shard_params(self.mesh, getattr(self.state, f))
                   for f in DDPGState._fields})
        # donate the state: params/opt/target trees update in place (saves a
        # full read+write of ~6 param-sized trees per step and halves their
        # peak HBM); learn() immediately replaces self.state, so the donated
        # buffers are never observed after the call
        self._learn_jit = jax.jit(self._learn_step, donate_argnums=(0,))
        # critic-only specialization (warmup: fit Q to the BC policy's returns
        # before any actor ascent — the fresh critic's early gradients are
        # noise and damage a good BC actor faster than the return signal
        # repairs it; measured in PERF.md "Stage-3 DDPG before/after")
        self._learn_critic_jit = jax.jit(
            partial(self._learn_step, critic_only=True),
            donate_argnums=(0,))
        self._act_jit = jax.jit(self._act)
        self._staged = None                 # double-buffered replay batch
        self._windows_ok = True             # all transitions consecutive so far
        self._past_frames = int(images.shape[1])

        # Device-resident replay frame pool (Anakin/Sebulba-style TPU RL):
        # each remember() uploads the ONE new frame of the rolling window and
        # the learn step gathers its (B, T+1)-frame windows on device by
        # index, so replay frames never re-cross host->device. Engaged when
        # the whole buffer's frames fit the memory budget
        # (PMOE_DEVICE_REPLAY_BUDGET_MB, default 2048); the reference-scale
        # 100k buffer falls back to host ring buffers + streamed windows.
        self._device_replay = params.get("device_replay", "auto")
        self._pool = None                   # uint8 (F, H, W, C) on device
        self._pool_F = 0
        self._pool_w = 0                    # monotone frame-write counter
        self._tr_start = None               # per-ring-slot window start (monotone)
        self._last_new_images = None
        self._last_done = True              # previous transition ended episode?
        self._pool_add_jit = None
        # Margin scales with the frames a single remember() can write
        # (episode restart writes past_frames+1 at once; two restarts between
        # learns write 2*(T+1)) so a wrapped pool never serves overwritten
        # frames as window data.
        self._pool_margin = max(2 * (self._past_frames + 1), _POOL_MARGIN)
        self._staged_idx = None             # ring indices of the staged batch

    @staticmethod
    def _packing_ctx():
        """Scoped packing default for every trace this agent makes: the
        DDPG trunks run frozen/forward-only, where the W-pair packing's 2x
        structural-zero MACs are a measured net LOSS (pairwise A/B on v5e
        at batch 64: all-unpacked 913 ms vs packed 1103 ms per learn step,
        logs/roundwork_s3pair_142204.log) — unlike the stage-0/1/2 TRAIN
        steps where it wins. Explicit PMOE_PACKED_STEM / PMOE_PACKED_UNET
        env values still override (the A/B escape hatch)."""
        from ..nn.packed import packing_context

        return packing_context("0")

    def _next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def _can_fuse_trunk(self, trainable) -> bool:
        """True when the actor's expensive trunk can be hoisted out of the
        gradient and shared between the actor and target-actor forwards.

        Exactness argument (stage-3 recipe, conf/stage_3.yaml
        exclude_freeze=[model_weights, alpha]): the PMoE trunk's only
        potentially-trainable leaves are the MoE alpha gates, and the mixture
        ``sample`` routes alpha exclusively through an argmax + one-hot gather
        (ops/distributions.py:42-53) — zero gradient, exactly like the torch
        reference where ``dists.sample()`` detaches (reference moe.py:352).
        Zero grad + masked optimizer means trunk leaves never change, so
        actor and target trunks stay identical and one double-batch trunk
        pass is gradient- and value-exact."""
        if self.actor_type not in ("pmoe", "pmoe+pretrained"):
            return False
        offending = []

        def check(path, leaf_trainable):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            top = name.split("/", 1)[0]
            if leaf_trainable and top in ("moe", "punet") \
                    and "alpha" not in name:
                offending.append(name)

        jax.tree_util.tree_map_with_path(check, trainable)
        return not offending

    @staticmethod
    def _norm(images):
        """uint8 frame stacks (replay storage format) -> float in [0,1]."""
        if images.dtype == jnp.uint8:
            return images.astype(jnp.float32) / 255.0
        return images

    # -- acting -------------------------------------------------------------------
    def _act(self, state: DDPGState, images, speed, command, rng):
        images = self._norm(images)
        variables = {"params": state.actor_params,
                     "batch_stats": state.actor_batch_stats}
        return self.actor_model.apply(variables, images, speed, command, False,
                                      method="sample", rngs={"sample": rng})

    def sample(self, images, speed, command) -> np.ndarray:
        """Policy action + OU exploration noise (reference rl_agent.py:98-109)."""
        with self._packing_ctx():
            mu = self._act_jit(self.state, jnp.asarray(images),
                               jnp.asarray(speed), jnp.asarray(command),
                               self._next_rng())
        return np.asarray(mu) + self.noise()

    def remember(self, *transition) -> None:
        tr = Transition(*transition)
        imgs, nimgs = np.asarray(tr.images), np.asarray(tr.new_images)
        if self._windows_ok:
            # Consecutive-window detection: when every stored transition's s'
            # frame stack is s shifted by one tick (the closed-loop collection
            # pattern), the learn step can use the (T+1)-frame union — and the
            # fused trunk segments it once — see _learn_step's window path.
            if imgs.ndim < 4 or imgs.shape != nimgs.shape \
                    or not np.array_equal(imgs[1:], nimgs[:-1]):
                self._windows_ok = False
                self._spill_pool_to_host()
        if self._windows_ok and self._pool is None \
                and self._pool_wanted(imgs):
            self._init_pool(imgs)
        if self._pool is not None:
            # Episode continuation is signalled by the PREVIOUS transition's
            # done flag, not by frame equality alone: a deterministic reset
            # whose first stack equals the last s' stack must still start a
            # fresh window (otherwise it would point at the previous
            # episode's tail). The equality check remains as the guard for
            # non-terminal discontinuities (e.g. externally injected stacks).
            if not self._last_done and self._last_new_images is not None \
                    and np.array_equal(imgs, self._last_new_images):
                new_frames = nimgs[-1:]                 # episode continues
                start = self._pool_w - imgs.shape[0]
            else:
                new_frames = np.concatenate([imgs, nimgs[-1:]], axis=0)
                start = self._pool_w                    # episode (re)start
            self._tr_start[self.memory.position] = start
            for f in new_frames:
                slot = self._pool_w % self._pool_F
                self._pool = self._pool_add_jit(self._pool, jnp.asarray(f),
                                                jnp.int32(slot))
                self._pool_w += 1
            self._last_new_images = nimgs.copy()
            self._last_done = bool(np.asarray(tr.done).reshape(-1)[0])
            # frames live in the pool; store placeholder images host-side
            ph = np.zeros((1,), np.uint8)
            self.memory.push(*tr._replace(images=ph, new_images=ph))
        else:
            self.memory.push(*transition)

    # -- device frame pool --------------------------------------------------------
    def _pool_wanted(self, imgs: np.ndarray) -> bool:
        if self._device_replay is False or self.mesh is not None \
                or imgs.ndim < 4:
            return False
        if self._device_replay is True:
            return True
        # "auto": engage when the whole buffer's frames fit the budget
        F = self.memory.capacity + 2 * self._pool_margin
        frame_bytes = int(np.prod(imgs.shape[1:]))
        budget = float(os.environ.get("PMOE_DEVICE_REPLAY_BUDGET_MB", 2048))
        return F * frame_bytes <= budget * 2 ** 20

    def _init_pool(self, imgs: np.ndarray) -> None:
        self._pool_F = self.memory.capacity + 2 * self._pool_margin
        self._pool = jnp.zeros((self._pool_F, *imgs.shape[1:]), jnp.uint8)
        self._tr_start = np.full((self.memory.capacity,), -10 ** 9, np.int64)
        self._pool_add_jit = jax.jit(
            lambda pool, frame, slot: jax.lax.dynamic_update_slice(
                pool, frame[None], (slot,) + (0,) * frame.ndim),
            donate_argnums=(0,))

    def _pool_valid_mask(self) -> np.ndarray:
        """Ring entries whose window frames are still unoverwritten (with a
        margin covering the staged batch's one-step gap)."""
        horizon = self._pool_w - self._pool_F + self._pool_margin
        return self._tr_start >= max(horizon, 0)

    def _spill_pool_to_host(self) -> None:
        """Reconstruct host-side frame stacks from the pool (one-time D2H)
        when a non-consecutive transition disables the window invariant."""
        if self._pool is None:
            return
        pool = np.asarray(self._pool)
        T = self._past_frames
        old = self.memory
        fresh = ReplayMemory(old.capacity, rng=old._rng)
        if len(old) > 0:
            valid = self._pool_valid_mask()[:len(old)]
            # ring order: oldest first
            if len(old) < old.capacity:
                order = range(len(old))
            else:
                order = [(old.position + i) % old.capacity
                         for i in range(old.capacity)]
            for i in order:
                if not valid[i]:
                    continue                       # frames already overwritten
                s = self._tr_start[i]
                sl = (s + np.arange(T + 1)) % self._pool_F
                win = pool[sl]
                tr = Transition(**{k: v[i] for k, v in old._buffers.items()})
                fresh.push(*tr._replace(images=win[:T], new_images=win[1:]))
        self.memory = fresh
        self._pool = None
        self._pool_add_jit = None
        self._tr_start = None
        self._last_new_images = None
        self._staged = None
        self._staged_idx = None

    # -- learning -----------------------------------------------------------------
    def _forward_actor(self, params, batch_stats, images, speed, command, rng):
        out = self.actor_model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, speed, command, False, method="sample",
            rngs={"sample": rng})
        return out

    def _learn_step(self, state: DDPGState, batch: dict, rng,
                    critic_only: bool = False):
        k1, k2 = jax.random.split(rng)
        speed, command, action = batch["speed"], batch["command"], batch["action"]
        reward = batch["reward"].reshape(-1, 1)
        done = batch["done"].reshape(-1, 1).astype(jnp.float32)
        n_speed, n_command = batch["new_speed"], batch["new_command"]
        window = None
        if "frame_start" in batch:
            # device-resident frame pool: gather each sample's (T+1)-frame
            # window from the pool by start index — no frame bytes cross
            # host->device for this batch at all
            F = batch["frame_pool"].shape[0]
            sl = (batch["frame_start"][:, None]
                  + jnp.arange(self._past_frames + 1)[None, :]) % F
            window = self._norm(batch["frame_pool"][sl])
        elif "window" in batch:
            # consecutive transitions: s / s' are overlapping views of the
            # (B, T+1)-frame union (staged by _stage_batch); 37.5% less replay
            # H2D at T=4, and the trunk segments each unique frame once.
            window = self._norm(batch["window"])
        if window is not None:
            images, n_images = window[:, :-1], window[:, 1:]
        else:
            images = self._norm(batch["images"])
            n_images = self._norm(batch["new_images"])

        # targets: y = r + gamma * Q'(s', pi'(s')) * (1 - done)
        if self._fused_trunk and not critic_only:
            # ONE double-batch pass of the frozen PMoE trunk covers both the
            # target-actor (s') and actor (s) forwards: same FLOPs, but the
            # convs run at 2B batch (much better MXU utilization than two B
            # passes) and the actor backward skips the trunk entirely. Exact
            # under the stage-3 freeze — see _can_fuse_trunk. With a window
            # batch the frozen seg U-Net additionally runs on the T+1 unique
            # frames instead of the 2T stacked ones (trunk_pair).
            B = images.shape[0]
            spd2 = jnp.concatenate([speed, n_speed], axis=0)
            cmd2 = jnp.concatenate([command, n_command], axis=0)
            avars = {"params": state.actor_params,
                     "batch_stats": state.actor_batch_stats}
            if window is not None:
                moe_b, punet_b = self.actor_model.apply(
                    avars, window, spd2, cmd2, False, method="trunk_pair",
                    rngs={"sample": k1})
            else:
                moe_b, punet_b = self.actor_model.apply(
                    avars, jnp.concatenate([images, n_images], axis=0),
                    spd2, cmd2, False, method="trunk", rngs={"sample": k1})
            moe_b = jax.lax.stop_gradient(moe_b)
            punet_b = jax.lax.stop_gradient(punet_b)
            target_actions = self.actor_model.apply(
                {"params": state.target_actor_params,
                 "batch_stats": state.actor_batch_stats},
                moe_b[B:], punet_b[B:], method="head")
        else:
            # critic-only warmup also lands here even when the trunk is
            # fusable: the 2B fused pass would compute the actor s-half that
            # only the (skipped) actor_loss_fn consumes, and XLA cannot DCE
            # half of a concatenated-batch conv — the single-batch target
            # forward on s' alone is the cheaper program (ADVICE r4).
            target_actions = self._forward_actor(
                state.target_actor_params, state.actor_batch_stats,
                n_images, n_speed, n_command, k1)
        q_next = self.critic_model.apply(
            {"params": state.target_critic_params,
             "batch_stats": state.critic_batch_stats},
            n_images, n_speed, n_command, target_actions, False)
        y = reward + self.gamma * q_next * (1.0 - done)
        y = jax.lax.stop_gradient(y)

        def critic_loss_fn(cp):
            q = self.critic_model.apply(
                {"params": cp, "batch_stats": state.critic_batch_stats},
                images, speed, command, action, False)
            return jnp.mean((y - q) ** 2)

        critic_loss, c_grads = jax.value_and_grad(critic_loss_fn)(
            state.critic_params)
        c_updates, critic_opt = self.critic_tx.update(
            c_grads, state.critic_opt, state.critic_params)
        critic_params = optax.apply_updates(state.critic_params, c_updates)

        if critic_only:
            # warmup: fit Q(s,a) to the current (BC) policy's returns; the
            # actor, its target, and their optimizer states are untouched
            soft_c = jax.tree_util.tree_map(
                lambda a, b: a + self.tau * (b - a),
                state.target_critic_params, critic_params)
            new_state = state._replace(
                critic_params=critic_params, critic_opt=critic_opt,
                target_critic_params=soft_c)
            return new_state, {"critic_loss": critic_loss,
                               "actor_loss": jnp.float32(0.0)}

        def actor_loss_fn(ap):
            # prune the frozen subtrees' backward (reference requires_grad
            # semantics); without this the frozen MoE backbone's gradient
            # buffers OOM a single chip at batch 64
            ap = stop_gradient_frozen(ap, self._actor_trainable)
            if self._fused_trunk:
                mu = self.actor_model.apply(
                    {"params": ap, "batch_stats": state.actor_batch_stats},
                    moe_b[:B], punet_b[:B], method="head")
            else:
                mu = self._forward_actor(ap, state.actor_batch_stats,
                                         images, speed, command, k2)
            q = self.critic_model.apply(
                {"params": critic_params,
                 "batch_stats": state.critic_batch_stats},
                images, speed, command, mu, False)
            return -jnp.mean(q)

        actor_loss, a_grads = jax.value_and_grad(actor_loss_fn)(
            state.actor_params)
        a_updates, actor_opt = self.actor_tx.update(
            a_grads, state.actor_opt, state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, a_updates)

        # soft target update: theta' <- theta' + tau*(theta - theta');
        # algebraically tau*theta + (1-tau)*theta', but bitwise-stable when
        # theta == theta' (frozen leaves stay identical forever — the
        # invariant the fused-trunk path relies on). Frozen actor leaves skip
        # the lerp entirely: the target buffer passes through untouched
        # (b == a there, so the math was a full-tree read/write of ~60M
        # params per step for a no-op).
        soft = lambda t, s: jax.tree_util.tree_map(
            lambda a, b: a + self.tau * (b - a), t, s)
        soft_actor = jax.tree_util.tree_map(
            lambda m, a, b: a + self.tau * (b - a) if m else a,
            self._actor_trainable, state.target_actor_params, actor_params)
        new_state = state._replace(
            actor_params=actor_params, actor_opt=actor_opt,
            critic_params=critic_params, critic_opt=critic_opt,
            target_actor_params=soft_actor,
            target_critic_params=soft(state.target_critic_params, critic_params),
        )
        return new_state, {"critic_loss": critic_loss, "actor_loss": actor_loss}

    def _stage_batch(self):
        """Sample + start the async host->device upload of one replay batch.

        Three forms, best first:
        * frame pool engaged — frames are already device-resident; only the
          per-sample window START indices (B int32) cross host->device and
          the learn step gathers the (B, T+1) windows from the pool;
        * consecutive transitions, no pool — s/s' frame stacks are uploaded
          as their (B, T+1)-frame union (5/8 of the frame bytes at T=4);
        * general — both uint8 stacks, the reference-shaped upload."""
        if self._pool is not None:
            idx = self.memory.sample_indices(self.batch_size,
                                             valid=self._pool_valid_mask())
            batch = self.memory.sample_at(idx)._asdict()
            batch.pop("images")
            batch.pop("new_images")
            batch["frame_start"] = (self._tr_start[idx] % self._pool_F
                                    ).astype(np.int32)
            self._staged_idx = idx
            return {k: jax.device_put(v) for k, v in batch.items()}
        self._staged_idx = None
        tr: Transition = self.memory.sample(self.batch_size)
        batch = tr._asdict()
        if self._windows_ok:
            batch["window"] = np.concatenate(
                [batch.pop("images"), batch.pop("new_images")[:, -1:]], axis=1)
        if self.mesh is not None:
            from ..parallel import shard_batch

            return shard_batch(self.mesh, batch)
        return {k: jax.device_put(v) for k, v in batch.items()}

    def learn(self, fetch_metrics: bool = True, critic_only: bool = False):
        """One DDPG update. The NEXT batch's host->device transfer is staged
        before this step's metrics are fetched, so the (large, uint8) replay
        upload overlaps the device compute — double-buffered H2D, the
        device-side analog of the trainer's DevicePrefetcher."""
        if len(self.memory) < self.batch_size:
            return None
        staged = self._staged if self._staged is not None else \
            self._stage_batch()
        if "frame_start" in staged and self._staged_idx is not None \
                and not self._pool_valid_mask()[self._staged_idx].all():
            # Frames written between staging and now overwrote part of a
            # staged window (possible when remember() runs more than
            # pool_margin times per learn()); resample a fresh batch.
            staged = self._stage_batch()
        if "frame_start" in staged:
            # attach the CURRENT pool version at call time (it is immutable
            # and device-resident; the validity margin in _pool_valid_mask
            # covers frames written between staging and this call)
            staged = dict(staged, frame_pool=self._pool)
        with self._packing_ctx():
            fn = self._learn_critic_jit if critic_only else self._learn_jit
            self.state, metrics = fn(self.state, staged, self._next_rng())
        self._staged = self._stage_batch()      # uploads while step runs
        if not fetch_metrics:
            return metrics                      # device scalars, non-blocking
        return {k: float(v) for k, v in metrics.items()}

    def update_network_parameters(self, tau: float | None = None) -> None:
        tau = self.tau if tau is None else tau
        soft = lambda t, s: jax.tree_util.tree_map(
            lambda a, b: a + tau * (b - a), t, s)
        self.state = self.state._replace(
            target_actor_params=soft(self.state.target_actor_params,
                                     self.state.actor_params),
            target_critic_params=soft(self.state.target_critic_params,
                                      self.state.critic_params))

"""Performance benchmark — prints ONE JSON line for the driver.

Measures on the attached accelerator:
* stage-2/3-style train steps/sec/chip: the full jitted MoE train step
  (uint8 batch -> on-device super_hard augmentation -> 3-expert stacked
  forward/backward @ 4x224x224, batch 64 -> adam update), the reference's
  north-star training configuration (BASELINE.json config #4);
* p50 per-frame action-inference latency: the closed-loop agent step (one
  uint8 frame upload -> ring-buffer roll -> normalize -> model.sample),
  matching the NoCrash agent hot loop (BASELINE.json config #5).

vs_baseline: the reference publishes no numbers (BASELINE.json: published {});
vs_baseline reports speedup vs a torch-CPU-measured proxy unavailable here, so
we emit 1.0 until a reference measurement exists.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pmoe_tpu.models import get_model
from pmoe_tpu.ops.augment import augment
from pmoe_tpu.trainer.losses import moe_loss
from pmoe_tpu.utils.nn import jit_init

BATCH = 64
N_EXPERTS = 3
COMMANDS = 6


def _cfg(dtype_tag):
    mlp = lambda dims, act="relu", l_act=False: {
        "dims": dims, "act": act, "l_act": l_act, "bn": False, "dropout": 0.0}
    return {
        "type": "moe", "n_experts": N_EXPERTS,
        "speed_encoder": mlp([1, 512, 512]),
        "command_encoder": mlp([COMMANDS, 512, 512]),
        "speed_prediction": mlp([1536, 512, 512, 1]),
        "action_head": mlp([1536, 512, 512], "elu", True),
        "backbone": {"type": "rgb", "n_frames": 4,
                     "rgb": {"arch": "resnet18", "pretrained": False,
                             "gamma": 2, "b": 1}},
    }


def bench_train_step():
    model = get_model(_cfg("bf16"), dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    img_u8 = jnp.zeros((BATCH, 4, 224, 224, 3), jnp.uint8)
    spd = jnp.zeros((BATCH, 1), jnp.float32)
    cmd = jnp.zeros((BATCH, COMMANDS), jnp.float32)
    control = jnp.zeros((BATCH, 2), jnp.float32)
    variables = jit_init(model, {"params": rng},
                         img_u8[:2].astype(jnp.float32), spd[:2], cmd[:2])
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-4))
    opt_state = tx.init(params)

    def train_step(params, batch_stats, opt_state, img_u8, spd, cmd, control,
                   rng, it):
        x = img_u8.astype(jnp.float32) / 255.0
        x = augment(rng, x, it * BATCH, "super_hard", BATCH)

        def loss_fn(p):
            (dist, speeds), updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x, spd, cmd, True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            return moe_loss(dist, speeds, control, spd, (0.7, 0.3)), updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        upd, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, updates["batch_stats"], opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    # warmup/compile; NOTE: on the tunneled runtime block_until_ready does not
    # actually block — a device->host scalar fetch is the only honest barrier.
    params, batch_stats, opt_state, loss = step(
        params, batch_stats, opt_state, img_u8, spd, cmd, control, rng, 0.0)
    _ = float(loss)

    n_steps = 20
    t0 = time.perf_counter()
    for i in range(n_steps):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, img_u8, spd, cmd, control, rng,
            float(i))
    _ = float(loss)                       # D2H barrier
    dt = time.perf_counter() - t0
    return n_steps / dt


def bench_inference_latency():
    model = get_model(_cfg("bf16"), dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    frames = jnp.zeros((1, 4, 224, 224, 3), jnp.float32)
    spd = jnp.zeros((1, 1), jnp.float32)
    cmd = jnp.zeros((1, COMMANDS), jnp.float32)
    variables = jit_init(model, {"params": rng}, frames, spd, cmd)

    @jax.jit
    def agent_step(variables, frames, new_frame_u8, spd, cmd, rng):
        frame = new_frame_u8.astype(jnp.float32) / 255.0
        frames = jnp.concatenate([frames[:, 1:], frame[None, None]], axis=1)
        action = model.apply(variables, frames, spd, cmd, False,
                             method="sample", rngs={"sample": rng})
        return frames, action

    new_frame = jnp.zeros((224, 224, 3), jnp.uint8)
    frames, action = agent_step(variables, frames, new_frame, spd, cmd, rng)
    _ = np.asarray(action)

    lat = []
    for i in range(50):
        t0 = time.perf_counter()
        frames, action = agent_step(variables, frames, new_frame, spd, cmd,
                                    jax.random.fold_in(rng, i))
        _ = np.asarray(action)            # D2H barrier — the agent reads the
        lat.append(time.perf_counter() - t0)  # action on host every tick anyway
    return float(np.percentile(np.array(lat) * 1000.0, 50))


def main():
    steps_per_sec = bench_train_step()
    p50_ms = bench_inference_latency()
    print(json.dumps({
        "metric": "stage2_moe_train_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": 1.0,
        "extra": {"p50_inference_latency_ms": round(p50_ms, 3),
                  "batch": BATCH, "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()

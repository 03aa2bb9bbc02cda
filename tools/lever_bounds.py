"""Measure the UPPER BOUND of the two round-3 'named perf levers' by paired
deletion A/B on the real chip (VERDICT r3 item 4: build the kernels or
falsify them with numbers).

A perfect fused kernel can at most remove the work it fuses away; deleting
that work outright (measurement-only env knobs) therefore upper-bounds any
implementation:

* stage-0 'Pallas BN-epilogue backward fusion' — `PMOE_BN_FROZEN_STATS=1`
  runs every U-Net ConvBlock3 BatchNorm on running stats in train mode: the
  batch-stat forward reductions and ALL their backward reduces vanish. A
  real fusion keeps the statistics (it only restructures passes), so it
  recovers strictly less than this deletion.
* stage-1/stage-3 'fused ECA-pool+gate+entry-conv window pass' —
  `PMOE_ECA0_IDENTITY=1` deletes the (B,H,W,92) window gate entirely
  (pool, 1-D conv, sigmoid, scale, and their backward). A real fusion must
  still compute the pool and gate math, so again strictly less.

Both variants are traced into separate jitted steps in ONE process (the env
flags are read at trace time) and timed in interleaved windows, so relay
load cancels out of the ratio.

Usage: python -u tools/lever_bounds.py [--windows 4] [--steps 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/pmoe_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pmoe_tpu.utils.nn import jit_init


def _timed_pairs(step_a, step_b, state_a, state_b, args, windows, steps):
    """Interleaved A/B windows; returns (best_a, best_b, ratios) in
    steps/s. States are threaded (donated) independently per variant."""
    ratios, best_a, best_b = [], 0.0, 0.0

    def run(step, state):
        t0 = time.perf_counter()
        last = None
        for _ in range(steps):
            out = step(*state, *args)
            state, last = out[:-1], out[-1]    # step returns (*state, loss)
        _ = float(last)                 # device->host barrier (tunnel-safe)
        return state, steps / (time.perf_counter() - t0)

    # warm both
    state_a, _ = run(step_a, state_a)
    state_b, _ = run(step_b, state_b)
    for _ in range(windows):
        state_a, ra = run(step_a, state_a)
        state_b, rb = run(step_b, state_b)
        best_a, best_b = max(best_a, ra), max(best_b, rb)
        ratios.append(rb / ra)
    return best_a, best_b, ratios


def bound_stage0(windows, steps):
    from pmoe_tpu.nn.unet import UNet
    from pmoe_tpu.trainer.losses import cross_entropy_tversky_weighted_loss

    B = 64
    x = jnp.zeros((B, 224, 224, 3), jnp.float32)
    m = jnp.zeros((B, 224, 224), jnp.int32)
    tx = optax.adam(3e-4)

    def build():
        unet = UNet(in_features=3, out_features=23, dtype=jnp.bfloat16)
        v = jit_init(unet, {"params": jax.random.PRNGKey(0)}, x[:2])

        def step(p, bs, opt, x, m):
            def loss_fn(p):
                logits, upd = unet.apply({"params": p, "batch_stats": bs}, x,
                                         True, mutable=["batch_stats"])
                return cross_entropy_tversky_weighted_loss(logits, m), upd

            (l, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            u, opt = tx.update(g, opt, p)
            return optax.apply_updates(p, u), upd.get("batch_stats", bs), \
                opt, l

        v_opt = tx.init(v["params"])
        return jax.jit(step, donate_argnums=(0, 1, 2)), \
            [v["params"], v["batch_stats"], v_opt]

    os.environ.pop("PMOE_BN_FROZEN_STATS", None)
    step_a, st_a = build()
    os.environ["PMOE_BN_FROZEN_STATS"] = "1"
    step_b, st_b = build()
    os.environ.pop("PMOE_BN_FROZEN_STATS", None)

    a, b, ratios = _timed_pairs(step_a, step_b, st_a, st_b, (x, m),
                                windows, steps)
    print(f"[stage0-bn-bound] default {a:.3f} steps/s | frozen-stats "
          f"{b:.3f} steps/s | paired speedup "
          f"{[round(r, 3) for r in ratios]} median="
          f"{float(np.median(ratios)):.3f}", flush=True)
    return float(np.median(ratios))


def bound_stage1(windows, steps):
    from pmoe_tpu.models.punet import PredictiveUNet
    from pmoe_tpu.trainer.losses import autoregressive_loss

    B = 10
    x = jnp.zeros((B, 4, 224, 224, 3), jnp.float32)
    m = jnp.zeros((B, 6, 224, 224), jnp.int32)
    tx = optax.adam(3e-4)

    def build():
        pu = PredictiveUNet(past_frames=4, future_frames=6,
                            dtype=jnp.bfloat16)
        v = jit_init(pu, {"params": jax.random.PRNGKey(0)}, x[:1])

        def step(p, bs, opt, x, m):
            def loss_fn(p):
                outs, upd = pu.apply({"params": p, "batch_stats": bs}, x,
                                     train=True, mutable=["batch_stats"])
                return autoregressive_loss(outs, m, "l1"), upd

            (l, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            u, opt = tx.update(g, opt, p)
            return optax.apply_updates(p, u), upd.get("batch_stats", bs), \
                opt, l

        v_opt = tx.init(v["params"])
        return jax.jit(step, donate_argnums=(0, 1, 2)), \
            [v["params"], v["batch_stats"], v_opt]

    os.environ.pop("PMOE_ECA0_IDENTITY", None)
    step_a, st_a = build()
    os.environ["PMOE_ECA0_IDENTITY"] = "1"
    step_b, st_b = build()
    os.environ.pop("PMOE_ECA0_IDENTITY", None)

    a, b, ratios = _timed_pairs(step_a, step_b, st_a, st_b, (x, m),
                                windows, steps)
    print(f"[stage1-eca-bound] default {a:.3f} steps/s | no-window-gate "
          f"{b:.3f} steps/s | paired speedup "
          f"{[round(r, 3) for r in ratios]} median="
          f"{float(np.median(ratios)):.3f}", flush=True)
    return float(np.median(ratios))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--tasks", default="s0,s1")
    args = ap.parse_args()

    import bench

    bench.health_check()
    print("== session up ==", flush=True)
    if "s0" in args.tasks:
        bound_stage0(args.windows, max(args.steps, 3))
    if "s1" in args.tasks:
        bound_stage1(args.windows, args.steps)


if __name__ == "__main__":
    main()

"""Capture a device trace of the stage-0 (segmentation U-Net) or stage-1
(PU-Net rollout) train step and print the top HLO ops by self time.
Step construction mirrors bench.bench_stage01 exactly.

Usage: python tools/profile_stage0.py [--stage 0|1] [--outdir /tmp/prof_s0]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

import bench
from pmoe_tpu.utils.nn import jit_init
from tools.xplane_stats import print_top_ops


def build_stage0():
    """Mirrors bench.bench_stage01's stage-0 step (conf/stage_0.yaml bs 64)."""
    from pmoe_tpu.nn.unet import UNet
    from pmoe_tpu.trainer.losses import cross_entropy_tversky_weighted_loss

    B = 64
    unet = UNet(in_features=3, out_features=23, dtype=jnp.bfloat16)
    x = jnp.zeros((B, 224, 224, 3), jnp.float32)
    m = jnp.zeros((B, 224, 224), jnp.int32)
    v = jit_init(unet, {"params": jax.random.PRNGKey(0)}, x[:2])
    tx = optax.adam(3e-4)
    opt = tx.init(v["params"])

    def step(p, bs, opt, x, m):
        def loss_fn(p):
            logits, upd = unet.apply({"params": p, "batch_stats": bs}, x,
                                     True, mutable=["batch_stats"])
            return cross_entropy_tversky_weighted_loss(logits, m), upd
        (l, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        u, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, u), upd["batch_stats"], opt, l

    return step, (v["params"], v["batch_stats"], opt, x, m)


def build_stage1():
    """Stage-1 PU-Net rollout step (conf/stage_1.yaml bs 10, T'=6)."""
    from pmoe_tpu.models.punet import PredictiveUNet
    from pmoe_tpu.trainer.losses import autoregressive_loss

    B = 10
    pu = PredictiveUNet(past_frames=4, future_frames=6, dtype=jnp.bfloat16)
    x = jnp.zeros((B, 4, 224, 224, 3), jnp.float32)
    m = jnp.zeros((B, 6, 224, 224), jnp.int32)
    v = jit_init(pu, {"params": jax.random.PRNGKey(0)}, x[:1])
    tx = optax.adam(3e-4)
    opt = tx.init(v["params"])

    def step(p, bs, opt, x, m):
        def loss_fn(p):
            outs, upd = pu.apply({"params": p, "batch_stats": bs}, x,
                                 train=True, mutable=["batch_stats"])
            return autoregressive_loss(outs, m, "l1"), upd
        (l, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        u, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, u), upd["batch_stats"], opt, l

    return step, (v["params"], v["batch_stats"], opt, x, m)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=0, choices=[0, 1])
    ap.add_argument("--outdir", default="/tmp/prof_s0")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    bench.health_check()

    fn, state = (build_stage0 if args.stage == 0 else build_stage1)()
    step = jax.jit(fn, donate_argnums=(0, 1, 2))
    p, bs, opt, x, m = state
    p, bs, opt, loss = step(p, bs, opt, x, m)
    _ = float(loss)

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        for _ in range(3):
            p, bs, opt, loss = step(p, bs, opt, x, m)
        _ = float(loss)
    print(f"stage {args.stage} loss after trace: {float(loss):.4f}")
    print_top_ops(args.outdir, top=args.top, steps=3)


if __name__ == "__main__":
    main()

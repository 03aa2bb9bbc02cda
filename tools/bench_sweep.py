"""Stage-2 step-time decomposition on the real TPU (MFU analysis).

Variants of the stage-2 MoE train step are timed independently so the gap to
peak can be attributed: augmentation, forward, backward, optimizer, batch
size, and precision. Run ALONE on an idle host (1-CPU box: any concurrent
load starves dispatch and corrupts timings).

Usage: python tools/bench_sweep.py [--batch 64]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import bench
from pmoe_tpu.models import get_model
from pmoe_tpu.ops.augment import augment
from pmoe_tpu.trainer.losses import moe_loss
from pmoe_tpu.utils.nn import jit_init, op_counter


def make_step(model, tx, batch, *, with_aug=True, with_bwd=True,
              with_opt=True):
    B = batch
    def step(params, batch_stats, opt_state, img_u8, spd, cmd, control, rng):
        x = img_u8.astype(jnp.float32) / 255.0
        if with_aug:
            x = augment(rng, x, 1000.0 * B, "super_hard", B)

        def loss_fn(p):
            (dist, speeds), updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x, spd, cmd, True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            return moe_loss(dist, speeds, control, spd, (0.7, 0.3)), updates

        if not with_bwd:
            loss, updates = loss_fn(params)
            return params, updates["batch_stats"], opt_state, loss
        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        if not with_opt:
            # consume grads so they aren't DCE'd
            gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
            return params, updates["batch_stats"], opt_state, loss + 0.0 * gsum
        upd, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, updates["batch_stats"], opt_state, loss
    return step


def time_variant(name, model, B, *, steps=10, **kw):
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((B, 4, 224, 224, 3), jnp.uint8)
    spd = jnp.zeros((B, 1), jnp.float32)
    cmd = jnp.zeros((B, 6), jnp.float32)
    ctl = jnp.zeros((B, 2), jnp.float32)
    v = jit_init(model, {"params": rng}, img[:2].astype(jnp.float32),
                 spd[:2], cmd[:2])
    params, bs = v["params"], v.get("batch_stats", {})
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-4))
    opt = tx.init(params)
    fn = make_step(model, tx, B, **kw)
    try:
        flops = op_counter(fn, params, bs, opt, img, spd, cmd, ctl,
                           rng)["flops"]
    except Exception:
        flops = -1.0
    step = jax.jit(fn, donate_argnums=(0, 1, 2))
    params, bs, opt, loss = step(params, bs, opt, img, spd, cmd, ctl, rng)
    _ = float(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        params, bs, opt, loss = step(params, bs, opt, img, spd, cmd, ctl,
                                     jax.random.fold_in(rng, i))
    _ = float(loss)
    dt = (time.perf_counter() - t0) / steps
    mfu = flops / dt / 197e12 if flops > 0 else -1
    print(f"{name:28s} {dt * 1e3:8.1f} ms/step  {1 / dt:6.3f} steps/s  "
          f"{flops / 1e12:6.2f} TF  MFU={mfu:.3f}", flush=True)
    return dt


def ab_packed_stem(B: int = 64, windows: int = 5, steps: int = 10,
                   var: str = "PMOE_PACKED_STEM",
                   variants=(("unpacked", "0"), ("packed", "1")),
                   base_env: dict | None = None):
    """Paired interleaved A/B of the stage-2 train step toggling one env
    knob (default: canonical vs the W-pair-packed ResNet stem). Both
    variants are compiled up front, then timed in alternating windows so
    relay-load drift hits both equally; the per-window ratio is the
    signal. ``base_env`` pins other knobs for both variants."""
    import os

    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((B, 4, 224, 224, 3), jnp.uint8)
    spd = jnp.zeros((B, 1), jnp.float32)
    cmd = jnp.zeros((B, 6), jnp.float32)
    ctl = jnp.zeros((B, 2), jnp.float32)
    cfg = bench._moe_cfg()
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-4))

    for k, val in (base_env or {}).items():
        os.environ[k] = val
    labels = [l for l, _ in variants]
    state, steps_fn, flops = {}, {}, {}
    for label, flag in variants:
        os.environ[var] = flag
        model = get_model(cfg, dtype=jnp.bfloat16)
        v = jit_init(model, {"params": rng}, img[:2].astype(jnp.float32),
                     spd[:2], cmd[:2])
        params, bs = v["params"], v.get("batch_stats", {})
        opt = tx.init(params)
        fn = make_step(model, tx, B)
        try:
            flops[label] = op_counter(fn, params, bs, opt, img, spd, cmd,
                                      ctl, rng)["flops"]
        except Exception:
            flops[label] = -1.0
        step = jax.jit(fn, donate_argnums=(0, 1, 2))
        params, bs, opt, loss = step(params, bs, opt, img, spd, cmd, ctl, rng)
        _ = float(loss)                          # compile barrier
        state[label] = (params, bs, opt)
        steps_fn[label] = step
    os.environ.pop(var, None)
    for k in (base_env or {}):
        os.environ.pop(k, None)

    times = {l: [] for l in labels}
    for w in range(windows):
        for label in labels:
            params, bs, opt = state[label]
            step = steps_fn[label]
            t0 = time.perf_counter()
            for i in range(steps):
                params, bs, opt, loss = step(
                    params, bs, opt, img, spd, cmd, ctl,
                    jax.random.fold_in(rng, 100 * w + i))
            _ = float(loss)
            times[label].append((time.perf_counter() - t0) / steps)
            state[label] = (params, bs, opt)
    for label in labels:
        best = min(times[label])
        f = flops[label]
        mfu = f / best / 197e12 if f > 0 else -1
        print(f"{label:14s} best {best * 1e3:7.1f} ms/step "
              f"({1 / best:.3f} steps/s)  {f / 1e12:6.2f} TF  MFU={mfu:.3f}  "
              f"windows={[round(t * 1e3, 1) for t in times[label]]}",
              flush=True)
    ratios = [u / p for u, p in zip(times[labels[0]], times[labels[1]])]
    print(f"paired speedup ({labels[0]}/{labels[1]}) per window: "
          f"{[round(r, 3) for r in ratios]}  median={np.median(ratios):.3f}")
    return {label: min(times[label]) for label in labels}


def canonical_stage2_flops(B: int = 64) -> float:
    """Reference-semantics FLOPs of the stage-2 step (packing off), the
    honest MFU numerator used by bench.py."""
    import os

    os.environ["PMOE_PACKED_STEM"] = "0"
    try:
        rng = jax.random.PRNGKey(0)
        img = jnp.zeros((B, 4, 224, 224, 3), jnp.uint8)
        spd = jnp.zeros((B, 1), jnp.float32)
        cmd = jnp.zeros((B, 6), jnp.float32)
        ctl = jnp.zeros((B, 2), jnp.float32)
        model = get_model(bench._moe_cfg(), dtype=jnp.bfloat16)
        v = jit_init(model, {"params": rng}, img[:2].astype(jnp.float32),
                     spd[:2], cmd[:2])
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-4))
        opt = tx.init(v["params"])
        fn = make_step(model, tx, B)
        return op_counter(fn, v["params"], v.get("batch_stats", {}), opt,
                          img, spd, cmd, ctl, rng)["flops"]
    finally:
        os.environ.pop("PMOE_PACKED_STEM", None)


def ab_bn_pool(B: int = 64, windows: int = 5, steps: int = 10):
    """Paired A/B: XLA BN+ReLU epilogues + fused pool vs the BN+ReLU
    epilogues fused INTO the Pallas pool (ops/pool_pallas.py
    fused_packed_pool_bn). Packed stem pinned on for both variants."""
    ab_packed_stem(B, windows, steps, var="PMOE_FUSED_POOL_BN",
                   variants=(("xla-epilogue", "0"), ("fused-bn-pool", "1")),
                   base_env={"PMOE_PACKED_STEM": "1"})


def ab_packed_unet(windows: int = 5, only: str = ""):
    """Paired interleaved A/B of the stage-0 segmentation train step (UNet
    3->23 @ 224, bs 64) and the stage-1 PU-Net rollout step (bs 10) with the
    canonical vs the W-pair-packed UNet level 1 (pmoe_tpu/nn/unet.py). Both
    variants compile up front; alternating windows cancel relay drift."""
    import os

    import optax as _optax

    from pmoe_tpu.models.punet import PredictiveUNet
    from pmoe_tpu.nn.unet import UNet
    from pmoe_tpu.trainer.losses import (autoregressive_loss,
                                         cross_entropy_tversky_weighted_loss)

    def build_stage0(flag):
        os.environ["PMOE_PACKED_STEM"] = flag
        B = 64
        unet = UNet(in_features=3, out_features=23, dtype=jnp.bfloat16)
        x = jnp.zeros((B, 224, 224, 3), jnp.float32)
        m = jnp.zeros((B, 224, 224), jnp.int32)
        v = jit_init(unet, {"params": jax.random.PRNGKey(0)}, x[:2])
        tx = _optax.adam(3e-4)
        opt = tx.init(v["params"])

        def step(p, bs, opt, x, m):
            def loss_fn(p):
                logits, upd = unet.apply(
                    {"params": p, "batch_stats": bs}, x, True,
                    mutable=["batch_stats"])
                return cross_entropy_tversky_weighted_loss(logits, m), upd
            (l, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            u, opt = tx.update(g, opt, p)
            return _optax.apply_updates(p, u), upd["batch_stats"], opt, l

        jstep = jax.jit(step, donate_argnums=(0, 1, 2))
        st = jstep(v["params"], v["batch_stats"], opt, x, m)
        _ = float(st[-1])
        return jstep, st[:3], (x, m)

    def build_stage1(flag):
        os.environ["PMOE_PACKED_STEM"] = flag
        B = 10
        pu = PredictiveUNet(past_frames=4, future_frames=6,
                            dtype=jnp.bfloat16)
        x = jnp.zeros((B, 4, 224, 224, 3), jnp.float32)
        m = jnp.zeros((B, 6, 224, 224), jnp.int32)
        v = jit_init(pu, {"params": jax.random.PRNGKey(0)}, x[:1])
        tx = _optax.adam(3e-4)
        opt = tx.init(v["params"])

        def step(p, bs, opt, x, m):
            def loss_fn(p):
                outs, upd = pu.apply({"params": p, "batch_stats": bs}, x,
                                     train=True, mutable=["batch_stats"])
                return autoregressive_loss(outs, m, "l1"), upd
            (l, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            u, opt = tx.update(g, opt, p)
            return _optax.apply_updates(p, u), upd["batch_stats"], opt, l

        jstep = jax.jit(step, donate_argnums=(0, 1, 2))
        st = jstep(v["params"], v["batch_stats"], opt, x, m)
        _ = float(st[-1])
        return jstep, st[:3], (x, m)

    for stage, build, steps in (("stage0", build_stage0, 5),
                                ("stage1", build_stage1, 3)):
        if only and stage != only:
            continue
        print(f"{stage}: compiling both variants ...", flush=True)
        runs, states, datas = {}, {}, {}
        for label, flag in (("unpacked", "0"), ("packed", "1")):
            runs[label], states[label], datas[label] = build(flag)
        os.environ.pop("PMOE_PACKED_STEM", None)
        times = {"unpacked": [], "packed": []}
        for _w in range(windows):
            for label in ("unpacked", "packed"):
                p, bs, opt = states[label]
                x, m = datas[label]
                t0 = time.perf_counter()
                for _ in range(steps):
                    p, bs, opt, l = runs[label](p, bs, opt, x, m)
                _ = float(l)
                times[label].append((time.perf_counter() - t0) / steps)
                states[label] = (p, bs, opt)
        for label in ("unpacked", "packed"):
            best = min(times[label])
            print(f"{stage} {label:10s} best {best * 1e3:7.1f} ms/step "
                  f"({1 / best:.3f} steps/s)  "
                  f"windows={[round(t * 1e3, 1) for t in times[label]]}",
                  flush=True)
        ratios = [u / p for u, p in zip(times["unpacked"], times["packed"])]
        print(f"{stage} paired speedup (unpacked/packed) per window: "
              f"{[round(r, 3) for r in ratios]}  median={np.median(ratios):.3f}")


def _stage3_agent(env):
    """Build + warm one stage-3 bench agent under ``env`` knobs."""
    import os

    B = bench.BATCH3
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (B + 6, 224, 224, 3), np.uint8)
    for k, v in env.items():
        os.environ[k] = v
    try:
        agent = bench.Agent(
            bench._stage3_cfg(4),
            (jnp.zeros((2, 4, 224, 224, 3), jnp.float32),
             jnp.zeros((2, 1), jnp.float32),
             jnp.zeros((2, 4), jnp.float32)),
            rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        for i in range(B + 1):
            agent.remember(frames[i:i + 4], np.float32([1.0]),
                           np.eye(4, dtype=np.float32)[0],
                           np.float32([0.1, 0.5]), np.float32(1.0),
                           frames[i + 1:i + 5], np.float32([1.1]),
                           np.eye(4, dtype=np.float32)[0],
                           np.float32(0.0))
        m = agent.learn()                           # compile under this env
        assert np.isfinite(float(m["critic_loss"]))
    finally:
        for k in env:
            os.environ.pop(k, None)
    return agent


def ab_stage3(configs=None, windows: int = 4, steps: int = 4):
    """Paired interleaved A/B of the FULL stage-3 DDPG learn step
    (``Agent.learn`` incl. frame-pool staging) across env-knob configs.

    Two full DDPG agents (actor+critic+targets+opt+frame pool) fit in
    v5e HBM; three do not (RESOURCE_EXHAUSTED, logs/roundwork_s3ab).
    So variants are measured PAIRWISE against the defaults baseline —
    baseline stays resident, each variant is built, timed in windows
    interleaved with the baseline, then freed before the next.

    Agent defaults are now UNPACKED (Agent._packing_ctx — the frozen
    forward-only regime, measured 1.21x faster than packed,
    logs/roundwork_s3pair_142204.log), so the interesting variants
    force packing back ON via the explicit-env escape hatch."""
    if configs is None:
        configs = [
            ("stem-packed", {"PMOE_PACKED_STEM": "1"}),
            ("punet-packed", {"PMOE_PACKED_UNET": "1"}),
        ]
    base_agent = _stage3_agent({})
    print("defaults: compiled", flush=True)

    def timed(agent):
        t0 = time.perf_counter()
        for _ in range(steps):
            m = agent.learn()
        _ = float(m["critic_loss"])                 # D2H barrier
        return (time.perf_counter() - t0) / steps

    out = {"defaults": []}
    for label, env in configs:
        var_agent = _stage3_agent(env)
        print(f"{label}: compiled", flush=True)
        tb, tv = [], []
        for _ in range(windows):
            tb.append(timed(base_agent))
            tv.append(timed(var_agent))
        del var_agent
        out["defaults"].extend(tb)
        out[label] = tv
        ratios = [b / v for b, v in zip(tb, tv)]
        print(f"{label:16s} best {min(tv) * 1e3:7.0f} ms/step "
              f"({1 / min(tv):.3f} steps/s)  defaults/variant per window: "
              f"{[round(r, 3) for r in ratios]}  "
              f"median={np.median(ratios):.3f}", flush=True)
    best = min(out["defaults"])
    print(f"{'defaults':16s} best {best * 1e3:7.0f} ms/step "
          f"({1 / best:.3f} steps/s)  "
          f"windows={[round(t * 1e3) for t in out['defaults']]}", flush=True)
    return {l: min(t) for l, t in out.items()}


def ab_infer(windows: int = 4, ticks: int = 50):
    """Paired interleaved A/B of the closed-loop inference step (the
    bench_inference_latency graph: one uint8 frame -> normalize -> window
    roll -> model.sample at batch 1) packed vs unpacked.

    The inference path is forward-only like the stage-3 trunks (where
    packing measured a 1.21x LOSS at batch 64), but at batch 1 the
    lane-utilization win could dominate instead — this measures it.
    p50 per window; the ~34 ms relay RTT hits both variants equally."""
    import os

    steps, states = {}, {}
    for label, flag in (("packed", "1"), ("unpacked", "0")):
        os.environ["PMOE_PACKED_STEM"] = flag
        try:
            model = get_model(bench._moe_cfg(), dtype=jnp.bfloat16)
            rng = jax.random.PRNGKey(0)
            frames = jnp.zeros((1, 4, 224, 224, 3), jnp.float32)
            spd = jnp.zeros((1, 1), jnp.float32)
            cmd = jnp.zeros((1, bench.COMMANDS), jnp.float32)
            variables = jit_init(model, {"params": rng}, frames, spd, cmd)

            @jax.jit
            def agent_step(variables, frames, new_frame_u8, spd, cmd, rng,
                           model=model):
                frame = new_frame_u8.astype(jnp.float32) / 255.0
                frames = jnp.concatenate([frames[:, 1:], frame[None, None]],
                                         axis=1)
                action = model.apply(variables, frames, spd, cmd, False,
                                     method="sample", rngs={"sample": rng})
                return frames, action

            new_frame = jnp.zeros((224, 224, 3), jnp.uint8)
            frames, action = agent_step(variables, frames, new_frame, spd,
                                        cmd, rng)
            _ = np.asarray(action)
        finally:
            os.environ.pop("PMOE_PACKED_STEM", None)
        steps[label] = agent_step
        states[label] = (variables, frames, spd, cmd, new_frame, rng)
        print(f"{label}: compiled", flush=True)

    p50 = {"packed": [], "unpacked": []}
    for w in range(windows):
        for label in p50:
            variables, frames, spd, cmd, new_frame, rng = states[label]
            lat = []
            for i in range(ticks):
                t0 = time.perf_counter()
                frames, action = steps[label](variables, frames, new_frame,
                                              spd, cmd,
                                              jax.random.fold_in(rng, i))
                _ = np.asarray(action)
                lat.append(time.perf_counter() - t0)
            states[label] = (variables, frames, spd, cmd, new_frame, rng)
            p50[label].append(float(np.percentile(np.array(lat) * 1e3, 50)))
    for label, vals in p50.items():
        print(f"{label:9s} p50/window ms: {[round(v, 2) for v in vals]}  "
              f"best={min(vals):.2f}", flush=True)
    ratios = [u / p for p, u in zip(p50["packed"], p50["unpacked"])]
    print(f"paired unpacked/packed per window: "
          f"{[round(r, 3) for r in ratios]}  median={np.median(ratios):.3f} "
          f"(>1 means packed is faster)", flush=True)
    return p50


def diag_closed_loop(repeats: int = 4, ticks: int = 200):
    """Repeat the whole-loop NoCrash bench with per-stage decomposition.

    Prints, per repeat: fps, then the agent's internal stage times
    (preprocess / dispatch / fetch via PMOE_AGENT_TIMERS) and the
    episode-engine surroundings (sensor get_data, backend tick, criteria)
    timed in a manual loop mirroring eval/manager.run_episode. Separates
    "the relay was having a moment" (variance across repeats) from "a tick
    stage regressed" (stable decomposition)."""
    import os

    from pmoe_tpu.agents.image_agent import ImageAgent
    from pmoe_tpu.eval.criteria import CriteriaTree, RouteCompletionTest
    from pmoe_tpu.sim.fake_carla import FakeCarlaBackend
    from pmoe_tpu.sim.sensor_interface import SensorHub
    from pmoe_tpu.utils.config import Config

    os.environ["PMOE_AGENT_TIMERS"] = "1"
    cfg = Config({
        "sensors": {"img_width": 800, "img_height": 600},
        "logger": {"disabled": True},
        "model": {"actor": dict(bench._moe_cfg(), n_commands=bench.COMMANDS,
                                model_dir="")},
    })
    fps_all = []
    try:
        for r in range(repeats):
            backend = FakeCarlaBackend(town="Town01")
            route = backend.trace_route(0, 3)
            frame = backend.reset(route)
            agent = ImageAgent(cfg)
            agent.set_global_plan(route.gps_plan())
            criteria = CriteriaTree([RouteCompletionTest(route)])
            hub = SensorHub.for_agent(agent, backend, route=route, frame=frame)
            t_hub = t_tick = t_crit = 0.0
            hub.on_frame(frame)
            t0 = time.perf_counter()
            n = 0
            while n < ticks:
                ta = time.perf_counter()
                input_data = hub.get_data()
                tb = time.perf_counter()
                control = agent.run_step(input_data, frame.timestamp)
                tc = time.perf_counter()
                frame = backend.tick(control)
                hub.on_frame(frame)
                ego = backend.ego_state()
                td = time.perf_counter()
                criteria.update(ego, frame)
                te = time.perf_counter()
                t_hub += tb - ta
                t_tick += td - tc
                t_crit += te - td
                n += 1
                if criteria.should_terminate:
                    break
            dt = time.perf_counter() - t0
            fps = n / dt
            fps_all.append(fps)
            tm = agent._timers
            print(f"repeat {r}: {fps:6.1f} fps over {n} ticks  "
                  f"per-tick ms: pre={1e3 * tm['pre'] / n:.2f} "
                  f"dispatch={1e3 * tm['dispatch'] / n:.2f} "
                  f"fetch={1e3 * tm['fetch'] / n:.2f} "
                  f"hub={1e3 * t_hub / n:.2f} "
                  f"sim={1e3 * t_tick / n:.2f} "
                  f"crit={1e3 * t_crit / n:.2f} "
                  f"total={1e3 * dt / n:.2f}", flush=True)
            agent.destroy()
            hub.stop()
    finally:
        os.environ.pop("PMOE_AGENT_TIMERS", None)
    print(f"closed-loop fps over {repeats} repeats: "
          f"{[round(f, 1) for f in fps_all]}  best={max(fps_all):.1f} "
          f"median={float(np.median(fps_all)):.1f}", flush=True)
    return fps_all


def stage3_decomposition():
    """Component timings of the stage-3 DDPG learn step (the round-4
    analysis that exposed the replay-upload gap): trunk_pair at 2B, critic
    fwd and TD fit, the soft-update tree op, and the FULL learn step through
    ``agent.learn()`` (frame pool + donation engaged). Compare the sum of
    parts against FULL — an unexplained gap is host<->device traffic or
    dispatch, not compute."""
    rtt = bench.measure_roundtrip_ms()
    print(f"device rtt p50: {rtt:.1f} ms")
    B = bench.BATCH3
    agent = bench.Agent(
        bench._stage3_cfg(4),
        (jnp.zeros((2, 4, 224, 224, 3), jnp.float32),
         jnp.zeros((2, 1), jnp.float32), jnp.zeros((2, 4), jnp.float32)),
        rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (B + 6, 224, 224, 3), np.uint8)
    for i in range(B + 1):
        agent.remember(frames[i:i + 4], np.float32([1.0]),
                       np.eye(4, dtype=np.float32)[0],
                       np.float32([0.1, 0.5]), np.float32(1.0),
                       frames[i + 1:i + 5], np.float32([1.1]),
                       np.eye(4, dtype=np.float32)[0], np.float32(0.0))
    batch = agent._stage_batch()
    st = agent.state

    def timeit(f, *a, n=3):
        _ = f(*a)
        fetch = lambda r: float(jnp.asarray(
            jax.tree_util.tree_leaves(r)[0]).ravel()[0].astype(jnp.float32))
        fetch(f(*a))
        ts = []
        for _i in range(n):
            t0 = time.perf_counter()
            fetch(f(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1e3

    pool = agent._pool
    F = agent._pool_F
    sl = (np.asarray(batch["frame_start"])[:, None] + np.arange(5)[None]) % F
    window = jnp.asarray(np.asarray(pool)[sl]).astype(jnp.float32) / 255.0
    spd2 = jnp.concatenate([batch["speed"], batch["new_speed"]], 0)
    cmd2 = jnp.concatenate([batch["command"], batch["new_command"]], 0)

    trunk = jax.jit(lambda ap, bs, w, s, c, k: agent.actor_model.apply(
        {"params": ap, "batch_stats": bs}, w, s, c, False,
        method="trunk_pair", rngs={"sample": k}))
    print(f"trunk_pair(2B)     {timeit(trunk, st.actor_params, st.actor_batch_stats, window, spd2, cmd2, jax.random.PRNGKey(1)):7.0f} ms")

    imgs = window[:, :4]
    cfwd = jax.jit(lambda cp, bs, i, s, c, a: agent.critic_model.apply(
        {"params": cp, "batch_stats": bs}, i, s, c, a, False))
    print(f"critic fwd         {timeit(cfwd, st.critic_params, st.critic_batch_stats, imgs, batch['speed'], batch['command'], batch['action']):7.0f} ms")

    soft = jax.jit(lambda t, s: jax.tree_util.tree_map(
        lambda a, b: a + 0.001 * (b - a), t, s))
    print(f"soft-update tree   {timeit(soft, st.target_actor_params, st.actor_params):7.0f} ms")

    agent.learn()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        agent.learn()
        ts.append(time.perf_counter() - t0)
    print(f"FULL learn step    {min(ts) * 1e3:7.0f} ms "
          f"({1.0 / min(ts):.3f} steps/s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--stage3", action="store_true",
                    help="decompose the stage-3 DDPG learn step instead")
    ap.add_argument("--ab-stem", action="store_true",
                    help="paired A/B: canonical vs W-pair-packed stem")
    ap.add_argument("--ab-unet", action="store_true",
                    help="paired A/B: canonical vs W-pair-packed UNet level 1")
    ap.add_argument("--ab-bn-pool", action="store_true",
                    help="paired A/B: XLA epilogues vs BN+ReLU fused into "
                         "the Pallas pool")
    ap.add_argument("--only", default="",
                    help="restrict --ab-unet to one stage (stage0|stage1)")
    args = ap.parse_args()
    bench.health_check()
    if args.stage3:
        stage3_decomposition()
        return
    if args.ab_stem:
        ab_packed_stem(args.batch)
        return
    if args.ab_unet:
        ab_packed_unet(only=args.only)
        return
    if args.ab_bn_pool:
        ab_bn_pool(args.batch)
        return
    B = args.batch
    cfg = bench._moe_cfg()
    model = get_model(cfg, dtype=jnp.bfloat16)

    time_variant("full (aug+fwd+bwd+opt)", model, B)
    time_variant("no augmentation", model, B, with_aug=False)
    time_variant("fwd only", model, B, with_bwd=False)
    time_variant("fwd+bwd (no optimizer)", model, B, with_opt=False)
    time_variant("full @ batch 128", model, 128)
    model32 = get_model(cfg, dtype=jnp.float32)
    time_variant("full fp32 compute", model32, B)


if __name__ == "__main__":
    main()

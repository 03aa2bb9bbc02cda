"""Capture a device trace of the stage-2 train step and print the top HLO
ops by self time (where does the 225 ms go?).

Usage: python tools/profile_stage2.py [--batch 64] [--outdir /tmp/prof]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

import bench
from pmoe_tpu.models import get_model
from pmoe_tpu.utils.nn import jit_init
from tools.bench_sweep import make_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--outdir", default="/tmp/prof_stage2")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    B = args.batch
    bench.health_check()

    model = get_model(bench._moe_cfg(), dtype=jnp.bfloat16)
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
    step = jax.jit(make_step(model, tx, B), donate_argnums=(0, 1, 2))
    params, bs, opt, loss = step(params, bs, opt, img, spd, cmd, ctl, rng)
    _ = float(loss)

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        for i in range(3):
            params, bs, opt, loss = step(params, bs, opt, img, spd, cmd, ctl,
                                         jax.random.fold_in(rng, i))
        _ = float(loss)

    xplanes = glob.glob(os.path.join(args.outdir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print("NO xplane captured — device-side tracing unsupported here?")
        return
    xplane = max(xplanes, key=os.path.getmtime)
    print("xplane:", xplane)
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([xplane], "hlo_stats", {})
    import gzip
    import json
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    tbl = json.loads(data)
    # hlo_stats GViz JSON: {cols: [...], rows: [{c: [{v: ...}, ...]}]}
    cols = [c["label"] for c in tbl["cols"]]
    rows = [[cell.get("v") if cell else None for cell in r["c"]]
            for r in tbl["rows"]]

    def col(name):
        for i, c in enumerate(cols):
            if name.lower() in c.lower():
                return i
        raise KeyError(f"{name} not in {cols}")

    i_cat = col("HLO op category")
    i_name = col("HLO op name")
    i_text = col("HLO op text")
    i_self = col("Total self time (us)")
    i_bound = col("Bound by")
    agg = {}
    for r in rows:
        cat = r[i_cat] or "?"
        agg[cat] = agg.get(cat, 0.0) + float(r[i_self] or 0)
    total = sum(agg.values())
    print(f"\n== by category (total device self time {total/1e3:.1f} ms "
          f"over 3 steps) ==")
    for k, v_ in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {k:40s} {v_/1e3:9.2f} ms  {100*v_/total:5.1f}%")
    print(f"\n== top {args.top} ops by self time ==")
    rows.sort(key=lambda r: -float(r[i_self] or 0))
    for r in rows[:args.top]:
        print(f"  {float(r[i_self] or 0)/1e3:8.2f} ms {str(r[i_bound]):<10s}"
              f" {str(r[i_cat]):<20s} {(r[i_name] or '')[:36]:<38s}"
              f" {(r[i_text] or '')[:70]}")


if __name__ == "__main__":
    main()

"""Capture a device trace of the stage-3 DDPG learn step and print the top
HLO ops by self time (where does the ~890 ms go?).

Usage: python tools/profile_stage3.py [--batch 64] [--outdir /tmp/prof_s3]
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
import numpy as np

import bench
from pmoe_tpu.models.rl_agent import Agent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--outdir", default="/tmp/prof_stage3")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    B = args.batch
    bench.health_check()

    n_commands = 4
    obs = (jnp.zeros((2, 4, 224, 224, 3), jnp.float32),
           jnp.zeros((2, 1), jnp.float32),
           jnp.zeros((2, n_commands), jnp.float32))
    cfg3 = dict(bench._stage3_cfg(n_commands), batch_size=B,
                buffer_size=B + 8)
    agent = Agent(cfg3, obs, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (B + 6, 224, 224, 3), np.uint8)
    for i in range(B + 1):
        agent.remember(frames[i:i + 4], np.float32([1.0]),
                       np.eye(n_commands, dtype=np.float32)[0],
                       np.float32([0.1, 0.5]), np.float32(1.0),
                       frames[i + 1:i + 5], np.float32([1.1]),
                       np.eye(n_commands, dtype=np.float32)[0],
                       np.float32(0.0))

    m = agent.learn()                          # compile + first step
    assert m and np.isfinite(m["critic_loss"])
    m = agent.learn()

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        for _ in range(3):
            m = agent.learn()
        _ = float(m["critic_loss"])

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

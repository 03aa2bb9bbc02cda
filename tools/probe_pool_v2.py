"""Probe: can the fused stem pool take the conv's NATIVE layout?

Today (ops/pool_pallas.py), vmap-of-pallas_call constrains every operand to
row-major [E, B, H, W2, C] while XLA's vmapped stem convs produce physical
[H][W2][E][B][C] — the mismatch costs ~9 ms/step of relayout copies in the
stage-2 profile (copy_bitcast_fusion + the g/idx copies feeding the pool
backward; see PERF.md round-6 profile).

Hypothesis: a kernel whose LOGICAL shape is [H, W2, E*B, C] (leading-dim
H/W, tiled dims (EB, C)) + a logical transpose in a custom_vmap batching
rule makes the pallas operand layout EQUAL the conv's physical layout, so
the transpose is a bitcast and the copies vanish.

Measures, on the real chip:
  1. Mosaic accepts the blocks (compile succeeds),
  2. exactness vs the XLA reference pool,
  3. the compiled HLO's full-resolution copy count (A vs B),
  4. paired interleaved timing of conv+pool fwd (A vs B).

Usage: python -u tools/probe_pool_v2.py [--iters 30]
"""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import custom_batching, lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench
from pmoe_tpu.ops.pool_pallas import _lead_bdim, fused_packed_pool

NEG = float("-inf")
E, B, H, W2, C2 = 3, 64, 224, 112, 128
C = C2 // 2
TH = 4      # H-rows of pooled output per grid cell
EBT = 8     # EB rows per block (sublane tile)


def _v2_fwd_kernel(cur_ref, halo_ref, out_ref, idx_ref, *, th, w2, c):
    t = pl.program_id(1)
    cur = cur_ref[...].astype(jnp.float32)            # [2th, W2, EBt, 2c]
    halo = halo_ref[...].astype(jnp.float32)          # [1,  W2, EBt, 2c]
    halo = jnp.where(t > 0, halo, jnp.full_like(halo, NEG))
    x = jnp.concatenate([halo, cur], axis=0)          # [2th+1, W2, EBt, 2c]
    r0 = x[..., :c]
    r1 = x[..., c:]
    l1 = jnp.concatenate([jnp.full_like(r1[:, :1], NEG), r1[:, :-1]], axis=1)
    wmax = jnp.maximum(jnp.maximum(l1, r0), r1)
    widx = jnp.where(l1 == wmax, 0, jnp.where(r0 == wmax, 1, 2))

    def eo(v):
        v0 = v[:2 * th].reshape(th, 2, *v.shape[1:])
        a = v0[:, 0]
        b = v0[:, 1]
        cc = jnp.concatenate([a[1:], v[2 * th:2 * th + 1]], axis=0)
        return a, b, cc

    a, b2, c3 = eo(wmax)
    out = jnp.maximum(jnp.maximum(a, b2), c3)
    ia, ib, ic = eo(widx)
    code = jnp.where(a == out, ia, jnp.where(b2 == out, ib + 3, ic + 6))
    out_ref[...] = out.astype(out_ref.dtype)
    idx_ref[...] = code.astype(jnp.int8)


def _v2_pool_hwbc(yt: jnp.ndarray):
    """yt: [H, W2, EB, 2C] -> (out [h2, W2, EB, C], idx int8 same)."""
    Hh, w2, eb, c2 = yt.shape
    c = c2 // 2
    h2 = Hh // 2
    th = TH
    grid = (eb // EBT, h2 // th)

    def cur_map(b, t):
        return (t, 0, b, 0)

    def halo_map(b, t):
        return (jnp.maximum(2 * th * t - 1, 0), 0, b, 0)

    return pl.pallas_call(
        functools.partial(_v2_fwd_kernel, th=th, w2=w2, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * th, w2, EBT, c2), cur_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w2, EBT, c2), halo_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((th, w2, EBT, c), cur_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((th, w2, EBT, c), cur_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h2, w2, eb, c), yt.dtype),
            jax.ShapeDtypeStruct((h2, w2, eb, c), jnp.int8),
        ],
    )(yt, yt)


@custom_batching.custom_vmap
def v2_pool(y: jnp.ndarray) -> jnp.ndarray:
    """Unbatched fallback: [B, H, W2, 2C] -> packed [B, h2, W2/2, 2C]."""
    return fused_packed_pool(y)


@v2_pool.def_vmap
def _v2_pool_vmap(axis_size, in_batched, y):
    (y_b,) = in_batched
    assert y_b
    y = jnp.moveaxis(y, 0, 0)  # bdim already 0 by custom_vmap contract
    e, b, h, w2, c2 = y.shape
    yt = jnp.transpose(y, (2, 3, 0, 1, 4)).reshape(h, w2, e * b, c2)
    out, _ = _v2_pool_hwbc(yt)
    h2, _, _, c = out.shape
    out = jnp.transpose(out.reshape(h2, w2, e, b, c), (2, 3, 0, 1, 4))
    return out.reshape(e, b, h2, w2 // 2, 2 * c), True


def make_fns():
    k0 = jax.random.PRNGKey(0)
    t0 = jax.random.normal(k0, (E, B, H, W2, C2), jnp.bfloat16)
    ker = jax.random.normal(jax.random.PRNGKey(1),
                            (E, 3, 3, C2, C2), jnp.bfloat16) * 0.05

    def tail(pool):
        def f(t0e, ke):
            y = lax.conv_general_dilated(
                t0e, ke, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return pool(y)
        return jax.jit(lambda ts, ks: jax.vmap(f)(ts, ks))

    # production applies _lead_bdim so vmap parks the batch dim at front
    # (see fused_packed_pool_bn); mirror that for a fair A
    return (tail(lambda y: fused_packed_pool(_lead_bdim(y))),
            tail(v2_pool), t0, ker)


def count_copies(fn, *args):
    txt = jax.jit(fn).lower(*args).compile().as_text()
    big = [ln for ln in txt.splitlines()
           if (" copy(" in ln or "copy_bitcast" in ln or "transpose(" in ln)
           and ("224,112" in ln or "112,112" in ln or "112,56" in ln)]
    return big


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--mode", default="all", choices=["all", "copies", "time"])
    args = ap.parse_args()
    bench.health_check()

    fa, fb, t0, ker = make_fns()

    if args.mode in ("all", "copies"):
        # exactness via a reduced fingerprint (full fetches would drag 0.3 GB
        # through the 0.07 GB/s tunnel)
        fp = jax.jit(lambda o: (jnp.sum(o.astype(jnp.float32)),
                                jnp.sum(jnp.abs(o.astype(jnp.float32)))))
        oa = jax.device_get(fp(fa(t0, ker)))
        ob = jax.device_get(fp(fb(t0, ker)))
        print(f"fingerprints A={oa} B={ob} equal={oa == ob}")

        for name, f in (("A(prod)", fa), ("B(v2)  ", fb)):
            big = count_copies(lambda ts, ks: f(ts, ks), t0, ker)
            print(f"{name}: {len(big)} full-res copy/transpose ops "
                  f"in compiled HLO")
            for ln in big[:6]:
                print("   ", ln.strip()[:140])

    if args.mode in ("all", "time"):
        import time
        barrier = jax.jit(lambda o: jnp.sum(o[0, 0, 0].astype(jnp.float32)))
        for _w in range(args.windows):
            for name, f in (("A(prod)", fa), ("B(v2)  ", fb)):
                _ = float(barrier(f(t0, ker)))     # warm + sync
                t0_ = time.perf_counter()
                for _ in range(args.iters):
                    out = f(t0, ker)
                _ = float(barrier(out))            # one scalar D2H barrier
                dt = (time.perf_counter() - t0_) / args.iters * 1e3
                print(f"{name}: {dt:7.2f} ms / fwd iter", flush=True)


if __name__ == "__main__":
    main()

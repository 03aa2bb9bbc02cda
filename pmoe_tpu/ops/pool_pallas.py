"""Fused 3x3/stride-2 max-pool on W-pair-packed tensors (Pallas, TPU).

The ResNet stem's max-pool (reference backbone surgery keeps torchvision's
pool, PMoE/model/blocks/backbone.py:63-69) is the stage-2 step's single
most expensive region when expressed in XLA on the packed layout
(pmoe_tpu/nn/resnet.py): the W-direction max chain, its tie-splitting
backward (compare/divide/select full passes) and the H-direction
reduce_window + select-and-scatter totalled ~50 ms/step at batch 64 on
v5e, against a ~4 ms speed-of-light. This kernel does the whole pool in
one pass per direction:

- forward: reads the packed stem activation [B, H, W2, 2C] once, computes
  the W-candidate max (left-parity-1 / parity-0 / parity-1), the
  H-window-3/stride-2 max, and writes the pooled output REPACKED for the
  packed layer1 [B, H/2, W2/2, 2C] plus a one-byte argmax code per output
  element (h-slot * 3 + w-slot, first-match priority).
- backward: reads grad + argmax once and scatters to the input block
  entirely in VMEM (each output element routes its gradient to exactly one
  input element — PyTorch-style first-match, a valid subgradient; XLA's
  even tie-split differs only on exact ties).

Gated to TPU + production-divisible shapes; anything else falls back to
the XLA decomposition in resnet.py. PMOE_FUSED_POOL=0 disables.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float("-inf")

#: EB rows per v2 block (the sublane tile). Must divide the per-expert batch
#: so no block straddles two experts' BN affines.
_V2_EBT = 8


def _interpret() -> bool:
    # off-TPU the kernel runs interpreted (tests); production gating
    # (pallas_pool_supported) only routes here on TPU anyway
    return jax.default_backend() != "tpu"


def _pick_th(h2: int) -> int:
    for th in (16, 8, 4, 2, 1):
        if h2 % th == 0:
            return th
    return 1


def _pool_shape_ok(shape) -> bool:
    if len(shape) != 4:
        return False
    _, H, W2, C2 = shape
    return (C2 == 128 and H % 2 == 0 and W2 % 16 == 0 and W2 >= 16
            and (H // 2) % 2 == 0)


def pallas_pool_supported(shape) -> bool:
    """(B, H, W2, 2C) poolable by the fused kernel?"""
    if os.environ.get("PMOE_FUSED_POOL", "1") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    return _pool_shape_ok(shape)


def pallas_pool_bn_supported(shape) -> bool:
    """Gate for the BN+ReLU-epilogue variant (``fused_packed_pool_bn``).
    "force" enables it off-TPU (interpret mode) for tests."""
    flag = os.environ.get("PMOE_FUSED_POOL_BN", "1")
    if flag == "force":
        return _pool_shape_ok(shape)
    return flag == "1" and pallas_pool_supported(shape)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _pool_core(x, *, th: int, w2: int, c: int):
    """Shared W-then-H max + argmax-code on the assembled [2*th+1, W2, 2C]
    f32 block (row 0 = top halo)."""
    r0 = x[:, :, :c]                                     # parity 0
    r1 = x[:, :, c:]                                     # parity 1
    # left parity 1: shift right by one W2 column, -inf in column 0.
    # pltpu.roll + iota mask — a slice+concat on the sublane dim trips
    # Mosaic ("offset mismatch on non-concat dimension").
    col = jax.lax.broadcasted_iota(jnp.int32, r1.shape, 1)
    l1 = jnp.where(col == 0, jnp.asarray(NEG, x.dtype),
                   pltpu.roll(r1, shift=1, axis=1))

    # W-direction: first-match priority l1 < r0 < r1
    wmax = jnp.maximum(jnp.maximum(l1, r0), r1)          # [2*th+1, W2, C]
    # NB: slot/code arithmetic stays int32 — Mosaic has no vector<i8> ALU;
    # int8 is storage-only (cast at the final store)
    widx = jnp.where(l1 == wmax, 0, jnp.where(r0 == wmax, 1, 2))

    # H-direction: out row o reads wmax rows 2o, 2o+1, 2o+2 (top halo at -1).
    # Strided row selection via leading-dim reshape (Mosaic lowers strided
    # slices as unsupported >2D gathers): even rows = [:, 0], odd = [:, 1],
    # and rows 2,4,...,2th = even rows shifted one block + the last row.
    def _eo(v):
        v0 = v[0:2 * th].reshape(th, 2, w2, v.shape[-1])
        a = v0[:, 0]
        b = v0[:, 1]
        cc = jnp.concatenate([a[1:], v[2 * th:2 * th + 1]], axis=0)
        return a, b, cc

    a, b2, c3 = _eo(wmax)                                # each [th, W2, C]
    out = jnp.maximum(jnp.maximum(a, b2), c3)
    ia, ib, ic = _eo(widx)
    code = jnp.where(a == out, ia,
                     jnp.where(b2 == out, ib + 3, ic + 6))
    return out, code


def _fwd_kernel(cur_ref, halo_ref, out_ref, idx_ref, *, th: int, w2: int,
                c: int):
    t = pl.program_id(1)
    # f32 in-register: Mosaic's sublane rotate needs 32-bit data, and
    # bf16 -> f32 is exact so comparisons match the XLA bf16 path
    cur = cur_ref[0].astype(jnp.float32)                 # [2*th, W2, 2C]
    halo = halo_ref[0].astype(jnp.float32)               # [1, W2, 2C]
    halo = jnp.where(t > 0, halo, jnp.full_like(halo, NEG))
    x = jnp.concatenate([halo, cur], axis=0)             # [2*th+1, W2, 2C]

    out, code = _pool_core(x, th=th, w2=w2, c=c)

    # Output stays UNPACKED [th, W2, C]: the repack reshape moves sublane
    # pairs into lanes, which Mosaic cannot shape-cast in-register
    # ("unsupported shape cast"); the caller repacks with a cheap XLA
    # reshape instead.
    out_ref[0] = out.astype(out_ref.dtype)
    idx_ref[0] = code.astype(jnp.int8)


def _bn2_relu(x, aff, store_dtype):
    """The two deferred stem epilogues on raw conv output (f32 in-register):
    t1 = relu(cast((x - m0)*s0 + b0)), t2 = relu(cast((t1 - m1)*s1 + b1)),
    with ``cast`` rounding through the production activation dtype exactly
    as the canonical PackedBN -> nn.relu chain does (no-op for f32)."""
    u0 = (x - aff[0, 0]) * aff[0, 1] + aff[0, 2]
    t1 = jnp.maximum(u0.astype(store_dtype).astype(jnp.float32), 0.0)
    u1 = (t1 - aff[1, 0]) * aff[1, 1] + aff[1, 2]
    t2 = jnp.maximum(u1.astype(store_dtype).astype(jnp.float32), 0.0)
    return t1, t2


def _fwd_bn_kernel(cur_ref, halo_ref, aff_ref, out_ref, idx_ref, *, th: int,
                   w2: int, c: int):
    t = pl.program_id(1)
    cur = cur_ref[0].astype(jnp.float32)                 # raw conv rows
    halo = halo_ref[0].astype(jnp.float32)
    x = jnp.concatenate([halo, cur], axis=0)             # [2*th+1, W2, 2C]
    aff = aff_ref[...].astype(jnp.float32)               # [2, 3, 2C]
    _, x = _bn2_relu(x, aff, cur_ref.dtype)
    # mask the top halo AFTER the epilogue (the affine of a -inf sentinel
    # would produce +/-inf depending on the sign of the BN scale)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    x = jnp.where((row == 0) & (t == 0), jnp.asarray(NEG, x.dtype), x)

    out, code = _pool_core(x, th=th, w2=w2, c=c)
    out_ref[0] = out.astype(out_ref.dtype)
    idx_ref[0] = code.astype(jnp.int8)


def _pool_fwd_impl(xp: jnp.ndarray):
    B, H, W2, C2 = xp.shape
    c = C2 // 2
    h2 = H // 2
    th = _pick_th(h2)
    grid = (B, h2 // th)

    def cur_map(b, t):
        return (b, t, 0, 0)

    def halo_map(b, t):
        # single input row 2*th*t - 1 (block shape 1 -> block index == row);
        # clamped at 0, masked inside the kernel for t == 0
        return (b, jnp.maximum(2 * th * t - 1, 0), 0, 0)

    out, idx = pl.pallas_call(
        functools.partial(_fwd_kernel, th=th, w2=W2, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * th, W2, C2), cur_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W2, C2), halo_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, W2, c), cur_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, W2, c), cur_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, h2, W2, c), xp.dtype),
            jax.ShapeDtypeStruct((B, h2, W2, c), jnp.int8),
        ],
        interpret=_interpret(),
    )(xp, xp)
    # repack for the packed layer1 (free reshape: W, C adjacent)
    return out.reshape(B, h2, W2 // 2, C2), idx


def _pool_bn_fwd_impl(y: jnp.ndarray, aff: jnp.ndarray):
    """BN+ReLU epilogue (x2) + pool: y is the RAW stem conv output
    [B, H, W2, 2C]; aff is [2, 3, 2C] f32 = per-layer (mean, scale/std,
    bias) duplicated over the packed halves."""
    B, H, W2, C2 = y.shape
    c = C2 // 2
    h2 = H // 2
    th = _pick_th(h2)
    grid = (B, h2 // th)

    def cur_map(b, t):
        return (b, t, 0, 0)

    def halo_map(b, t):
        return (b, jnp.maximum(2 * th * t - 1, 0), 0, 0)

    def aff_map(b, t):
        return (0, 0, 0)

    out, idx = pl.pallas_call(
        functools.partial(_fwd_bn_kernel, th=th, w2=W2, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * th, W2, C2), cur_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W2, C2), halo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3, C2), aff_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, W2, c), cur_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, W2, c), cur_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, h2, W2, c), y.dtype),
            jax.ShapeDtypeStruct((B, h2, W2, c), jnp.int8),
        ],
        interpret=_interpret(),
    )(y, y, aff.astype(jnp.float32))
    return out.reshape(B, h2, W2 // 2, C2), idx


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _scatter_core(g_ref, i_ref, gn_ref, in_ref, *, th: int, w2: int, c: int):
    """Shared pool-gradient scatter: route each output element's gradient to
    its argmax input position; returns the full-res [2*th, W2, 2C] f32 block
    of gradients w.r.t. the POOL INPUT rows of this grid cell."""
    t = pl.program_id(1)
    last = pl.num_programs(1) - 1
    gp = g_ref[0].astype(jnp.float32)                    # [th, W2, C]
    ip = i_ref[0].astype(jnp.int32)                      # i8 is storage-only
    gn = gn_ref[0].astype(jnp.float32)                   # [1, W2, C]
    inx = in_ref[0].astype(jnp.int32)
    zero = jnp.zeros_like(gn)
    gn = jnp.where(t < last, gn, zero)
    # idx code 9 is never produced -> masked next-row contributes nothing
    inx = jnp.where(t < last, inx, jnp.full_like(inx, 9))

    g = jnp.concatenate([gp, gn], axis=0)                # [th+1, W2, C]
    code = jnp.concatenate([ip, inx], axis=0)
    hs = code // 3                                       # h slot 0/1/2
    ws = code - 3 * hs                                   # w slot 0/1/2

    def wdistribute(rows_g, rows_hs, rows_ws, want_h):
        """Gradient to (parity0, parity1) input cols from out rows whose
        h-slot == want_h."""
        sel = rows_hs == want_h
        g0 = jnp.where(sel & (rows_ws == 1), rows_g, 0.0)
        g1 = jnp.where(sel & (rows_ws == 2), rows_g, 0.0)
        gl = jnp.where(sel & (rows_ws == 0), rows_g, 0.0)
        # left-slot of out col w'' lands on parity-1 col w''-1: shift left
        # by one W2 column (roll + mask, see forward)
        col = jax.lax.broadcasted_iota(jnp.int32, gl.shape, 1)
        # circular shift by (w2-1) == left shift by 1 (roll needs shift >= 0)
        gshift = jnp.where(col == gl.shape[1] - 1, jnp.asarray(0.0, gl.dtype),
                           pltpu.roll(gl, shift=gl.shape[1] - 1, axis=1))
        return g0, g1 + gshift

    # input rows of this block: r = 0..2*th-1 (global 2*th*t + r)
    # even r = 2k: touched by out row o'=k with h-slot 1
    e0, e1 = wdistribute(g[:th], hs[:th], ws[:th], 1)
    # odd r = 2k+1: out row o'=k with h-slot 2, and out row o'=k+1 with
    # h-slot 0 (o'=th comes from the next block's first row)
    o0a, o1a = wdistribute(g[:th], hs[:th], ws[:th], 2)
    o0b, o1b = wdistribute(g[1:], hs[1:], ws[1:], 0)
    o0, o1 = o0a + o0b, o1a + o1b

    even = jnp.concatenate([e0, e1], axis=-1)            # [th, W2, 2C]
    odd = jnp.concatenate([o0, o1], axis=-1)
    inter = jnp.stack([even, odd], axis=1)               # [th, 2, W2, 2C]
    return inter.reshape(2 * th, w2, 2 * c)


def _bwd_kernel(g_ref, i_ref, gn_ref, in_ref, din_ref, *, th: int, w2: int,
                c: int):
    din_ref[0] = _scatter_core(g_ref, i_ref, gn_ref, in_ref, th=th, w2=w2,
                               c=c).astype(din_ref.dtype)


def _bwd_bn_kernel(g_ref, i_ref, gn_ref, in_ref, y_ref, aff_ref, din_ref,
                   part_ref, *, th: int, w2: int, c: int):
    """Scatter + the two deferred epilogues' backward: recompute the ReLU
    masks and BN-input offsets from the saved raw conv rows, emit the
    gradient w.r.t. the conv output plus per-channel partial sums for the
    affine gradients (summed and unfolded outside)."""
    gt2 = _scatter_core(g_ref, i_ref, gn_ref, in_ref, th=th, w2=w2, c=c)
    y = y_ref[0].astype(jnp.float32)                     # [2*th, W2, 2C]
    aff = aff_ref[...].astype(jnp.float32)               # [2, 3, 2C]
    t1, t2 = _bn2_relu(y, aff, y_ref.dtype)
    # relu subgradient: 0 at exact zeros (same first-match philosophy as the
    # pool's argmax; XLA's even tie-split differs only on exact ties)
    gu1 = jnp.where(t2 > 0, gt2, 0.0)
    r1 = jnp.sum(gu1 * (t1 - aff[1, 0]), axis=(0, 1))    # d scale1 (folded)
    r2 = jnp.sum(gu1, axis=(0, 1))                       # d bias1
    gu0 = jnp.where(t1 > 0, gu1 * aff[1, 1], 0.0)
    r3 = jnp.sum(gu0 * (y - aff[0, 0]), axis=(0, 1))     # d scale0
    r4 = jnp.sum(gu0, axis=(0, 1))                       # d bias0
    din_ref[0] = (gu0 * aff[0, 1]).astype(din_ref.dtype)
    part_ref[0, 0] = jnp.stack([r1, r2, r3, r4])


def _pool_bwd_impl(xshape, g, idx):
    B, H, W2, C2 = xshape
    c = C2 // 2
    h2 = H // 2
    th = _pick_th(h2)
    grid = (B, h2 // th)

    def cur_map(b, t):
        return (b, t, 0, 0)

    def next_map(b, t):
        return (b, jnp.minimum(th * t + th, h2 - 1), 0, 0)

    def din_map(b, t):
        return (b, t, 0, 0)

    # g arrives packed [B, h2, W2/2, 2C] — unpack to the kernel's
    # per-column form [B, h2, W2, C] (free reshape)
    gu = g.reshape(B, h2, W2, c)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, th=th, w2=W2, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, W2, c), cur_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, W2, c), cur_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W2, c), next_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W2, c), next_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * th, W2, C2), din_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W2, C2), g.dtype),
        interpret=_interpret(),
    )(gu, idx, gu, idx)


def _pool_bn_bwd_impl(y, aff, g, idx):
    B, H, W2, C2 = y.shape
    c = C2 // 2
    h2 = H // 2
    th = _pick_th(h2)
    nt = h2 // th
    grid = (B, nt)

    def cur_map(b, t):
        return (b, t, 0, 0)

    def next_map(b, t):
        return (b, jnp.minimum(th * t + th, h2 - 1), 0, 0)

    def din_map(b, t):
        return (b, t, 0, 0)

    def aff_map(b, t):
        return (0, 0, 0)

    def part_map(b, t):
        return (b, t, 0, 0)

    gu = g.reshape(B, h2, W2, c)
    din, parts = pl.pallas_call(
        functools.partial(_bwd_bn_kernel, th=th, w2=W2, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, W2, c), cur_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, W2, c), cur_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W2, c), next_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W2, c), next_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * th, W2, C2), din_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3, C2), aff_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2 * th, W2, C2), din_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4, C2), part_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W2, C2), y.dtype),
            jax.ShapeDtypeStruct((B, nt, 4, C2), jnp.float32),
        ],
        interpret=_interpret(),
    )(gu, idx, gu, idx, y, aff.astype(jnp.float32))
    return din, parts


# ---------------------------------------------------------------------------
# v2 kernels: conv-native layout for the vmapped (stacked-expert) path
#
# vmap-of-pallas_call constrains every operand to row-major [E, B, H, W2, C]
# while XLA's vmapped stem convs produce/consume physical [H][W2][E][B][C] —
# the mismatch cost ~9 ms/step of relayout copies in the stage-2 profile
# (copy_bitcast_fusion feeding the fwd kernel + the g/idx copies feeding the
# bwd; PERF.md round-6 profile). The v2 kernels take the LOGICAL shape
# [H, W2, E*B, C] (H/W untiled leading dims, (EB, C) the tiled pair), so a
# logical transpose in a custom_vmap batching rule makes the pallas operand
# layout EQUAL the conv's physical layout and the transposes become bitcasts
# (validated on v5e by tools/probe_pool_v2.py: bitwise-exact, conv+pool fwd
# 18.0 -> 14.6 ms at stage-2 stem shapes).
#
# A pleasant side effect of H/W being untiled: no pltpu.roll / sublane
# tricks — W-neighbor access and the H-strided row selection are plain
# leading-dim slices, and the packed-parity split is a lane slice.
# ---------------------------------------------------------------------------


def _v2_pick_th(h2: int, cap: int = 4) -> int:
    """Pooled rows per grid cell. The bwd kernel holds ~5 f32 full-row
    temporaries (gt2/t1/t2/y/din) — at stage-2 shapes th=4 blows the 16 MB
    scoped-vmem stack (measured: 18.73M), so it runs at cap=2."""
    for th in (cap, cap // 2, 1):
        if th >= 1 and h2 % th == 0:
            return th
    return 1


def _v2_ok(bsz: int, shape) -> bool:
    """Can the v2 kernels take this (per-expert) raw conv shape [B,H,W2,C2]?
    Block rows must not straddle experts (bsz % _V2_EBT); W2 is untiled so
    unconstrained."""
    if len(shape) != 4:
        return False
    _, H, W2, C2 = shape
    return (C2 == 128 and H % 2 == 0 and W2 % 2 == 0
            and bsz % _V2_EBT == 0
            and (H // 2) % _v2_pick_th(H // 2) == 0)


def _v2_pool_core(x, *, th: int, w2: int, c: int):
    """W-then-H max + argmax-code on the assembled [2*th+1, W2, EBT, 2C]
    f32 block (row 0 = top halo). Same slot codes as _pool_core."""
    r0 = x[..., :c]
    r1 = x[..., c:]
    l1 = jnp.concatenate(
        [jnp.full_like(r1[:, :1], NEG), r1[:, :-1]], axis=1)
    wmax = jnp.maximum(jnp.maximum(l1, r0), r1)
    widx = jnp.where(l1 == wmax, 0, jnp.where(r0 == wmax, 1, 2))

    def _eo(v):
        v0 = v[0:2 * th].reshape(th, 2, *v.shape[1:])
        a = v0[:, 0]
        b = v0[:, 1]
        cc = jnp.concatenate([a[1:], v[2 * th:2 * th + 1]], axis=0)
        return a, b, cc

    a, b2, c3 = _eo(wmax)
    out = jnp.maximum(jnp.maximum(a, b2), c3)
    ia, ib, ic = _eo(widx)
    code = jnp.where(a == out, ia,
                     jnp.where(b2 == out, ib + 3, ic + 6))
    return out, code


def _v2_pack_lane(v):
    """[rows, W2, EBT, C] -> packed [rows, W2/2, EBT, 2C]: fold W-pairs into
    lanes (dim 1 is untiled, the lane concat is in-register)."""
    r, w2, ebt, c = v.shape
    v0 = v.reshape(r, w2 // 2, 2, ebt, c)
    return jnp.concatenate([v0[:, :, 0], v0[:, :, 1]], axis=-1)


def _v2_unpack_lane(v):
    """Packed [rows, W2/2, EBT, 2C] -> [rows, W2, EBT, C]."""
    r, w2p, ebt, c2 = v.shape
    c = c2 // 2
    return jnp.stack([v[..., :c], v[..., c:]], axis=2).reshape(
        r, 2 * w2p, ebt, c)


def _v2_fwd_bn_kernel(cur_ref, halo_ref, aff_ref, out_ref, idx_ref, *,
                      th: int, w2: int, c: int):
    t = pl.program_id(1)
    cur = cur_ref[...].astype(jnp.float32)            # [2th, W2, EBT, 2C]
    halo = halo_ref[...].astype(jnp.float32)          # [1,  W2, EBT, 2C]
    x = jnp.concatenate([halo, cur], axis=0)
    aff = aff_ref[0].astype(jnp.float32)              # [2, 3, 2C]
    _, x = _bn2_relu(x, aff, cur_ref.dtype)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    x = jnp.where((row == 0) & (t == 0), jnp.asarray(NEG, x.dtype), x)
    out, code = _v2_pool_core(x, th=th, w2=w2, c=c)
    # emit PACKED [th, W2/2, EBT, 2C]: dense 128 lanes (the unpacked 64-wide
    # form pads its tiles 2x) and the caller's transpose back to the logical
    # packed output becomes a bitcast of the conv layout
    out_ref[...] = _v2_pack_lane(out).astype(out_ref.dtype)
    idx_ref[...] = _v2_pack_lane(code).astype(jnp.int8)


def _v2_pool_bn_fwd_impl(yt: jnp.ndarray, aff: jnp.ndarray):
    """yt: [H, W2, EB, 2C] raw conv output; aff: [E, 2, 3, 2C].
    Returns (out packed [h2, W2/2, EB, 2C], idx int8 same)."""
    H, w2, eb, c2 = yt.shape
    e = aff.shape[0]
    bsz = eb // e
    c = c2 // 2
    h2 = H // 2
    # cap=2: at th=4 the f32 temporaries + the lane-pack concat overflow the
    # 16 MB scoped-vmem stack (measured 16.78M at stage-2 shapes)
    th = _v2_pick_th(h2, cap=2)
    grid = (eb // _V2_EBT, h2 // th)

    def cur_map(b, t):
        return (t, 0, b, 0)

    def halo_map(b, t):
        return (jnp.maximum(2 * th * t - 1, 0), 0, b, 0)

    def aff_map(b, t):
        return ((_V2_EBT * b) // bsz, 0, 0, 0)

    return pl.pallas_call(
        functools.partial(_v2_fwd_bn_kernel, th=th, w2=w2, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * th, w2, _V2_EBT, c2), cur_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w2, _V2_EBT, c2), halo_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 3, c2), aff_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((th, w2 // 2, _V2_EBT, c2), cur_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, w2 // 2, _V2_EBT, c2), cur_map,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h2, w2 // 2, eb, c2), yt.dtype),
            jax.ShapeDtypeStruct((h2, w2 // 2, eb, c2), jnp.int8),
        ],
        interpret=_interpret(),
    )(yt, yt, aff.astype(jnp.float32))


def _v2_scatter_core(g_ref, i_ref, gn_ref, in_ref, *, th: int, w2: int,
                     c: int):
    """Pool-gradient scatter in v2 layout; returns the [2*th, W2, EBT, 2C]
    f32 gradient w.r.t. the pool-input rows of this grid cell."""
    t = pl.program_id(1)
    last = pl.num_programs(1) - 1
    # g/idx arrive PACKED [*, W2/2, EBT, 2C] — unpack in-register
    gp = _v2_unpack_lane(g_ref[...].astype(jnp.float32))   # [th, W2, EBT, C]
    ip = _v2_unpack_lane(i_ref[...].astype(jnp.int32))
    gn = _v2_unpack_lane(gn_ref[...].astype(jnp.float32))  # [1, W2, EBT, C]
    inx = _v2_unpack_lane(in_ref[...].astype(jnp.int32))
    gn = jnp.where(t < last, gn, jnp.zeros_like(gn))
    inx = jnp.where(t < last, inx, jnp.full_like(inx, 9))

    g = jnp.concatenate([gp, gn], axis=0)             # [th+1, W2, EBT, C]
    code = jnp.concatenate([ip, inx], axis=0)
    hs = code // 3
    ws = code - 3 * hs

    def wdistribute(rows_g, rows_hs, rows_ws, want_h):
        sel = rows_hs == want_h
        g0 = jnp.where(sel & (rows_ws == 1), rows_g, 0.0)
        g1 = jnp.where(sel & (rows_ws == 2), rows_g, 0.0)
        gl = jnp.where(sel & (rows_ws == 0), rows_g, 0.0)
        # left-slot of out col w'' lands on parity-1 col w''-1: shift left
        # along the (untiled) W2 dim
        gshift = jnp.concatenate(
            [gl[:, 1:], jnp.zeros_like(gl[:, :1])], axis=1)
        return g0, g1 + gshift

    e0, e1 = wdistribute(g[:th], hs[:th], ws[:th], 1)
    o0a, o1a = wdistribute(g[:th], hs[:th], ws[:th], 2)
    o0b, o1b = wdistribute(g[1:], hs[1:], ws[1:], 0)
    o0, o1 = o0a + o0b, o1a + o1b

    even = jnp.concatenate([e0, e1], axis=-1)         # [th, W2, EBT, 2C]
    odd = jnp.concatenate([o0, o1], axis=-1)
    inter = jnp.stack([even, odd], axis=1)            # [th, 2, W2, EBT, 2C]
    return inter.reshape(2 * th, *even.shape[1:])


def _v2_bwd_bn_kernel(g_ref, i_ref, gn_ref, in_ref, y_ref, aff_ref, din_ref,
                      part_ref, *, th: int, w2: int, c: int):
    gt2 = _v2_scatter_core(g_ref, i_ref, gn_ref, in_ref, th=th, w2=w2, c=c)
    y = y_ref[...].astype(jnp.float32)                # [2th, W2, EBT, 2C]
    aff = aff_ref[0].astype(jnp.float32)              # [2, 3, 2C]
    t1, t2 = _bn2_relu(y, aff, y_ref.dtype)
    gu1 = jnp.where(t2 > 0, gt2, 0.0)
    r1 = jnp.sum(gu1 * (t1 - aff[1, 0]), axis=(0, 1, 2))
    r2 = jnp.sum(gu1, axis=(0, 1, 2))
    gu0 = jnp.where(t1 > 0, gu1 * aff[1, 1], 0.0)
    r3 = jnp.sum(gu0 * (y - aff[0, 0]), axis=(0, 1, 2))
    r4 = jnp.sum(gu0, axis=(0, 1, 2))
    din_ref[...] = (gu0 * aff[0, 1]).astype(din_ref.dtype)
    part_ref[0, 0] = jnp.stack([r1, r2, r3, r4])


def _v2_pool_bn_bwd_impl(yt, aff, gt, idxt):
    """v2-layout backward. yt [H, W2, EB, 2C]; aff [E, 2, 3, 2C];
    gt/idxt PACKED [h2, W2/2, EB, 2C]. Returns (din [H, W2, EB, 2C],
    parts [EB/EBT, nt, 4, 2C])."""
    H, w2, eb, c2 = yt.shape
    e = aff.shape[0]
    bsz = eb // e
    c = c2 // 2
    h2 = H // 2
    th = _v2_pick_th(h2, cap=2)
    nt = h2 // th
    grid = (eb // _V2_EBT, nt)

    def pooled_map(b, t):
        return (t, 0, b, 0)

    def next_map(b, t):
        return (jnp.minimum(th * t + th, h2 - 1), 0, b, 0)

    def full_map(b, t):
        return (t, 0, b, 0)

    def aff_map(b, t):
        return ((_V2_EBT * b) // bsz, 0, 0, 0)

    def part_map(b, t):
        return (b, t, 0, 0)

    din, parts = pl.pallas_call(
        functools.partial(_v2_bwd_bn_kernel, th=th, w2=w2, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((th, w2 // 2, _V2_EBT, c2), pooled_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, w2 // 2, _V2_EBT, c2), pooled_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w2 // 2, _V2_EBT, c2), next_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w2 // 2, _V2_EBT, c2), next_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * th, w2, _V2_EBT, c2), full_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 3, c2), aff_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2 * th, w2, _V2_EBT, c2), full_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4, c2), part_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, w2, eb, c2), gt.dtype),
            jax.ShapeDtypeStruct((eb // _V2_EBT, nt, 4, c2), jnp.float32),
        ],
        interpret=_interpret(),
    )(gt, idxt, gt, idxt, yt, aff.astype(jnp.float32))
    return din, parts


# -- custom_vmap dispatchers -------------------------------------------------
#
# The custom_vjp wrappers below keep the v1 logical convention; these
# dispatchers sit inside their fwd/bwd so that when the op is vmapped (the
# stacked-expert nn.vmap), the batched call routes to the v2 kernels. The
# fallback replicates the v1 behavior exactly (jax.vmap of the v1 impl with
# the _lead_bdim layout workaround).


def _to_hweb(x5):
    """[E, B, H, W2, C] -> [H, W2, E*B, C] (a bitcast when the producer is
    in the TPU conv layout)."""
    e, b, h, w2, cc = x5.shape
    return jnp.transpose(x5, (2, 3, 0, 1, 4)).reshape(h, w2, e * b, cc)


def _from_hweb(xt, e: int):
    """[H, W2, E*B, C] -> [E, B, H, W2, C]."""
    h, w2, eb, cc = xt.shape
    return jnp.transpose(xt.reshape(h, w2, e, eb // e, cc), (2, 3, 0, 1, 4))


def _bcast(arg, batched, axis_size):
    return arg if batched else jnp.broadcast_to(
        arg[None], (axis_size, *arg.shape))


@custom_batching.custom_vmap
def _pool_bn_fwd_dispatch(y, aff):
    return _pool_bn_fwd_impl(_lead_bdim(y), _lead_bdim(aff))


@_pool_bn_fwd_dispatch.def_vmap
def _pool_bn_fwd_vmap(axis_size, in_batched, y, aff):
    y = _bcast(y, in_batched[0], axis_size)
    aff = _bcast(aff, in_batched[1], axis_size)
    e, bsz = y.shape[0], y.shape[1]
    if os.environ.get("PMOE_POOL_V2", "1") == "1" and _v2_ok(bsz, y.shape[1:]):
        # the kernel emits/consumes the PACKED pooled form directly, so both
        # transposes here are bitcasts of the surrounding conv layouts and
        # the idx residual round-trips fwd->bwd without a relayout
        out_t, idx_t = _v2_pool_bn_fwd_impl(_to_hweb(y), aff)
        return (_from_hweb(out_t, e), _from_hweb(idx_t, e)), (True, True)
    out, idx = jax.vmap(
        lambda y_, a_: _pool_bn_fwd_impl(_lead_bdim(y_), _lead_bdim(a_))
    )(y, aff)
    return (out, idx), (True, True)


@custom_batching.custom_vmap
def _pool_bn_bwd_dispatch(y, aff, g, idx):
    """Returns (din, psum[4, 2C]) — parts already reduced."""
    din, parts = _pool_bn_bwd_impl(_lead_bdim(y), _lead_bdim(aff), g,
                                   _lead_bdim(idx))
    return din, jnp.sum(parts, axis=(0, 1))


@_pool_bn_bwd_dispatch.def_vmap
def _pool_bn_bwd_vmap(axis_size, in_batched, y, aff, g, idx):
    y = _bcast(y, in_batched[0], axis_size)
    aff = _bcast(aff, in_batched[1], axis_size)
    g = _bcast(g, in_batched[2], axis_size)
    idx = _bcast(idx, in_batched[3], axis_size)
    e, bsz = y.shape[0], y.shape[1]
    if os.environ.get("PMOE_POOL_V2", "1") == "1" and _v2_ok(bsz, y.shape[1:]):
        # g and the idx residual are already in the packed pooled form the
        # kernel speaks — both _to_hweb transposes are bitcasts
        din_t, parts = _v2_pool_bn_bwd_impl(_to_hweb(y), aff, _to_hweb(g),
                                            _to_hweb(idx))
        psum = jnp.sum(
            parts.reshape(e, bsz // _V2_EBT, -1, 4, parts.shape[-1]),
            axis=(1, 2))
        return (_from_hweb(din_t, e), psum), (True, True)
    def _v1(y_, a_, g_, i_):
        din_, parts_ = _pool_bn_bwd_impl(_lead_bdim(y_), _lead_bdim(a_), g_,
                                         _lead_bdim(i_))
        return din_, jnp.sum(parts_, axis=(0, 1))

    din, psum = jax.vmap(_v1)(y, aff, g, idx)
    return (din, psum), (True, True)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@jax.custom_vjp
def fused_packed_pool(xp: jnp.ndarray) -> jnp.ndarray:
    """3x3/2 max-pool consuming AND producing the W-pair-packed layout:
    [B, H, W2, 2C] -> [B, H/2, W2/2, 2C]."""
    out, _ = _pool_fwd_impl(xp)
    return out


def _fpp_fwd(xp):
    out, idx = _pool_fwd_impl(xp)
    return out, idx


def _fpp_bwd(idx, g):
    B, h2, W2, c = idx.shape          # idx is stored UNPACKED [B,h2,W2,C]
    xshape = (B, 2 * h2, W2, 2 * c)
    return (_pool_bwd_impl(xshape, g, idx),)


fused_packed_pool.defvjp(_fpp_fwd, _fpp_bwd)


@jax.custom_vjp
def fused_packed_pool_bn(y: jnp.ndarray, aff: jnp.ndarray) -> jnp.ndarray:
    """The stem's two deferred BatchNorm-affine + ReLU epilogues fused into
    the 3x3/2 max-pool: reads the RAW stem conv output once and writes the
    pooled result, so the two full-resolution post-BN tensors are never
    materialized in HBM (they were the stage-2 step's largest HBM-bound
    loop fusions — see PERF.md).

    y:   [B, H, W2, 2C] raw conv output (W-pair-packed)
    aff: [2, 3, 2C] f32 — per BN layer (batch mean, scale/sqrt(var+eps),
         bias), duplicated over the packed halves; computed by PackedBN in
         ``affine_only`` mode so BN statistics (and their gradient paths)
         stay in XLA.
    Returns the packed pooled tensor [B, H/2, W2/2, 2C].

    Under vmap (the stacked-expert nn.vmap) the custom_vmap dispatchers
    route to the conv-native-layout v2 kernels (PMOE_POOL_V2=0 disables).
    """
    out, _ = _pool_bn_fwd_dispatch(y, aff)
    return out


def _lead_bdim(x):
    """Free reshape round-trip that forces a vmap batch dim to the front.

    Under the MoE's expert ``nn.vmap`` the raw conv output reaches this op
    with its batch dim at an interior position (the conv batching rule
    parks it next to the feature dim); pallas_call's auto-batching then
    inserts the grid dim there, violating Mosaic's rule that the last two
    block dims be full/tile-divisible. A genuine reshape (identity reshapes
    short-circuit in lax) moves the batch dim to axis 0 — exactly what the
    old pool path got for free from its repack reshape. Outside vmap both
    reshapes are metadata-only."""
    b, *rest = x.shape
    return x.reshape(b, -1).reshape(b, *rest)


def _fppbn_fwd(y, aff):
    out, idx = _pool_bn_fwd_dispatch(y, aff)
    return out, (y, aff, idx)


def _fppbn_bwd(res, g):
    y, aff, idx = res
    din, p = _pool_bn_bwd_dispatch(y, aff, g, idx)        # p: [4, 2C]
    # d mean = -scale * d bias (per channel); order in aff is (m, s, b)
    daff = jnp.stack([
        jnp.stack([-aff[0, 1] * p[3], p[2], p[3]]),
        jnp.stack([-aff[1, 1] * p[1], p[0], p[1]]),
    ]).astype(aff.dtype)
    return din, daff


fused_packed_pool_bn.defvjp(_fppbn_fwd, _fppbn_bwd)

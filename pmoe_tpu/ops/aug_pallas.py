"""Fused curriculum-augmentation Pallas kernel (TPU).

The XLA op-by-op pipeline (ops/image_ops.py) is dominated not by bandwidth
but by per-pixel threefry randomness (isolated per-op timings on v5e at
(256, 224, 224, 3): additive noise 4.7 ms, pixel dropout 4.1 ms, coarse
dropout 6.4 ms — each ~20x the two-pass bandwidth bound). This kernel fuses
noise + coarse dropout + pixel dropout + add + multiply + contrast +
grayscale into ONE pass over the image batch with the TPU hardware PRNG
(`pltpu.prng_random_bits`), reading and writing each pixel once.

Measured end-to-end, the win is neutral: inside one jit program XLA fuses
its chain aggressively, and both paths are VPU-bound on per-pixel random
generation (full `augment` at (256,224,224,3): 13.2 ms fused vs 13.3 ms
XLA; stage-2 b64 train step 233.5 vs 233.2 ms, paired A/B on v5e). The
kernel is kept (single-pass memory profile, hardware PRNG instead of
threefry state threading) but is not a throughput lever at these shapes.

Division of labor (semantics match ops/image_ops.py):
* per-image decisions — op gates (imgaug ``Sometimes``), magnitudes,
  per-channel-vs-shared modes — are sampled OUTSIDE with jax.random (tiny
  (b,)-vectors) and folded into effective parameters (gate off => identity
  magnitude), so the kernel is branch-free;
* per-PIXEL randomness (noise normals via Box-Muller, dropout uniforms) is
  generated in-kernel by the hardware PRNG;
* CoarseDropout cells come from a wang-hash of the cell coordinates — the
  same fixed-grid statistics as image_ops.coarse_dropout (48x48 grid);
* Gaussian blur stays outside (spatial taps; it is a cheap fused
  multiply-add chain in XLA and has no per-pixel RNG).

Gradients never flow through augmentation (it transforms input data behind
an optimization barrier), so no custom VJP is needed.

Layout: channels are passed as three dense (b, H*W) planes — a (..., 3)
minor dim would waste 42/128 lanes of every vector register.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_augment_chain", "pallas_aug_supported"]

_ROWS = 8                 # images per grid step (f32 sublane tile)
_GRID = 48                # CoarseDropout fixed grid (image_ops._COARSE_GRID)
_NPARAM = 24              # per-image parameter columns (padded for alignment)

# parameter column indices
(_NOISE_SCALE, _NOISE_PC, _DROP_P, _DROP_PC, _COARSE_P, _COARSE_PC,
 _COARSE_GY, _COARSE_GX, _ADD_R, _ADD_G, _ADD_B, _MUL_R, _MUL_G, _MUL_B,
 _CON_R, _CON_G, _CON_B, _GRAY_A) = range(18)


def _rows_for(dtype) -> int:
    """Images per grid step = the sublane tile of the plane dtype (8 for
    4-byte, 16 for 2-byte): Mosaic requires block sublanes to be
    tile-divisible or full."""
    return 16 if jnp.dtype(dtype).itemsize == 2 else _ROWS


def pallas_aug_supported(b: int, hw: int, dtype=jnp.float32) -> bool:
    """Kernel eligibility: full image-row tiles and a lane-friendly split."""
    return (b % _rows_for(dtype) == 0 and hw % 8 == 0
            and jax.default_backend() == "tpu")


def _u24_to_f32(bits_u32):
    """Top-24-bit uint32 -> U[0,1) f32. Mosaic has no uint32->f32 cast, so
    shift first (guaranteeing a non-negative value) and cast via int32."""
    return (pltpu.bitcast(bits_u32 >> 8, jnp.int32).astype(jnp.float32)
            * (1.0 / (1 << 24)))


def _uniform(shape):
    """U[0,1) from the hardware PRNG (top 24 bits)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return _u24_to_f32(bits)


def _normal(shape):
    """Standard normal via Box-Muller."""
    u1 = jnp.maximum(_uniform(shape), 1e-7)
    u2 = _uniform(shape)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * np.pi * u2)


def _wang_hash_uniform(x):
    """Integer hash -> U[0,1), elementwise on int32 (cell randomness)."""
    x = pltpu.bitcast(x, jnp.uint32)
    x = (x ^ jnp.uint32(61)) ^ (x >> 16)
    x = x * jnp.uint32(9)
    x = x ^ (x >> 4)
    x = x * jnp.uint32(0x27D4EB2D)
    x = x ^ (x >> 15)
    return _u24_to_f32(x)


def _aug_kernel(seed_ref, params_ref, r_ref, g_ref, b_ref,
                ro_ref, go_ref, bo_ref, *, tile: int, width: int,
                height: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + i * jnp.int32(131071) + j * jnp.int32(8191))

    P = params_ref[:]                                   # (ROWS, NPARAM)
    col = lambda c: P[:, c][:, None]                    # (ROWS, 1)

    shape = (r_ref.shape[0], tile)
    # pixel coordinates of this tile (same for every image row)
    p_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + j * tile
    h_idx = p_idx // width
    w_idx = p_idx - h_idx * width

    # compute in f32 regardless of the storage dtype (bf16 planes on the
    # production path halve the kernel's HBM traffic; math stays f32)
    chans = [r_ref[:].astype(jnp.float32), g_ref[:].astype(jnp.float32),
             b_ref[:].astype(jnp.float32)]

    # -- AdditiveGaussianNoise (scale in 0-255 units / 255) ------------------
    z_shared = _normal(shape)
    noise_pc = col(_NOISE_PC)
    scale = col(_NOISE_SCALE) * (1.0 / 255.0)
    for c in range(3):
        z_c = _normal(shape)
        z = jnp.where(noise_pc > 0.5, z_c, z_shared)
        chans[c] = chans[c] + z * scale

    # -- CoarseDropout (fixed 48x48 cell grid, wang-hash cells) --------------
    gy, gx = col(_COARSE_GY), col(_COARSE_GX)
    iy = jnp.clip((h_idx.astype(jnp.float32) * gy * (1.0 / height))
                  .astype(jnp.int32), 0, _GRID - 1)
    ix = jnp.clip((w_idx.astype(jnp.float32) * gx * (1.0 / width))
                  .astype(jnp.int32), 0, _GRID - 1)
    img_salt = (jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                + i * r_ref.shape[0]) * jnp.int32(7919) + seed_ref[0]
    cell = iy * _GRID + ix
    coarse_p = col(_COARSE_P)
    coarse_pc = col(_COARSE_PC)
    u_cell_shared = _wang_hash_uniform(cell + img_salt)
    for c in range(3):
        u_cell_c = _wang_hash_uniform(cell + img_salt
                                      + jnp.int32((c + 1) * 104729))
        u = jnp.where(coarse_pc > 0.5, u_cell_c, u_cell_shared)
        chans[c] = chans[c] * (u >= coarse_p).astype(jnp.float32)

    # -- Dropout (per-pixel uniforms) ----------------------------------------
    u_shared = _uniform(shape)
    drop_p = col(_DROP_P)
    drop_pc = col(_DROP_PC)
    for c in range(3):
        u_c = _uniform(shape)
        u = jnp.where(drop_pc > 0.5, u_c, u_shared)
        chans[c] = chans[c] * (u >= drop_p).astype(jnp.float32)

    # -- Add / Multiply / LinearContrast (per-image-channel scalars) ---------
    for c, (av, mv, cv) in enumerate(((_ADD_R, _MUL_R, _CON_R),
                                      (_ADD_G, _MUL_G, _CON_G),
                                      (_ADD_B, _MUL_B, _CON_B))):
        x = chans[c] + col(av) * (1.0 / 255.0)
        x = x * col(mv)
        chans[c] = 0.5 + col(cv) * (x - 0.5)

    # -- Grayscale blend ------------------------------------------------------
    alpha = col(_GRAY_A)
    lum = 0.299 * chans[0] + 0.587 * chans[1] + 0.114 * chans[2]
    for c, out in enumerate((ro_ref, go_ref, bo_ref)):
        out[:] = (chans[c] * (1.0 - alpha) + lum * alpha).astype(out.dtype)


def _resolve_channel_values(key, b, low, high, pc_prob):
    """(B, 3) effective per-channel values: per-channel draws where the
    per-image pc coin lands, else one shared draw (image_ops._spread)."""
    k1, k2 = jax.random.split(key)
    rng = high - low
    v_pc = low[:, None] + rng[:, None] * jax.random.uniform(k1, (b, 3))
    v_sh = low[:, None] + rng[:, None] * jax.random.uniform(k1, (b, 1))
    pc = jax.random.uniform(k2, (b,)) < pc_prob
    return jnp.where(pc[:, None], v_pc, jnp.broadcast_to(v_sh, (b, 3)))


def fused_augment_chain(key, images, f, *, grayscale: bool = True,
                        custom: bool = False):
    """Apply the post-blur augmentation chain in one fused Pallas pass.

    images: (b, H, W, 3) float in [0, 1]; ``f`` a schedule Factors tuple.
    Matches the op semantics/order of ops/augment.py's XLA path (noise,
    coarse dropout, dropout, add, multiply, contrast, grayscale), with
    per-image gate/magnitude sampling done here via jax.random and only the
    per-pixel randomness in-kernel.
    """
    b, H, W, C = images.shape
    assert C == 3
    hw = H * W
    ks = jax.random.split(key, 16)
    zeros = jnp.zeros((b,), jnp.float32)
    ones = jnp.ones((b,), jnp.float32)

    def gate(k):
        return (jax.random.uniform(k, (b,)) < f.freq).astype(jnp.float32)

    def u(k, lo, hi):
        return lo + (hi - lo) * jax.random.uniform(k, (b,))

    params = jnp.zeros((b, _NPARAM), jnp.float32)

    # noise: effective scale (0 when gated off); pc coin per image
    params = params.at[:, _NOISE_SCALE].set(
        gate(ks[0]) * u(ks[1], zeros, f.dropout * 255.0))
    params = params.at[:, _NOISE_PC].set(
        (jax.random.uniform(ks[2], (b,)) < f.color).astype(jnp.float32))

    # coarse dropout
    if not custom:
        sp = u(ks[3], 0.08 * ones, 0.2 * ones)
        params = params.at[:, _COARSE_P].set(
            gate(ks[4]) * u(ks[5], zeros, f.dropout))
        params = params.at[:, _COARSE_PC].set(
            (jax.random.uniform(ks[6], (b,)) < f.color).astype(jnp.float32))
        params = params.at[:, _COARSE_GY].set(jnp.maximum(sp * H, 2.0))
        params = params.at[:, _COARSE_GX].set(jnp.maximum(sp * W, 2.0))
    else:
        params = params.at[:, _COARSE_GY].set(2.0 * ones)
        params = params.at[:, _COARSE_GX].set(2.0 * ones)

    # pixel dropout
    params = params.at[:, _DROP_P].set(
        gate(ks[7]) * u(ks[8], zeros, f.dropout))
    params = params.at[:, _DROP_PC].set(
        (jax.random.uniform(ks[9], (b,)) < f.color).astype(jnp.float32))

    # add / multiply / contrast: resolved per-channel values with gates folded
    if custom:
        add_v = _resolve_channel_values(ks[10], b, zeros - 30.0, zeros + 30.0,
                                        0.0)
        mul_v = _resolve_channel_values(ks[11], b, zeros + 0.9, zeros + 1.3,
                                        1.0)
        con_v = jnp.ones((b, 3), jnp.float32)
        g_add, g_mul, g_con = gate(ks[12]), gate(ks[13]), zeros
    else:
        add_v = _resolve_channel_values(ks[10], b, -f.add * ones,
                                        f.add * ones, f.color)
        mul_v = _resolve_channel_values(ks[11], b, f.mult_neg * ones,
                                        f.mult_pos * ones, f.color)
        con_v = _resolve_channel_values(ks[12], b, f.con_neg * ones,
                                        f.con_pos * ones, f.color)
        g_add, g_mul, g_con = gate(ks[13]), gate(ks[14]), gate(ks[15])
    params = params.at[:, _ADD_R:_ADD_B + 1].set(add_v * g_add[:, None])
    params = params.at[:, _MUL_R:_MUL_B + 1].set(
        1.0 + (mul_v - 1.0) * g_mul[:, None])
    params = params.at[:, _CON_R:_CON_B + 1].set(
        1.0 + (con_v - 1.0) * g_con[:, None])

    # grayscale: alpha in (0,1), gated; off for super_hard/custom callers
    if grayscale:
        galpha = gate(ks[2]) * jax.random.uniform(
            jax.random.fold_in(key, 77), (b,))
    else:
        galpha = zeros
    params = params.at[:, _GRAY_A].set(galpha)

    seed = jax.random.randint(jax.random.fold_in(key, 99), (1,),
                              0, np.int32(2 ** 31 - 1), dtype=jnp.int32)

    planes = [images[..., c].reshape(b, hw) for c in range(3)]
    rows = _rows_for(images.dtype)
    tile = hw // 8 if hw % 8 == 0 else hw
    grid = (b // rows, hw // tile)
    # NB: with num_scalar_prefetch=1 the index_map also receives the scalar
    # ref as a trailing argument
    img_spec = pl.BlockSpec((rows, tile), lambda i, j, *_: (i, j),
                            memory_space=pltpu.VMEM)
    par_spec = pl.BlockSpec((rows, _NPARAM), lambda i, j, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_aug_kernel, tile=tile, width=W, height=H)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[par_spec, img_spec, img_spec, img_spec],
            out_specs=(img_spec, img_spec, img_spec),
        ),
        out_shape=tuple(jax.ShapeDtypeStruct((b, hw), images.dtype)
                        for _ in range(3)),
    )(seed, params, *planes)
    return jnp.stack([o.reshape(b, H, W) for o in out], axis=-1)

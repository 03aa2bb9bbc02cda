"""Batched, jittable image-augmentation primitives (VPU-friendly, static shapes).

These replace the imgaug operators used by the reference's curriculum augmenter
(/root/reference/PMoE/model/augmenter.py) with on-device equivalents that run
INSIDE the jitted train step: per-image parameters are traced arrays, shapes are
static, and everything vectorizes over the batch. Images are float in [0, 1]
(the reference operates on uint8 0-255; additive magnitudes are scaled by 1/255).

Each op takes per-image sampled parameters; the ``p_apply`` gate (imgaug's
``Sometimes``) is applied by the pipeline in :mod:`pmoe_tpu.ops.augment`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "gaussian_blur", "additive_gaussian_noise", "pixel_dropout",
    "coarse_dropout", "add_brightness", "multiply_brightness",
    "linear_contrast", "grayscale",
]

_BLUR_RADIUS = 5  # static taps; covers sigma up to ~2.5 well


def gaussian_blur(images: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Separable Gaussian blur with per-image traced sigma.

    images: (B, H, W, C); sigma: (B,). sigma ~ 0 degenerates to identity.

    Implemented as static-shift multiply-adds (pad once per axis, then a
    weighted sum of 2R+1 slices) rather than per-image depthwise convs: a
    vmapped grouped conv lowers to 1-channel feature groups that each pad to
    a full MXU tile on TPU (~100 ms/step at batch 256x224x224; the shift form
    fuses into one elementwise pass).
    """
    x = jnp.arange(-_BLUR_RADIUS, _BLUR_RADIUS + 1, dtype=jnp.float32)
    sig = jnp.maximum(sigma.astype(jnp.float32), 1e-3)[:, None]       # (B, 1)
    w = jnp.exp(-0.5 * (x[None, :] / sig) ** 2)                       # (B, taps)
    w = w / jnp.sum(w, axis=1, keepdims=True)

    pad = _BLUR_RADIUS
    h, wd = images.shape[1], images.shape[2]
    taps = 2 * _BLUR_RADIUS + 1

    # Accumulate in f32 but store in the input dtype: on the TPU bf16
    # augmentation path this halves the two passes' HBM traffic while the
    # tap sum keeps full precision (f32 input is bit-identical to before).
    def _pass(x, axis):
        xp = jnp.pad(x, [(pad, pad) if a == axis else (0, 0)
                         for a in range(4)])
        acc = jnp.zeros(x.shape, jnp.float32)
        for j in range(taps):
            sl = xp[:, j:j + h] if axis == 1 else xp[:, :, j:j + wd]
            acc = acc + w[:, j, None, None, None] * sl.astype(jnp.float32)
        return acc.astype(x.dtype)

    return _pass(_pass(images, 1), 2)


def _maybe_per_channel(key, shape_bc, pc_prob):
    """Returns (B, 1, 1, C)-broadcastable multiplier sampler helper: a bool mask
    (B,) choosing per-channel mode with probability pc_prob per image."""
    return jax.random.uniform(key, (shape_bc[0],)) < pc_prob


def _spread(values_pc: jnp.ndarray, values_shared: jnp.ndarray,
            pc_mask: jnp.ndarray) -> jnp.ndarray:
    """Select per-channel (B, 1, 1, C) vs shared (B, 1, 1, 1) params."""
    return jnp.where(pc_mask[:, None, None, None], values_pc, values_shared)


def additive_gaussian_noise(key, images, scale, pc_prob):
    """Gaussian pixel noise; scale (B,) in 0-255 units (imgaug convention)."""
    k1, k2, k3 = jax.random.split(key, 3)
    b, h, w, c = images.shape
    noise_pc = jax.random.normal(k1, images.shape)
    noise_shared = jnp.broadcast_to(
        jax.random.normal(k1, (b, h, w, 1)), images.shape)
    pc = _maybe_per_channel(k2, images.shape, pc_prob)
    noise = jnp.where(pc[:, None, None, None], noise_pc, noise_shared)
    return images + noise * (scale[:, None, None, None] / 255.0)


def pixel_dropout(key, images, p, pc_prob):
    """Zero pixels with per-image probability p (B,)."""
    k1, k2 = jax.random.split(key)
    b, h, w, c = images.shape
    u_pc = jax.random.uniform(k1, images.shape)
    u_shared = jnp.broadcast_to(jax.random.uniform(k1, (b, h, w, 1)), images.shape)
    pc = _maybe_per_channel(k2, images.shape, pc_prob)
    u = jnp.where(pc[:, None, None, None], u_pc, u_shared)
    keep = u >= p[:, None, None, None]
    return images * keep


_COARSE_GRID = 48  # >= max cells (size_percent 0.2 * 224 ~= 45)


def coarse_dropout(key, images, p, size_percent, pc_prob):
    """imgaug CoarseDropout: drop cells of a low-res grid.

    Static-shape trick: random values live on a fixed (G, G) grid per image
    (and channel); the traced cell count g = size_percent * H only changes the
    GATHER indices (floor(y * g / H)), so arbitrary cell sizes need no dynamic
    shapes.
    """
    k1, k2 = jax.random.split(key)
    b, h, w, c = images.shape
    grid = jax.random.uniform(k1, (b, _COARSE_GRID, _COARSE_GRID, c))
    pc = _maybe_per_channel(k2, images.shape, pc_prob)
    grid = jnp.where(pc[:, None, None, None], grid, grid[..., :1])

    gy = jnp.maximum(size_percent * h, 2.0)                            # (B,)
    gx = jnp.maximum(size_percent * w, 2.0)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    iy = jnp.clip((ys[None, :] * gy[:, None] / h).astype(jnp.int32),
                  0, _COARSE_GRID - 1)                                 # (B, H)
    ix = jnp.clip((xs[None, :] * gx[:, None] / w).astype(jnp.int32),
                  0, _COARSE_GRID - 1)                                 # (B, W)
    def gather_one(grid_i, iy_i, ix_i):
        return grid_i[iy_i][:, ix_i]                                   # (H, W, C)

    cell = jax.vmap(gather_one)(grid, iy, ix)                          # (B,H,W,C)
    keep = cell >= p[:, None, None, None]
    return images * keep


def add_brightness(key, images, low, high, pc_prob):
    """imgaug Add: add uniform value in [low, high] (0-255 units), (B,) each."""
    k1, k2 = jax.random.split(key)
    b, _, _, c = images.shape
    rng = (high - low)
    v_pc = low[:, None] + rng[:, None] * jax.random.uniform(k1, (b, c))
    v_shared = low[:, None] + rng[:, None] * jax.random.uniform(k1, (b, 1))
    pc = _maybe_per_channel(k2, images.shape, pc_prob)
    v = jnp.where(pc[:, None], v_pc, jnp.broadcast_to(v_shared, (b, c)))
    return images + v[:, None, None, :] / 255.0


def multiply_brightness(key, images, low, high, pc_prob):
    k1, k2 = jax.random.split(key)
    b, _, _, c = images.shape
    rng = (high - low)
    m_pc = low[:, None] + rng[:, None] * jax.random.uniform(k1, (b, c))
    m_shared = low[:, None] + rng[:, None] * jax.random.uniform(k1, (b, 1))
    pc = _maybe_per_channel(k2, images.shape, pc_prob)
    m = jnp.where(pc[:, None], m_pc, jnp.broadcast_to(m_shared, (b, c)))
    return images * m[:, None, None, :]


def linear_contrast(key, images, low, high, pc_prob):
    """out = 0.5 + alpha * (in - 0.5), alpha ~ U(low, high) per image/channel."""
    k1, k2 = jax.random.split(key)
    b, _, _, c = images.shape
    rng = (high - low)
    a_pc = low[:, None] + rng[:, None] * jax.random.uniform(k1, (b, c))
    a_shared = low[:, None] + rng[:, None] * jax.random.uniform(k1, (b, 1))
    pc = _maybe_per_channel(k2, images.shape, pc_prob)
    a = jnp.where(pc[:, None], a_pc, jnp.broadcast_to(a_shared, (b, c)))
    return 0.5 + a[:, None, None, :] * (images - 0.5)


def grayscale(key, images, low, high):
    """Blend toward ITU-R 601 luminance with alpha ~ U(low, high) per image."""
    b = images.shape[0]
    alpha = low + (high - low) * jax.random.uniform(key, (b, 1, 1, 1))
    lum = (0.299 * images[..., 0:1] + 0.587 * images[..., 1:2]
           + 0.114 * images[..., 2:3])
    return images * (1.0 - alpha) + lum * alpha

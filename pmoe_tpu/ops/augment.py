"""On-device curriculum augmentation (reference /root/reference/PMoE/model/augmenter.py).

The reference runs COiLTRAiNE imgaug pipelines in DataLoader worker processes,
with intensity factors that are functions of a global iteration counter
(augmenter.py:79-612). Here the whole pipeline is a jittable function of
``(rng, images, iteration)`` executed on the TPU inside the train step: the
iteration-dependent factors are traced scalars, so ONE compiled program covers
the entire curriculum (no recompiles as factors anneal).

Schedule constants are transcribed per aug_type (medium/soft/high/
medium_harder/super_hard/soft_harder/custom @ augmenter.py:79-612; seg_aug
uses imgaug 0.4.0 defaults @ augmenter.py:57-76).

Known divergences from imgaug (documented):
* ops apply in fixed order (imgaug ``random_order=True`` permutes per call);
* uint8 round-tripping between ops is skipped (we stay in float and clip once);
* CoarseDropout cell sampling uses the static-grid gather trick
  (see ops/image_ops.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import image_ops as I

__all__ = ["augment", "schedule_factors", "AUG_TYPES"]

AUG_TYPES = ("medium", "soft", "high", "medium_harder", "super_hard",
             "soft_harder", "custom", "segmentation", "none")


def _finish(x: jnp.ndarray, orig_shape, dtype=None) -> jnp.ndarray:
    """Clip + restore shape + OPTIMIZATION BARRIER.

    The barrier materializes the augmented batch before the model consumes
    it: letting XLA fuse the whole augmentation chain into the training graph
    made the stage-2 step 1.6-6x slower on v5e (the scheduler interleaves /
    rematerializes the chain inside the backward). Isolated, the full
    super_hard pipeline costs ~15 ms at (256,224,224,3); behind the barrier
    the train step pays exactly that.
    """
    x = jnp.clip(x, 0.0, 1.0).reshape(orig_shape)
    if dtype is not None:
        x = x.astype(dtype)
    return jax.lax.optimization_barrier(x)


class Factors(NamedTuple):
    freq: jnp.ndarray          # per-op application probability
    color: jnp.ndarray         # per-channel-mode probability
    dropout: jnp.ndarray       # dropout/noise magnitude
    blur: jnp.ndarray          # max blur sigma
    add: jnp.ndarray           # brightness add range
    mult_pos: jnp.ndarray
    mult_neg: jnp.ndarray
    con_pos: jnp.ndarray
    con_neg: jnp.ndarray


# (it_divisor_uses_1p5bsz, freq_div, freq_cap, color_div, blur_div, add_div,
#  mult_pos_div, mult_neg_div, con_pos_div, con_neg_div)
_SCHEDULES = {
    "medium":        (True, 1.0e6, None, 1.0e6, 1.0e5, 1.5e5, 5.0e5, 5.0e5, 5.0e5, 5.0e5),
    "soft":          (True, 1.2e6, None, 1.2e6, 1.2e5, 1.7e5, 8.0e5, 8.0e5, 8.0e5, 8.0e5),
    "high":          (True, 8.0e5, None, 8.0e5, 8.0e4, 1.2e5, 3.5e5, 4.0e5, 3.5e5, 4.0e5),
    "medium_harder": (False, 1.0e6, None, 1.0e6, 1.0e5, 1.5e5, 5.0e5, 5.0e5, 5.0e5, 5.0e5),
    "super_hard":    (False, 5.0e4, 1.0, 1.0e5, 1.0e5, 1.0e5, 2.0e5, 5.0e5, 5.0e5, 5.0e5),
    "soft_harder":   (False, 1.2e6, None, 1.2e6, 1.2e5, 1.7e5, 8.0e5, 8.0e5, 8.0e5, 8.0e5),
    "custom":        (False, 5.0e4, 1.0, 1.0e5, 2.0e4, None, None, None, None, None),
}


def schedule_factors(aug_type: str, image_iteration, bsz: int) -> Factors:
    """Curriculum factor formulas (augmenter.py:79-612), traced-scalar friendly."""
    (uses_1p5, freq_div, freq_cap, color_div, blur_div, add_div,
     mp_div, mn_div, cp_div, cn_div) = _SCHEDULES[aug_type]
    it = jnp.asarray(image_iteration, jnp.float32) / (
        bsz * 1.5 if uses_1p5 else bsz)
    freq = 0.05 + it / freq_div
    if freq_cap is not None:
        freq = jnp.minimum(freq, freq_cap)
    color = it / color_div
    dropout = 0.198667 + (0.03856658 - 0.198667) / (
        1.0 + (it / 196416.6) ** 1.863486)
    blur = 0.5 + 0.5 * it / blur_div
    zero = jnp.zeros_like(it)
    return Factors(
        freq=freq,
        color=color,
        dropout=dropout,
        blur=blur,
        add=(10.0 + 10.0 * it / add_div) if add_div else zero,
        mult_pos=(1.0 + 2.5 * it / mp_div) if mp_div else zero,
        mult_neg=(1.0 - 0.91 * it / mn_div) if mn_div else zero,
        con_pos=(1.0 + 0.5 * it / cp_div) if cp_div else zero,
        con_neg=(1.0 - 0.5 * it / cn_div) if cn_div else zero,
    )


def _sometimes(key, prob, images, aug_images):
    """imgaug Sometimes: per-image gate."""
    gate = jax.random.uniform(key, (images.shape[0],)) < prob
    return jnp.where(gate[:, None, None, None], aug_images, images)


def _u(key, b, lo, hi):
    return lo + (hi - lo) * jax.random.uniform(key, (b,))


def augment(rng: jax.Array, images: jnp.ndarray, image_iteration,
            aug_type: str = "medium", bsz: int = 32) -> jnp.ndarray:
    """Apply the curriculum pipeline to float images in [0, 1].

    images: (B, H, W, 3) or (B, T, H, W, 3) (time folded into batch).
    ``image_iteration`` may be a traced scalar (e.g. optimizer step * batch).
    """
    if aug_type in ("none", None):
        return images
    orig_shape = images.shape
    if images.ndim == 5:
        images = images.reshape(-1, *orig_shape[-3:])
    import os
    _bf16 = os.environ.get("PMOE_AUG_BF16", "1")
    if _bf16 == "force" or (_bf16 == "1"
                            and jax.default_backend() == "tpu"):
        # bf16 image compute on TPU: halves the HBM traffic of every pass
        # (blur, gates, fused chain, the barrier materialization and the
        # model's first cast). bf16 resolution at 1.0 (2^-8) is the same
        # order as the 8-bit source quantization (1/255), and the model
        # consumes the batch in bf16 anyway. PMOE_AUG_BF16=0 restores f32.
        images = images.astype(jnp.bfloat16)
    b = images.shape[0]
    zeros = jnp.zeros((b,), jnp.float32)

    if aug_type == "segmentation":
        x = images
        ks = jax.random.split(rng, 10)
        # imgaug 0.4.0 defaults (augmenter.py:57-76)
        x = _sometimes(ks[0], 0.3, x,
                       I.gaussian_blur(x, _u(ks[1], b, 0.0, 3.0)))
        x = _sometimes(ks[2], 0.3, x, I.additive_gaussian_noise(
            ks[3], x, _u(ks[3], b, 0.0, 15.0), 1.0))
        x = _sometimes(ks[4], 0.1, x, I.coarse_dropout(
            ks[5], x, _u(ks[5], b, 0.02, 0.1), _u(ks[4], b, 0.08, 0.2), 1.0))
        x = _sometimes(ks[6], 0.1, x, I.pixel_dropout(
            ks[7], x, _u(ks[7], b, 0.0, 0.05), 1.0))
        x = _sometimes(ks[8], 0.2, x, I.linear_contrast(
            ks[9], x, _u(ks[9], b, 0.6, 1.4), _u(ks[8], b, 0.6, 1.4), 1.0))
        return _finish(x, orig_shape, images.dtype)

    f = schedule_factors(aug_type, image_iteration, bsz)
    x = images
    ks = jax.random.split(rng, 18)

    # GaussianBlur((0, blur_factor))
    x = _sometimes(ks[0], f.freq, x,
                   I.gaussian_blur(x, _u(ks[1], b, 0.0, f.blur)))

    # Fused Pallas chain for everything after the blur (TPU default): one
    # pass over the batch with the hardware PRNG instead of ~6 threefry-bound
    # XLA ops. Measured on v5e it is parity with XLA's fused chain (13.2 vs
    # 13.3 ms at (256,224,224,3); stage-2 b64 step 233.5 vs 233.2 ms) — both
    # are VPU-bound on per-pixel randomness, and XLA fuses its chain well.
    # Kept as default for the single-pass memory profile; PMOE_FUSED_AUG=0
    # restores the op-by-op XLA path.
    from .aug_pallas import fused_augment_chain, pallas_aug_supported

    if os.environ.get("PMOE_FUSED_AUG", "1") == "1" \
            and pallas_aug_supported(b, x.shape[1] * x.shape[2], x.dtype):
        x = fused_augment_chain(
            ks[2], x, f,
            grayscale=aug_type not in ("super_hard", "custom"),
            custom=aug_type == "custom")
        return _finish(x, orig_shape, images.dtype)
    # AdditiveGaussianNoise(scale=(0, dropout), per_channel=color)
    x = _sometimes(ks[2], f.freq, x, I.additive_gaussian_noise(
        ks[3], x, _u(ks[4], b, zeros, f.dropout), f.color))
    if aug_type != "custom":
        # CoarseDropout((0, dropout), size_percent=(0.08, 0.2), per_channel=color)
        x = _sometimes(ks[5], f.freq, x, I.coarse_dropout(
            ks[6], x, _u(ks[7], b, zeros, f.dropout),
            _u(ks[6], b, 0.08, 0.2), f.color))
    # Dropout((0, dropout), per_channel=color)
    x = _sometimes(ks[8], f.freq, x, I.pixel_dropout(
        ks[9], x, _u(ks[10], b, zeros, f.dropout), f.color))
    if aug_type == "custom":
        # Add((-30, 30)), Multiply((0.9, 1.3), per_channel=True) (augmenter.py:503-531)
        x = _sometimes(ks[11], f.freq, x, I.add_brightness(
            ks[12], x, zeros - 30.0, zeros + 30.0, 0.0))
        x = _sometimes(ks[13], f.freq, x, I.multiply_brightness(
            ks[14], x, zeros + 0.9, zeros + 1.3, 1.0))
    else:
        # Add((-add, add), per_channel=color)
        x = _sometimes(ks[11], f.freq, x, I.add_brightness(
            ks[12], x, zeros - f.add, zeros + f.add, f.color))
        # Multiply((mult_neg, mult_pos), per_channel=color)
        x = _sometimes(ks[13], f.freq, x, I.multiply_brightness(
            ks[14], x, zeros + f.mult_neg, zeros + f.mult_pos, f.color))
        # LinearContrast((con_neg, con_pos), per_channel=color)
        x = _sometimes(ks[15], f.freq, x, I.linear_contrast(
            ks[16], x, zeros + f.con_neg, zeros + f.con_pos, f.color))
        if aug_type != "super_hard":
            # Grayscale((0, 1)) — active in medium/soft/high/medium_harder/
            # soft_harder; commented out in super_hard and custom
            # (reference augmenter.py:149,227,305,383,607 vs :465,:529)
            x = _sometimes(ks[17], f.freq, x, I.grayscale(ks[17], x, 0.0, 1.0))

    return _finish(x, orig_shape, images.dtype)

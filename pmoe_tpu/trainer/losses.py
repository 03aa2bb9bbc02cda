"""Loss functions (reference /root/reference/PMoE/trainer/loss.py), NHWC layout.

All losses are pure jittable functions. Per-class reductions are vectorized
one-hot contractions (no Python loop over 23 classes as in the reference's
``class_dice``); semantics match the reference bit-for-bit in fp32:

* ``class_dice`` / ``dice_score`` — per-class dice via argmax (loss.py:6-31).
* ``tversky_loss`` — alpha=beta=0.5 soft dice on softmax probs (loss.py:34-44).
* ``cross_entropy_tversky_weighted_loss`` — 0.5*CE(class-dice weights) +
  0.5*tversky, the stage-0 criterion (loss.py:47-55). Torch's weighted CE
  normalizes by the summed per-sample weights — replicated here.
* ``l1_gdl`` — L1 + gradient-difference on the last frame (loss.py:58-83).
* ``autoregressive_loss`` — per-future-frame sum, the stage-1 criterion
  (loss.py:86-118).
* ``moe_loss`` / ``punet_loss`` / ``pmoe_loss`` — stage-2 criteria
  (loss.py:121-151).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.distributions import MixtureOfGaussians

__all__ = [
    "class_dice", "dice_score", "tversky_loss",
    "cross_entropy_tversky_weighted_loss", "l1_gdl", "autoregressive_loss",
    "moe_loss", "punet_loss", "pmoe_loss", "get_criterion",
]


def _per_class_counts(pred_cls: jnp.ndarray, target: jnp.ndarray, num_classes: int):
    """inter, pred_count, target_count per class, each shape (C,)."""
    p = jax.nn.one_hot(pred_cls.reshape(-1), num_classes, dtype=jnp.float32)
    t = jax.nn.one_hot(target.reshape(-1), num_classes, dtype=jnp.float32)
    inter = jnp.sum(p * t, axis=0)
    return inter, jnp.sum(p, axis=0), jnp.sum(t, axis=0)


def class_dice(pred: jnp.ndarray, target: jnp.ndarray, epsilon: float = 1e-6):
    """Per-class dice LOSS (1 - dice), pred logits (..., H, W, C), target int (..., H, W)."""
    num_classes = pred.shape[-1]
    pred_cls = jnp.argmax(pred, axis=-1)
    inter, pc, tc = _per_class_counts(pred_cls, target, num_classes)
    d = 2.0 * (inter + epsilon) / (pc + tc + epsilon)
    return 1.0 - d


def dice_score(pred: jnp.ndarray, target: jnp.ndarray, epsilon: float = 1e-6):
    """Per-class dice SCORE."""
    num_classes = pred.shape[-1]
    pred_cls = jnp.argmax(pred, axis=-1)
    inter, pc, tc = _per_class_counts(pred_cls, target, num_classes)
    return 2.0 * (inter + epsilon) / (pc + tc + epsilon)


def tversky_loss(pred: jnp.ndarray, target: jnp.ndarray,
                 alpha: float = 0.5, beta: float = 0.5):
    """pred logits (B, H, W, C), target int (B, H, W).

    Reduction axes replicate the reference exactly (loss.py:41:
    ``dims = (0,) + tuple(range(2, target.ndimension()))`` on NCHW tensors):
    batch + all spatial axes EXCEPT the last — the W axis survives into the
    final mean alongside the class axis. Golden-tested against the recording.
    """
    num_classes = pred.shape[-1]
    probs = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
    t_oh = jax.nn.one_hot(target, num_classes, dtype=jnp.float32)
    axes = (0,) + tuple(range(1, target.ndim - 1))
    inter = jnp.sum(probs * t_oh, axis=axes)
    fps = jnp.sum(probs * (1.0 - t_oh), axis=axes)
    fns = jnp.sum((1.0 - probs) * t_oh, axis=axes)
    t = jnp.mean(inter / (inter + alpha * fps + beta * fns))
    return 1.0 - t


def _weighted_cross_entropy(pred: jnp.ndarray, target: jnp.ndarray,
                            class_weights: jnp.ndarray):
    """torch F.cross_entropy(weight=w, reduction='mean') semantics:
    sum_i(w[y_i] * nll_i) / sum_i(w[y_i])."""
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    num_classes = pred.shape[-1]
    t_oh = jax.nn.one_hot(target, num_classes, dtype=jnp.float32)
    nll = -jnp.sum(t_oh * logp, axis=-1)            # (..., H, W)
    # weight lookup as a one-hot contraction, NOT class_weights[target]: a
    # row gather over B*H*W indices is serial on TPU (measured 25 ms/step
    # of the stage-0 bench step, the single most expensive op); the matvec
    # rides the one-hot already computed for the nll and fuses away.
    w = t_oh @ class_weights                        # (..., H, W)
    return jnp.sum(w * nll) / jnp.clip(jnp.sum(w), 1e-12)


def cross_entropy_tversky_weighted_loss(pred, target, cross_entropy_weight=0.5,
                                        tversky_weight=0.5):
    if abs(cross_entropy_weight + tversky_weight - 1.0) > 1e-9:
        raise ValueError("Cross Entropy weight and Tversky weight should sum to 1")
    weights = class_dice(pred, target)
    ce = _weighted_cross_entropy(pred, target, weights)
    tv = tversky_loss(pred, target)
    return cross_entropy_weight * ce + tversky_weight * tv


def l1_gdl(inputs: jnp.ndarray, targets: jnp.ndarray):
    """L1 + gradient-difference loss on the LAST future frame.

    inputs: (B, T, H, W, C) logits; targets: (B, T, H, W) int
    (reference loss.py:58-83, from 'Predicting Deeper into the Future of
    Semantic Segmentation'). Note the reference compares the one-hot target's
    spatial gradients against the RAW logits' gradients — replicated.
    """
    num_classes = inputs.shape[-1]
    x = inputs[:, -1].astype(jnp.float32)                         # (B, H, W, C)
    t_oh = jax.nn.one_hot(targets[:, -1], num_classes, dtype=jnp.float32)

    def pad_bottom(a):
        return jnp.pad(a, ((0, 0), (0, 1), (0, 0), (0, 0)))

    def pad_right(a):
        return jnp.pad(a, ((0, 0), (0, 0), (0, 1), (0, 0)))

    tb, xb = pad_bottom(t_oh), pad_bottom(x)
    grad_h = jnp.abs(
        jnp.abs(tb[:, 1:, :, :] - tb[:, :-1, :, :])
        - jnp.abs(xb[:, 1:, :, :] - xb[:, :-1, :, :])
    )
    tr, xr = pad_right(t_oh), pad_right(x)
    grad_w = jnp.abs(
        jnp.abs(tr[:, :, :-1, :] - tr[:, :, 1:, :])
        - jnp.abs(xr[:, :, :-1, :] - xr[:, :, 1:, :])
    )
    gdl = jnp.mean(jnp.sum(grad_h + grad_w, axis=(1, 2)))
    l1 = jnp.mean(jnp.abs(x - t_oh))
    return l1 + gdl


def autoregressive_loss(inputs: jnp.ndarray, targets: jnp.ndarray,
                        loss_type: str = "tversky"):
    """Sum of per-future-frame losses with BPTT through the rollout
    (reference loss.py:86-118). inputs (B, T, H, W, C); targets (B, T, H, W) int."""
    n_frames = inputs.shape[1]
    num_classes = inputs.shape[-1]
    total = 0.0
    for t in range(n_frames):   # static, small (<= 6)
        x, y = inputs[:, t], targets[:, t]
        if loss_type == "tversky":
            total = total + cross_entropy_tversky_weighted_loss(x, y)
        elif loss_type == "l1":
            y_oh = jax.nn.one_hot(y, num_classes, dtype=jnp.float32)
            total = total + jnp.mean(jnp.abs(x.astype(jnp.float32) - y_oh))
        elif loss_type == "l2":
            y_oh = jax.nn.one_hot(y, num_classes, dtype=jnp.float32)
            total = total + jnp.mean(jnp.square(x.astype(jnp.float32) - y_oh))
        else:
            raise ValueError(
                f"Unknown loss type {loss_type}, supported ones are L1, L2, and tversky")
    return total


def moe_loss(action_dists: MixtureOfGaussians, speed_pred, actions_gt, speed_gt,
             loss_coefs: Sequence[float]):
    """0.7*NLL + 0.3*MSE(speed); speed_gt expands over the expert axis when the
    model emits per-expert speed predictions (reference loss.py:121-132)."""
    nll = -jnp.mean(action_dists.log_prob(actions_gt.astype(jnp.float32)))
    speed_pred = speed_pred.astype(jnp.float32)
    speed_gt = speed_gt.astype(jnp.float32)
    if speed_pred.ndim > 2:
        k = speed_pred.shape[1]
        speed_gt = jnp.broadcast_to(speed_gt[:, None, :], speed_pred.shape)
        speed_loss = jnp.mean(jnp.square(speed_pred - speed_gt)) / k
    else:
        speed_loss = jnp.mean(jnp.square(speed_pred - speed_gt))
    return loss_coefs[0] * nll + loss_coefs[1] * speed_loss


def punet_loss(actions, speed_pred, actions_gt, speed_gt,
               loss_coefs: Sequence[float]):
    """0.7*L1(action) + 0.3*MSE(speed) (reference loss.py:135-142)."""
    imitation = jnp.mean(jnp.abs(actions.astype(jnp.float32)
                                 - actions_gt.astype(jnp.float32)))
    speed_l = jnp.mean(jnp.square(speed_pred.astype(jnp.float32)
                                  - speed_gt.astype(jnp.float32)))
    return loss_coefs[0] * imitation + loss_coefs[1] * speed_l


def pmoe_loss(actions, speed_pred, actions_gt, speed_gt, loss_coefs=None):
    """L1(action) only (reference loss.py:145-151)."""
    return jnp.mean(jnp.abs(actions.astype(jnp.float32)
                            - actions_gt.astype(jnp.float32)))


def get_criterion(model_type: str):
    """Stage-2 criterion selection by model type (reference train_2.py:78-85)."""
    if model_type in ("moe", "moe_alt", "moe_shared"):
        return moe_loss
    if model_type in ("punet", "punet_inter"):
        return punet_loss
    if model_type in ("pmoe", "pmoe+pretrained"):
        return pmoe_loss
    raise ValueError(f"no criterion for model type {model_type!r}")

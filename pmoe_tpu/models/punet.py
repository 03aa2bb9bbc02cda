"""Predictive U-Net (PU-Net): autoregressive future-segmentation rollout.

TPU-native redesign of the reference ``PredictiveUnet``
(/root/reference/PMoE/model/punet.py:12-120):

* The four past frames are segmented by the frozen U-Net as ONE batched call
  (fold T into the batch) instead of a Python loop over frames — keeps the MXU fed.
* The autoregressive rollout is a single ``jax.lax.scan`` (``nn.scan``) over a
  rolling (B, T, H, W, 23) mask buffer — one XLA program regardless of
  ``future_frames``; during training each step is rematerialized (``nn.remat``)
  so BPTT through the rollout trades recompute for HBM.
* The frozen segmentation U-Net always runs in eval mode with
  ``stop_gradient`` on its outputs (the reference freezes params + ``.eval()``).

Pretrained U-Net weights are grafted into the ``unet`` sub-tree by the trainer
(see pmoe_tpu.utils.io.graft), not inside the module; ``model_name``/
``model_path`` are accepted for config-surface parity.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import EfficientConvBlock
from ..nn.unet import UNet

__all__ = ["PredictiveUNet"]

Dtype = Any


def _use_remat(flag, batch: int, future_frames: int, height: int) -> bool:
    """Rematerialize rollout steps during BPTT? Resolution order:
    PMOE_PUNET_REMAT env ("0"/"1") > explicit constructor bool > default ON.

    Measured (v5e, bs 10, T'=6, 224^2, bf16): the no-remat BPTT program
    requires 38.2 GB of HBM against 15.75 GB available — XLA's live set
    (padded packed-level-1 layouts, wgrad operands held to the backward)
    is ~25x a naive activation estimate, so skipping remat never fits at
    224^2 even at the reference batch 10. Remat stays the default; the
    env knob exists for small-resolution experiments.
    """
    env = os.environ.get("PMOE_PUNET_REMAT", "").strip()
    if env in ("0", "1"):
        return env == "1"
    if isinstance(flag, bool):
        return flag
    return True


class _RolloutCell(nn.Module):
    """One autoregressive step: mask window -> entry block -> pred U-Net -> next
    mask; carry is the rolling (B, T, H, W, K) window (oldest frame first)."""

    past_frames: int
    num_classes: int
    in_features: int
    gamma: int
    b: int
    inter_repr: bool
    train: bool
    dtype: Dtype
    param_dtype: Dtype

    @nn.compact
    def __call__(self, buf: jnp.ndarray, _x=None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        B, T, H, W, K = buf.shape
        # frame-major channel blocks — matches the reference's deque concat
        # along the channel dim (punet.py:103,111)
        stacked = jnp.moveaxis(buf, 1, 3).reshape(B, H, W, T * K)
        x = EfficientConvBlock(T * K, self.in_features, gamma=self.gamma,
                               b=self.b, name="entry_block", **kw)(stacked, self.train)
        # packed="auto": the W-pair-packed level 1 is a measured win inside
        # the rollout (+3.8% stage-1 step on v5e, PERF.md) though it
        # regresses the standalone stage-0 UNet.
        out = UNet(in_features=self.in_features, out_features=self.num_classes,
                   gamma=self.gamma, b=self.b, inter_repr=self.inter_repr,
                   packed="auto", name="pred_unet", **kw)(x, self.train)
        if self.inter_repr:
            inter, next_mask = out
        else:
            inter, next_mask = jnp.zeros((B, 1), self.dtype), out
        new_buf = jnp.concatenate([buf[:, 1:], next_mask[:, None]], axis=1)
        return new_buf, (next_mask, inter)


class PredictiveUNet(nn.Module):
    past_frames: int = 4
    future_frames: int = 4
    in_features: int = 3
    num_classes: int = 23
    gamma: int = 2
    b: int = 1
    inter_repr: bool = False
    unet_inter_repr: bool = False
    remat: Any = "auto"         # True | False | "auto"; PMOE_PUNET_REMAT wins
    model_name: str = "unet"    # config parity; weights grafted by trainer
    model_path: str = ""
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img_list: jnp.ndarray, train: bool = False,
                 seg_masks: jnp.ndarray | None = None, seg_only: bool = False):
        """img_list: (B, T, H, W, C) past frames.

        Returns (B, T', H, W, 23) future mask logits; or the 512-d bottleneck of
        the last rollout step when ``inter_repr``; or the current-frame mask /
        bottleneck when ``future_frames == 0`` (reference punet.py:93-98).

        ``seg_only=True`` runs ONLY the frozen segmentation U-Net over the given
        frames (any T) and returns the (B, T, H, W, K) mask logits; ``seg_masks``
        supplies precomputed masks so the segmentation pass is skipped. Together
        they let the DDPG fused trunk segment the 5-frame union of two
        overlapping 4-frame stacks once (models/rl_agent.py window path).
        """
        if not seg_only and seg_masks is None \
                and img_list.shape[1] != self.past_frames:
            raise ValueError(
                f"expected {self.past_frames} past frames, got {img_list.shape[1]}"
            )
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        B, T, H, W, C = img_list.shape

        seg_unet = UNet(in_features=self.in_features, out_features=self.num_classes,
                        gamma=self.gamma, b=self.b,
                        inter_repr=self.unet_inter_repr, packed="auto",
                        name="unet", **kw)

        if seg_masks is not None and not seg_only:
            if self.unet_inter_repr:
                raise ValueError("seg_masks is incompatible with unet_inter_repr "
                                 "(the pooled bottleneck is not precomputable)")
            masks = jax.lax.stop_gradient(seg_masks)
        else:
            # One batched segmentation pass over all frames (frozen, eval mode).
            seg_out = seg_unet(img_list.reshape(B * T, H, W, C), train=False)
            if self.unet_inter_repr:
                pooled, masks = seg_out
                pooled = jax.lax.stop_gradient(pooled).reshape(B, T, -1)
            else:
                masks = seg_out
            masks = jax.lax.stop_gradient(masks).reshape(
                B, T, H, W, self.num_classes)
        if seg_only:
            return masks

        if self.future_frames == 0:
            if self.unet_inter_repr:
                return pooled[:, -1]
            return masks[:, -1]

        cell_kwargs = dict(
            past_frames=self.past_frames,
            num_classes=self.num_classes,
            in_features=self.in_features,
            gamma=self.gamma,
            b=self.b,
            inter_repr=self.inter_repr,
            train=train,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="rollout",
        )
        if self.is_initializing():
            # Create params + batch_stats with ONE unscanned step; nn.scan's
            # variable_carry requires carried collections to exist beforehand.
            _, (mask1, inter1) = _RolloutCell(**cell_kwargs)(masks, None)
            outs = jnp.repeat(mask1[None], self.future_frames, axis=0)
            inters = jnp.repeat(inter1[None], self.future_frames, axis=0)
        else:
            cell_cls = (nn.remat(_RolloutCell, prevent_cse=False)
                        if train and _use_remat(self.remat, B,
                                                self.future_frames, H)
                        else _RolloutCell)
            # batch_stats are mutated (carried) only in train mode; in eval the
            # running stats are read-only and can be broadcast into the scan.
            scan_cls = nn.scan(
                cell_cls,
                variable_broadcast="params" if train else ("params", "batch_stats"),
                variable_carry="batch_stats" if train else False,
                split_rngs={"params": False, "dropout": True},
                in_axes=0,
                out_axes=0,
                length=self.future_frames,
            )
            _, (outs, inters) = scan_cls(**cell_kwargs)(masks, None)

        if self.inter_repr:
            return inters[-1]                     # bottleneck of last rollout step
        return jnp.moveaxis(outs, 0, 1)           # (B, T', H, W, K)

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

from ..nn.blocks import ECA, EfficientConvBlock, eca_kernel_size
from ..nn.unet import UNet

__all__ = ["PredictiveUNet"]

Dtype = Any


def _use_slots(flag, train: bool):
    """Which rollout-carry form? Resolution order: PMOE_ROLLOUT_SLOTS env
    ("0" deque / "1" channel-folded slots / "2" frame-slab slots) > explicit
    constructor value > context default (channel-folded for frozen/inference
    rollouts, frame-slab when training through the rollout).

    Both slot forms replace the deque shift (``concatenate(buf[:, 1:],
    new)``, lowered to HBM-bound pad/maximum + slice passes — ~37 ms/step in
    the stage-3 profile, tools/profile_stage3.py) with ONE
    ``dynamic_update_slice`` write at slot ``step % T`` plus a rotation of
    the entry block's ECA gate and first-conv input channels (tiny tensors):

    * ``True`` — channel-folded (B, H, W, T*K) carry: no per-step moveaxis,
      the gate multiply fuses into conv_0's input; the DUS read-modify-writes
      every (8,128) tile (the 23-channel slab is a sub-tile lane range and
      92 lanes pad to 128), which the saved transpose pass still beats.
    * ``"slab"`` — keeps the 5-D (B, T, H, W, K) carry and slots along the
      frame dim: the DUS writes one contiguous tile-aligned slab, no lane
      padding, but the entry block pays the deque path's fused
      moveaxis+gate pass.

    Measured on v5e (paired interleaved A/Bs, 4 windows each):

    | regime | deque | channel slots | slab slots |
    |---|---|---|---|
    | stage-3 learn (frozen rollout, b64) | 888 ms | **841-848 ms** | 847 ms |
    | stage-1 train step (BPTT+remat, bs 10) | 356 ms | 471 ms | **354 ms** |

    (logs/roundwork_slots_ab.log, _s1_ab.log, _slab_ab.log, _s1_slab.log.)
    The channel form loses under BPTT because every remat recompute re-pays
    the padded-lane RMW and the saved carries are full-buffer copies; the
    slab form's aligned writes are free of both.
    """
    env = os.environ.get("PMOE_ROLLOUT_SLOTS", "").strip()
    if env in ("0", "1", "2"):
        return {"0": False, "1": True, "2": "slab"}[env]
    if isinstance(flag, bool) or flag == "slab":
        return flag
    return "slab" if train else True


class _Param(nn.Module):
    """Declares one named param in its own scope so :class:`_SlotEntryBlock`'s
    variable tree is identical to ``EfficientConvBlock``'s (checkpoints and
    torch-converted weights interchange between the two rollout paths)."""

    pname: str
    shape: tuple
    param_dtype: Any

    @nn.compact
    def __call__(self):
        return self.param(self.pname, nn.initializers.lecun_normal(),
                          self.shape, self.param_dtype)


class _SlotEntryBlock(nn.Module):
    """``EfficientConvBlock`` evaluated on a slot-ordered (B, H, W, T*K)
    window (reference basics.py:79-134 semantics, identical variable tree).

    ``shift = step % T`` says how far the ring buffer's slot order is rotated
    from canonical oldest-first frame order. Only the ECA channel gate and the
    first conv's input-channel blocks are frame-order-sensitive, so the
    rotation is applied to those (a (B, T*K) vector and a 3x3xT*KxH kernel)
    rather than to the activation buffer. Numerics match the canonical path
    up to input-channel summation order in conv_0 (exact at shift == 0).
    """

    frames: int
    classes: int
    out_channels: int
    gamma: int = 2
    b: int = 1
    hidden: int = 64
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, buf: jnp.ndarray, shift, train: bool = False):
        T, K = self.frames, self.classes
        C = T * K

        def roll_blocks(v, r):
            blocks = v.reshape(v.shape[:-1] + (T, K))
            return jnp.roll(blocks, r, axis=-2).reshape(v.shape)

        k0 = eca_kernel_size(C, self.gamma, self.b)
        w_eca0 = _Param("conv_kernel", (k0, 1, 1), self.param_dtype,
                        name="eca_0")()
        w_conv0 = _Param("kernel", (3, 3, C, self.hidden), self.param_dtype,
                         name="conv_0")()

        if os.environ.get("PMOE_ECA0_IDENTITY", "0") == "1":
            # Measurement-only knob: delete the window ECA entirely (gate=1,
            # conv_0 reads the buffer directly). The paired A/B against the
            # default bounds the 'fused ECA-pool+gate+entry-conv window
            # pass' lever (PERF.md): a perfect fusion can at most remove
            # the gate pass this knob deletes. Never enable for training.
            x = buf
        else:
            # eca_0 in canonical frame order (mirrors ECA.__call__
            # cast-for-cast)
            pooled = jnp.mean(buf.astype(jnp.float32),
                              axis=(1, 2)).astype(self.dtype)
            pooled = roll_blocks(pooled, -shift)
            y = jax.lax.conv_general_dilated(
                pooled[:, :, None], w_eca0.astype(self.dtype), (1,),
                [(k0 // 2, k0 // 2)], dimension_numbers=("NWC", "WIO", "NWC"))
            gate = nn.sigmoid(y)[:, :, 0]
            gate = roll_blocks(gate, shift)          # back to slot order
            x = buf * gate[:, None, None, :].astype(buf.dtype)

        # conv_0 with input-channel blocks rotated into slot order:
        # w_slot[j] = w_canonical[(j - shift) % T]
        w0 = jnp.roll(w_conv0.reshape(3, 3, T, K, self.hidden), shift, axis=2)
        w0 = w0.reshape(3, 3, C, self.hidden)
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w0.astype(self.dtype), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn_0")(x)
        x = nn.relu(x)

        # the second half sees canonical channels — plain modules
        x = ECA(self.hidden, self.gamma, self.b, dtype=self.dtype,
                param_dtype=self.param_dtype, name="eca_1")(x)
        x = nn.Conv(self.out_channels, kernel_size=(3, 3), strides=(1, 1),
                    padding=1, use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn_1")(x)
        return nn.relu(x)


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
    mask. Two carry forms (identical variable tree, see ``_use_slots``):

    * ``slots=False`` — the rolling (B, T, H, W, K) deque (oldest frame
      first), shifted by ``concatenate`` each step;
    * ``slots=True`` — a fixed (B, H, W, T*K) channel-stacked ring buffer;
      ``step % T`` names the slot the new mask overwrites in place, and the
      entry block rotates its gate/weights instead of the data.
    """

    past_frames: int
    num_classes: int
    in_features: int
    gamma: int
    b: int
    inter_repr: bool
    train: bool
    dtype: Dtype
    param_dtype: Dtype
    slots: Any = False      # False | True (channel-folded) | "slab"

    @nn.compact
    def __call__(self, buf: jnp.ndarray, step):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        T, K = self.past_frames, self.num_classes
        if self.slots == "slab":
            # slot semantics on the 5-D carry: the new mask replaces slot
            # step%T along the frame dim (a contiguous, tile-aligned slab —
            # the channel-folded carry's DUS had to read-modify-write every
            # (8,128) tile because the 23-channel slab is a sub-tile lane
            # range), and the entry block rotates gate/weights as in the
            # channel-folded mode.
            B, _T, H, W, _K = buf.shape
            shift = jnp.mod(step.astype(jnp.int32), T)
            stacked = jnp.moveaxis(buf, 1, 3).reshape(B, H, W, T * K)
            x = _SlotEntryBlock(frames=T, classes=K,
                                out_channels=self.in_features,
                                gamma=self.gamma, b=self.b,
                                name="entry_block", **kw)(stacked, shift,
                                                          self.train)
        elif self.slots:
            B = buf.shape[0]
            shift = jnp.mod(step.astype(jnp.int32), T)
            x = _SlotEntryBlock(frames=T, classes=K,
                                out_channels=self.in_features,
                                gamma=self.gamma, b=self.b,
                                name="entry_block", **kw)(buf, shift, self.train)
        else:
            B, _T, H, W, _K = buf.shape
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
        if self.slots == "slab":
            new_buf = jax.lax.dynamic_update_slice(
                buf, next_mask.astype(buf.dtype)[:, None], (0, shift, 0, 0, 0))
        elif self.slots:
            new_buf = jax.lax.dynamic_update_slice(
                buf, next_mask.astype(buf.dtype), (0, 0, 0, shift * K))
        else:
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
    slot_carry: Any = "auto"    # True | False | "auto"; PMOE_ROLLOUT_SLOTS wins
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

        slots = _use_slots(self.slot_carry, train)
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
            slots=slots,
            name="rollout",
        )
        buf0 = masks
        if slots and slots != "slab":
            # fixed-slot ring buffer: channel-stacked, slot i starts holding
            # canonical frame i (shift 0 at step 0); "slab" keeps the 5-D
            # (B, T, H, W, K) carry and slots along the frame dim
            buf0 = jnp.moveaxis(masks, 1, 3).reshape(
                B, H, W, self.past_frames * self.num_classes)
        steps = jnp.arange(self.future_frames, dtype=jnp.int32)
        if self.is_initializing():
            # Create params + batch_stats with ONE unscanned step; nn.scan's
            # variable_carry requires carried collections to exist beforehand.
            _, (mask1, inter1) = _RolloutCell(**cell_kwargs)(buf0, steps[0])
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
            _, (outs, inters) = scan_cls(**cell_kwargs)(buf0, steps)

        if self.inter_repr:
            return inters[-1]                     # bottleneck of last rollout step
        return jnp.moveaxis(outs, 0, 1)           # (B, T', H, W, K)

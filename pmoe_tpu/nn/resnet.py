"""ResNet backbones (flax, NHWC) with the PMoE stem modification.

The reference takes torchvision resnet18/34/50 and (a) replaces the stride-2
7x7 stem conv with a stride-1 :class:`EfficientConvBlock` over the stacked
``n_frames * n_channels`` input, (b) forces the classifier to a 512-d output
(identity for 512-wide resnets, Linear(2048->512) for resnet50)
(/root/reference/PMoE/model/blocks/backbone.py:49-75). The stride-1 stem means
feature maps entering layer1 are 2x larger than stock ResNet — that is the
reference's behavior and is preserved.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from jax import lax
from flax import linen as nn

from .blocks import EfficientConvBlock
from .packed import (PackedBN as _PackedBN, PackedConv3 as _PackedConv3,
                     PackedECA as _PackedECA, pack_conv_kernel_w2,
                     use_packing as _use_packed_stem)

__all__ = ["ResNetBackbone", "RESNET_SPECS", "pack_conv_kernel_w2"]

Dtype = Any


# ---------------------------------------------------------------------------
# W-pair-packed stem (TPU fast path)
#
# Measured on v5e: a 3x3 stride-1 conv at (192,224,224,64) runs at 54 TF/s,
# while the same conv with 128 channels runs at 164 TF/s — the 64-channel
# (and 12-channel) activations pad their lane dimension to 128, wasting half
# of every vector register, half of HBM bandwidth, and half of the MXU's K/N
# tiles. The stem (reference-mandated stride-1 EfficientConvBlock at 224^2,
# backbone.py:63-65) dominates the stage-2 step at <10% MFU because of it.
#
# Fix: fold adjacent W-pixel pairs into the channel dimension —
# x_p[b,h,w2,r*C+c] = x[b,h,2*w2+r,c] (a free reshape: W and C are adjacent
# in NHWC). A 3x3 conv on the original tensor becomes a 3x3 conv on the
# packed tensor with a block-structured (2C -> 2Cout) kernel (6 of 12 blocks
# nonzero, i.e. 2x the MACs) that XLA runs at ~3x the throughput; every
# BatchNorm / ReLU / ECA pass moves half the bytes. The transform is exact:
# BN statistics fold across the two halves (equal pixel counts), the ECA
# mean folds the same way, and the 3x3/2 maxpool consumes the packing
# naturally (its W-window spans exactly the two halves plus one neighbor).
#
# Parameters are IDENTICAL to the unpacked path: the shell modules below
# declare the same param/collection tree (stem/{eca_i,conv_i,bn_i}, bn1) with
# the same initializers, so checkpoints are interchangeable and goldens
# validate both paths.
# ---------------------------------------------------------------------------


class _PackedStem(nn.Module):
    """W-pair-packed EfficientConvBlock (param tree identical to the
    unpacked ``EfficientConvBlock``; reference basics.py:79-134)."""

    in_channels: int
    out_channels: int
    gamma: int = 2
    b: int = 1
    hidden: int = 64
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp: jnp.ndarray, train: bool = False,
                 defer_last_bn: bool = False):
        """``defer_last_bn=True`` stops after the last conv and returns
        ``(raw conv output, bn_1 affine [3, 2C])`` so the caller can fuse
        the trailing BN+ReLU epilogues into the Pallas pool kernel. The
        param/stat tree is identical to the normal path."""
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        for i, (c_in, c_out) in enumerate(
            [(self.in_channels, self.hidden),
             (self.hidden, self.out_channels)]
        ):
            xp = _PackedECA(c_in, self.gamma, self.b, name=f"eca_{i}",
                            **kw)(xp)
            xp = _PackedConv3(c_in, c_out, name=f"conv_{i}", **kw)(xp)
            if defer_last_bn and i == 1:
                aff = _PackedBN(c_out, name=f"bn_{i}", **kw)(
                    xp, train, affine_only=True)
                return xp, aff
            xp = _PackedBN(c_out, name=f"bn_{i}", **kw)(xp, train)
            xp = nn.relu(xp)
        return xp


def _packed_maxpool_3x3s2(xp: jnp.ndarray, C: int) -> jnp.ndarray:
    """3x3 stride-2 pad-1 maxpool consuming a W-pair-packed tensor.

    Output column w' spans original columns 2w'-1, 2w', 2w'+1 — i.e. packed
    (w'-1, parity 1), (w', parity 0), (w', parity 1) — so the result is
    naturally unpacked: (B, H, W2, 2C) -> (B, H//2, W2, C)."""
    r0, r1 = xp[..., :C], xp[..., C:]
    left_r1 = jnp.pad(r1[:, :, :-1, :], ((0, 0), (0, 0), (1, 0), (0, 0)),
                      constant_values=-jnp.inf)
    wmax = jnp.maximum(jnp.maximum(left_r1, r0), r1)
    # H window 3 / stride 2 / pad 1. Measured (stage-2 step, v5e): strided
    # H-slices + elementwise max looked cheaper on paper but regressed the
    # step 224.7 -> 267.5 ms; reduce_window wins. NB: init MUST be the -inf
    # scalar literal — a concrete array init falls off the monoid fast path
    # onto the generic primitive, which has no transpose rule.
    return lax.reduce_window(
        wmax, -jnp.inf, lax.max, (1, 3, 1, 1), (1, 2, 1, 1),
        ((0, 0), (1, 1), (0, 0), (0, 0)))


class _PackedBasicBlock(nn.Module):
    """Stride-1 BasicBlock on a W-pair-packed tensor (param tree identical
    to ``_BasicBlock``). Used for layer1 (64 channels: half-empty lanes
    unpacked), where input/output shapes match so there is no downsample."""

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        C = self.features
        y = _PackedConv3(C, C, name="conv1", **kw)(xp)
        y = nn.relu(_PackedBN(C, name="bn1", **kw)(y, train))
        y = _PackedConv3(C, C, name="conv2", **kw)(y)
        y = _PackedBN(C, name="bn2", **kw)(y, train)
        return nn.relu(y + xp)


class _PackedConsumeConv3s2(nn.Module):
    """3x3 stride-2 conv that CONSUMES a W-pair-packed input and emits the
    canonical layout. Output col w' reads orig cols 2w'-1..2w'+1 = packed
    (w'-1, parity 1), (w', parity 0), (w', parity 1): a 2-tap conv over W2
    with a (kh, 2, 2C, Co) block kernel; H strides 2 normally. Declares the
    canonical (3, 3, C, Co) ``kernel`` param."""

    in_channels: int
    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp: jnp.ndarray) -> jnp.ndarray:
        C, Co = self.in_channels, self.features
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, C, Co), self.param_dtype)
        wp = jnp.zeros((3, 2, 2 * C, Co), w.dtype)
        wp = wp.at[:, 0, C:, :].set(w[:, 0])      # kw=-1 -> (w'-1, parity 1)
        wp = wp.at[:, 1, :C, :].set(w[:, 1])      # kw=0  -> (w',  parity 0)
        wp = wp.at[:, 1, C:, :].set(w[:, 2])      # kw=+1 -> (w',  parity 1)
        return lax.conv_general_dilated(
            xp.astype(self.dtype), wp.astype(self.dtype), (2, 1),
            [(1, 1), (1, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _PackedEntryBasicBlock(nn.Module):
    """The stride-2 BasicBlock at a packed->canonical transition (layer2_0):
    conv1 and the 1x1 downsample consume the packing (a 1x1 stride-2 conv
    reads only parity-0 columns, i.e. the r0 half), everything downstream is
    canonical. Param tree identical to ``_BasicBlock`` with stride 2."""

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       name=name, **kw)
        C = xp.shape[-1] // 2
        y = _PackedConsumeConv3s2(C, self.features, name="conv1", **kw)(xp)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv2", **kw)(y)
        y = bn("bn2")(y)
        residual = nn.Conv(self.features, (1, 1), strides=(2, 1),
                           use_bias=False, name="downsample_conv",
                           **kw)(xp[..., :C])
        residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


RESNET_SPECS = {
    "resnet18": {"block": "basic", "layers": (2, 2, 2, 2), "width": 512},
    "resnet34": {"block": "basic", "layers": (3, 4, 6, 3), "width": 512},
    "resnet50": {"block": "bottleneck", "layers": (3, 4, 6, 3), "width": 2048},
}


class _BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5, name=name, **kw)
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, name="conv1", **kw)(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv2", **kw)(y)
        y = bn("bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv", **kw)(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class _Bottleneck(nn.Module):
    features: int          # bottleneck width; output is 4x
    stride: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5, name=name, **kw)
        out_features = self.features * 4
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1", **kw)(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, name="conv2", **kw)(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(out_features, (1, 1), use_bias=False, name="conv3", **kw)(y)
        y = bn("bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(out_features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv", **kw)(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """ResNet with EfficientConvBlock stem and 512-d output head."""

    arch: str = "resnet18"
    in_channels: int = 12          # n_frames * n_channels
    gamma: int = 2
    b: int = 1
    out_dim: int = 512
    packed_stem: Any = None        # None=auto (PMOE_PACKED_STEM / TPU)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        spec = RESNET_SPECS[self.arch.lower()]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        block_cls = _BasicBlock if spec["block"] == "basic" else _Bottleneck

        # Stem: ECA conv entry fusing stacked frames (stride 1). The reference
        # replaces ONLY torchvision's conv1 (backbone.py:63-65), so the
        # original bn1 + ReLU still run after it, then maxpool.
        packed_layer1 = False
        if _use_packed_stem(self.packed_stem, x.shape[2]):
            B, H, W, Cin = x.shape
            xp = x.reshape(B, H, W // 2, 2 * Cin)      # free: W,C adjacent
            # Stay packed through layer1 (64 channels = half-empty lanes
            # unpacked) when the pooled width still splits evenly; the
            # repack is a free reshape (W, C adjacent). At production
            # shapes on TPU the pool itself is a fused Pallas kernel
            # (packed in -> packed out, one pass each way), and the two
            # trailing BN+ReLU epilogues (stem bn_1 + torchvision bn1) are
            # applied inside it so their full-resolution outputs are never
            # materialized: BN statistics stay in XLA (reductions over the
            # raw conv output / its recomputed relu image), the kernel gets
            # the folded per-channel affines.
            from ..ops.pool_pallas import (fused_packed_pool,
                                           fused_packed_pool_bn,
                                           pallas_pool_bn_supported,
                                           pallas_pool_supported)
            packed_layer1 = (spec["block"] == "basic"
                             and (x.shape[2] // 2) % 2 == 0)
            pool_shape = (B, H, W // 2, 128)
            if packed_layer1 and pallas_pool_bn_supported(pool_shape):
                y, aff0 = _PackedStem(self.in_channels, 64, gamma=self.gamma,
                                      b=self.b, name="stem", **kw)(
                                          xp, train, defer_last_bn=True)
                # bn1's batch statistics read the recomputed bn_1+relu
                # image of y (fuses into the stat reduction; never stored)
                t1x = nn.relu(
                    ((y.astype(jnp.float32) - aff0[0]) * aff0[1]
                     + aff0[2]).astype(y.dtype))
                aff1 = _PackedBN(64, name="bn1", **kw)(
                    t1x, train, affine_only=True)
                x = fused_packed_pool_bn(y, jnp.stack([aff0, aff1]))
            else:
                xp = _PackedStem(self.in_channels, 64, gamma=self.gamma,
                                 b=self.b, name="stem", **kw)(xp, train)
                xp = nn.relu(_PackedBN(64, name="bn1", **kw)(xp, train))
                if packed_layer1 and pallas_pool_supported(xp.shape):
                    x = fused_packed_pool(xp)
                else:
                    x = _packed_maxpool_3x3s2(xp, 64)
                    if packed_layer1:
                        Bp, Hp, Wp, Cp = x.shape
                        x = x.reshape(Bp, Hp, Wp // 2, 2 * Cp)
        else:
            x = EfficientConvBlock(self.in_channels, 64, gamma=self.gamma,
                                   b=self.b, name="stem", **kw)(x, train)
            x = nn.relu(nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5, name="bn1",
                                     **kw)(x))
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))

        widths = (64, 128, 256, 512)
        for stage, (w, n_blocks) in enumerate(zip(widths, spec["layers"])):
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                name = f"layer{stage + 1}_{i}"
                if packed_layer1 and stage == 0:
                    x = _PackedBasicBlock(w, name=name, **kw)(x, train)
                elif packed_layer1 and stage == 1 and i == 0:
                    # stride-2 entry consumes the packing -> canonical
                    x = _PackedEntryBasicBlock(w, name=name, **kw)(x, train)
                else:
                    x = block_cls(w, stride=stride, name=name, **kw)(x, train)

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(self.dtype)
        if spec["width"] != self.out_dim:
            x = nn.Dense(self.out_dim, name="fc", **kw)(x)
        return x

"""MobileNet V2 / V3 backbones (flax, NHWC) with the PMoE stem modification.

The reference swaps ``features[0][0]`` of torchvision mobilenet_v2 /
mobilenet_v3_{small,large} for an :class:`EfficientConvBlock` over the stacked
frame channels and forces the classifier to 512-d
(/root/reference/PMoE/model/blocks/backbone.py:78-104). Architecture specs
follow the MobileNetV2 (arXiv:1801.04381) and MobileNetV3 (arXiv:1905.02244)
papers. As with the ResNet variant, the replaced stem is stride-1.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import EfficientConvBlock

__all__ = ["MobileNetBackbone"]

Dtype = Any


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: str = "relu6"          # relu6 | relu | hswish | none
    bn_eps: float = 1e-3        # torchvision: 1e-3 for v3, 1e-5 for v2
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    feature_group_count=self.groups, use_bias=False, **kw)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=self.bn_eps, **kw)(x)
        if self.act == "relu6":
            x = nn.relu6(x)
        elif self.act == "relu":            # torchvision v3's "RE" blocks
            x = nn.relu(x)
        elif self.act == "hswish":
            x = hard_swish(x)
        return x


class _SqueezeExcite(nn.Module):
    channels: int
    squeeze_factor: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        squeeze = _make_divisible(self.channels // self.squeeze_factor)
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(self.dtype)
        y = nn.relu(nn.Dense(squeeze, **kw)(y))
        y = hard_sigmoid(nn.Dense(self.channels, **kw)(y))
        return x * y[:, None, None, :]


class _InvertedResidual(nn.Module):
    """MobileNet inverted-residual block: expand 1x1 -> depthwise kxk -> (SE) ->
    project 1x1, with skip when stride 1 and shapes match."""

    in_ch: int
    out_ch: int
    expand_ch: int
    kernel: int = 3
    stride: int = 1
    use_se: bool = False
    act: str = "relu6"
    bn_eps: float = 1e-3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(bn_eps=self.bn_eps, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        y = x
        if self.expand_ch != self.in_ch:
            y = _ConvBNAct(self.expand_ch, 1, act=self.act, name="expand", **kw)(y, train)
        y = _ConvBNAct(self.expand_ch, self.kernel, self.stride,
                       groups=self.expand_ch, act=self.act, name="depthwise", **kw)(y, train)
        if self.use_se:
            y = _SqueezeExcite(self.expand_ch, name="se",
                               dtype=self.dtype,
                               param_dtype=self.param_dtype)(y)
        y = _ConvBNAct(self.out_ch, 1, act="none", name="project", **kw)(y, train)
        if self.stride == 1 and self.in_ch == self.out_ch:
            y = y + x
        return y


# (out_ch, expand_ratio, stride) per MobileNetV2 paper Table 2, expanded per repeat
_V2_BLOCKS = [
    (16, 1, 1),
    (24, 6, 2), (24, 6, 1),
    (32, 6, 2), (32, 6, 1), (32, 6, 1),
    (64, 6, 2), (64, 6, 1), (64, 6, 1), (64, 6, 1),
    (96, 6, 1), (96, 6, 1), (96, 6, 1),
    (160, 6, 2), (160, 6, 1), (160, 6, 1),
    (320, 6, 1),
]

# (kernel, expand_ch, out_ch, use_se, act, stride) — MobileNetV3 paper Tables 1-2
_V3_LARGE_BLOCKS = [
    (3, 16, 16, False, "relu", 1),
    (3, 64, 24, False, "relu", 2), (3, 72, 24, False, "relu", 1),
    (5, 72, 40, True, "relu", 2), (5, 120, 40, True, "relu", 1),
    (5, 120, 40, True, "relu", 1),
    (3, 240, 80, False, "hswish", 2), (3, 200, 80, False, "hswish", 1),
    (3, 184, 80, False, "hswish", 1), (3, 184, 80, False, "hswish", 1),
    (3, 480, 112, True, "hswish", 1), (3, 672, 112, True, "hswish", 1),
    (5, 672, 160, True, "hswish", 2), (5, 960, 160, True, "hswish", 1),
    (5, 960, 160, True, "hswish", 1),
]

_V3_SMALL_BLOCKS = [
    (3, 16, 16, True, "relu", 2),
    (3, 72, 24, False, "relu", 2), (3, 88, 24, False, "relu", 1),
    (5, 96, 40, True, "hswish", 2), (5, 240, 40, True, "hswish", 1),
    (5, 240, 40, True, "hswish", 1),
    (5, 120, 48, True, "hswish", 1), (5, 144, 48, True, "hswish", 1),
    (5, 288, 96, True, "hswish", 2), (5, 576, 96, True, "hswish", 1),
    (5, 576, 96, True, "hswish", 1),
]


class MobileNetBackbone(nn.Module):
    """MobileNet v2 / v3_small / v3_large with ECA-conv stem and 512-d head."""

    arch: str = "mobilenet_v3_small"
    in_channels: int = 12
    gamma: int = 2
    b: int = 1
    out_dim: int = 512
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        arch = self.arch.lower()
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        if arch == "mobilenet_v2":
            stem_ch, blocks = 32, _V2_BLOCKS
        elif arch == "mobilenet_v3_large":
            stem_ch, blocks = 16, _V3_LARGE_BLOCKS
        else:
            stem_ch, blocks = 16, _V3_SMALL_BLOCKS

        # reference: ONLY features[0][0] (the conv) is replaced by the
        # EfficientConvBlock (backbone.py:92-97) — torchvision's stem BN and
        # activation (Hardswish for v3, ReLU6 for v2) still follow it
        x = EfficientConvBlock(self.in_channels, stem_ch, gamma=self.gamma,
                               b=self.b, name="stem", **kw)(x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5 if arch == "mobilenet_v2" else 1e-3,
                         name="stem_bn", **kw)(x)
        x = nn.relu6(x) if arch == "mobilenet_v2" else hard_swish(x)

        in_ch = stem_ch
        if arch == "mobilenet_v2":
            for i, (out_ch, t, stride) in enumerate(blocks):
                x = _InvertedResidual(in_ch, out_ch, expand_ch=in_ch * t,
                                      stride=stride, bn_eps=1e-5,
                                      name=f"block_{i}", **kw)(x, train)
                in_ch = out_ch
            x = _ConvBNAct(1280, 1, bn_eps=1e-5, name="head_conv", **kw)(x, train)
            x = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(self.dtype)
            x = nn.Dense(self.out_dim, name="classifier", **kw)(x)
        else:
            for i, (k, exp, out_ch, se, act, stride) in enumerate(blocks):
                x = _InvertedResidual(in_ch, out_ch, expand_ch=exp, kernel=k,
                                      stride=stride, use_se=se, act=act,
                                      name=f"block_{i}", **kw)(x, train)
                in_ch = out_ch
            last = 960 if arch == "mobilenet_v3_large" else 576
            x = _ConvBNAct(last, 1, act="hswish", name="head_conv", **kw)(x, train)
            x = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(self.dtype)
            penult = 1280 if arch == "mobilenet_v3_large" else 1024
            x = hard_swish(nn.Dense(penult, name="pre_classifier", **kw)(x))
            x = nn.Dense(self.out_dim, name="classifier", **kw)(x)
        return x

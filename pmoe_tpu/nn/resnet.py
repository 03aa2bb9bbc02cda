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

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import EfficientConvBlock

__all__ = ["ResNetBackbone", "RESNET_SPECS"]

Dtype = Any

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
        x = EfficientConvBlock(self.in_channels, 64, gamma=self.gamma,
                               b=self.b, name="stem", **kw)(x, train)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name="bn1", **kw)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        widths = (64, 128, 256, 512)
        for stage, (w, n_blocks) in enumerate(zip(widths, spec["layers"])):
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = block_cls(w, stride=stride,
                              name=f"layer{stage + 1}_{i}", **kw)(x, train)

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(self.dtype)
        if spec["width"] != self.out_dim:
            x = nn.Dense(self.out_dim, name="fc", **kw)(x)
        return x

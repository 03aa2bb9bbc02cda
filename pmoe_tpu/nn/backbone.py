"""Visual backbone factory (reference /root/reference/PMoE/model/blocks/backbone.py).

``get_backbone`` builds the RGB CNN (resnet18/34/50, mobilenet_v2/v3_small/
v3_large) with the EfficientConvBlock stem over stacked frames and a 512-d
output (backbone.py:13-26). ``SegmentationBackbone`` is the ``get_unet``
alternative (backbone.py:28-45): a (usually pretrained) U-Net with
``inter_repr=True`` behind an EfficientConvBlock(n_frames*n_channels -> 3)
entry; pretrained weights are grafted in at checkpoint-restore time by the
caller (JAX modules are pure, so weight loading lives outside the module).

``pretrained=True`` is honored at the trainer level: JAX modules are pure, so
ImageNet weights (an exported torchvision state_dict at
``backbone.rgb.weights_path``) are grafted into the initialized params by
``pmoe_tpu.utils.torch_compat.load_pretrained_backbone`` (see
trainer/train_2.py). The module itself carries no weight-loading state.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import EfficientConvBlock
from .resnet import ResNetBackbone, RESNET_SPECS
from .mobilenet import MobileNetBackbone
from .unet import UNet

__all__ = ["get_backbone", "SegmentationBackbone"]

Dtype = Any


class TinyBackbone(nn.Module):
    """Minimal 3-stage CNN -> 512-d head. Not in the reference zoo; a
    framework-native debug/smoke backbone (fast compiles, tiny params) selected
    with ``arch: tiny``."""

    in_channels: int = 12
    out_dim: int = 512
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        for i, feat in enumerate((16, 32, 64)):
            x = nn.Conv(feat, (3, 3), strides=(2, 2), padding=1,
                        use_bias=False, name=f"conv_{i}", **kw)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn_{i}", **kw)(x)
            x = nn.relu(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(self.dtype)
        return nn.Dense(self.out_dim, name="fc", **kw)(x)


def get_backbone(
    arch: str = "resnet18",
    n_frames: int = 4,
    pretrained: bool = False,   # weights grafted by the trainer; see module docstring
    gamma: int = 2,
    b: int = 1,
    n_channels: int = 3,
    dtype: Dtype = jnp.float32,
    param_dtype: Dtype = jnp.float32,
) -> nn.Module:
    arch_l = arch.lower()
    in_channels = n_frames * n_channels
    if arch_l == "tiny":
        return TinyBackbone(in_channels=in_channels, dtype=dtype,
                            param_dtype=param_dtype)
    if arch_l in RESNET_SPECS:
        return ResNetBackbone(arch=arch_l, in_channels=in_channels, gamma=gamma,
                              b=b, dtype=dtype, param_dtype=param_dtype)
    if "mobilenet" in arch_l:
        return MobileNetBackbone(arch=arch_l, in_channels=in_channels, gamma=gamma,
                                 b=b, dtype=dtype, param_dtype=param_dtype)
    raise ValueError(f"Unknown backbone arch {arch!r}")


class SegmentationBackbone(nn.Module):
    """EfficientConvBlock(T*C -> 3) entry feeding a U-Net with inter_repr=True;
    forward returns the 512-d pooled bottleneck (reference backbone.py:28-45)."""

    n_frames: int = 4
    n_channels: int = 3
    gamma: int = 2
    b: int = 1
    model_dir: str = ""         # kept for config parity; grafting happens outside
    inter_repr: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = EfficientConvBlock(self.n_frames * self.n_channels, 3,
                               gamma=self.gamma, b=self.b, name="entry", **kw)(x, train)
        pooled, _logits = UNet(gamma=self.gamma, b=self.b, inter_repr=True,
                               name="unet", **kw)(x, train)
        return pooled

"""Core neural building blocks (flax.linen, NHWC, bf16-compute friendly).

TPU-native re-implementations of the reference primitives
(/root/reference/PMoE/model/blocks/basics.py):

* :class:`MLP`       — ``make_mlp`` semantics (basics.py:10-44): ``bias = not bn``,
  BN/act/dropout between layers but not after the last unless ``l_act``.
* :class:`ConvBlock3`— ``conv3`` (basics.py:47-58): (Conv3x3 -> BN -> ReLU) x2, bias-free.
* :class:`ECA`       — ``EfficientBlock`` (basics.py:61-76): Efficient Channel
  Attention with the kernel-size formula ``t = int(|log2(C)+b| / gamma)``, forced odd.
* :class:`EfficientConvBlock` — two ECA+Conv3x3+BN+ReLU stages (basics.py:79-134).

Layout is NHWC (TPU-native); BatchNorm matches torch defaults
(eps=1e-5, running-stat momentum 0.1 -> flax momentum 0.9); Dropout2d becomes a
channel-broadcast dropout.
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bn_frozen_stats() -> bool:
    """Measurement-only knob (``PMOE_BN_FROZEN_STATS=1``): run every
    ConvBlock3 BatchNorm on its running statistics even in train mode,
    deleting the batch-stat forward reduction AND its backward reduces.
    This bounds the 'Pallas BN-epilogue backward fusion' lever (PERF.md):
    no fusion can recover more than this wholesale deletion, so the paired
    A/B against the default is the lever's upper bound. Never enable for
    real training — statistics stop updating."""
    return os.environ.get("PMOE_BN_FROZEN_STATS", "0") == "1"

__all__ = ["MLP", "ConvBlock3", "ECA", "EfficientConvBlock", "eca_kernel_size",
           "get_activation"]

Dtype = Any


def get_activation(name: str) -> Callable:
    return {
        "relu": nn.relu,
        "tanh": jnp.tanh,
        "sigmoid": nn.sigmoid,
        "elu": nn.elu,
    }[name.lower()]


def eca_kernel_size(channels: int, gamma: int = 2, b: int = 1) -> int:
    """ECA 1-D conv kernel size: ``t = int(|log2(C) + b| / gamma)``, forced odd
    (reference basics.py:66-68)."""
    t = int(abs((math.log2(channels) + b) / gamma))
    return t if t % 2 else t + 1


class MLP(nn.Module):
    """Linear stack with optional BatchNorm/activation/dropout.

    ``dims=[in, h1, ..., out]``; each Linear has ``use_bias = not bn``; BN + act
    + dropout follow every layer except the last; ``l_act`` appends the
    activation after the last layer (reference basics.py:10-44).
    """

    dims: Sequence[int]
    act: str = "relu"
    l_act: bool = False
    bn: bool = True
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        activation = get_activation(self.act)
        n_layers = len(self.dims) - 1
        for i, out_dim in enumerate(self.dims[1:]):
            x = nn.Dense(
                out_dim,
                use_bias=not self.bn,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=self.kernel_init,
                name=f"dense_{i}",
            )(x)
            if i != n_layers - 1:
                if self.bn:
                    x = nn.BatchNorm(
                        use_running_average=not train,
                        momentum=0.9,
                        epsilon=1e-5,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"bn_{i}",
                    )(x)
                x = activation(x)
                if self.dropout > 0.0:
                    x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        if self.l_act:
            x = activation(x)
        return x


class ConvBlock3(nn.Module):
    """(Conv3x3 -> BN -> ReLU) x 2, bias-free convs (reference basics.py:47-58)."""

    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(2):
            x = nn.Conv(
                self.features,
                kernel_size=(3, 3),
                strides=(self.stride, self.stride),
                padding=1,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=self.kernel_init,
                name=f"conv_{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train or _bn_frozen_stats(),
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"bn_{i}",
            )(x)
            x = nn.relu(x)
        return x


class ECA(nn.Module):
    """Efficient Channel Attention (reference basics.py:61-76).

    Global average pool over H,W -> 1-D conv across the channel axis (kernel
    size from :func:`eca_kernel_size`) -> sigmoid gate -> channel-wise rescale.
    The conv across channels is expressed as a (B, C, 1) NWC convolution so XLA
    fuses pool+conv+gate into the surrounding graph.
    """

    channels: int
    gamma: int = 2
    b: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = eca_kernel_size(self.channels, self.gamma, self.b)
        w = self.param(
            "conv_kernel",
            nn.initializers.lecun_normal(),
            (k, 1, 1),
            self.param_dtype,
        )
        # XLA's fused pool + conv1d + sigmoid + scale is the measured best
        # here: a standalone Pallas ECA kernel was built, hardware-validated
        # and DELETED (round 3) — its serial-DMA form trailed XLA 79 vs
        # 41 ms / 50 iters at (8,56,56,512) and two passes over x is the
        # bandwidth floor both already hit (PERF.md round-3 entry).
        # x: (B, H, W, C) -> squeeze: (B, C)
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(self.dtype)
        # channel axis treated as the spatial axis of a width-C, 1-feature conv
        y = jax.lax.conv_general_dilated(
            y[:, :, None],
            w.astype(self.dtype),
            window_strides=(1,),
            padding=[(k // 2, k // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        gate = nn.sigmoid(y)[:, None, :, 0]          # (B, 1, C) -> (B,1,1,C)
        return x * gate[:, :, None, :].astype(x.dtype)


class EfficientConvBlock(nn.Module):
    """ECA -> Conv3x3(->64) -> BN -> ReLU, then ECA -> Conv3x3(->out) -> BN -> ReLU
    (reference basics.py:79-134). Used to fuse stacked T*C frame channels."""

    in_channels: int
    out_channels: int
    stride: int = 1
    gamma: int = 2
    b: int = 1
    hidden: int = 64
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, (c_in, c_out) in enumerate(
            [(self.in_channels, self.hidden), (self.hidden, self.out_channels)]
        ):
            x = ECA(c_in, self.gamma, self.b, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"eca_{i}")(x)
            x = nn.Conv(
                c_out,
                kernel_size=(3, 3),
                strides=(self.stride, self.stride),
                padding=1,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=self.kernel_init,
                name=f"conv_{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"bn_{i}",
            )(x)
            x = nn.relu(x)
        return x

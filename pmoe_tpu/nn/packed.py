"""W-pair-packed building blocks (TPU fast path).

Measured on v5e: a 3x3 stride-1 conv at 64 channels runs at ~54 TF/s while
the same conv at 128 channels runs at ~164 TF/s — 64-channel (and smaller)
activations pad their lane dimension to 128, wasting half of every vector
register, half of HBM bandwidth, and half of the MXU's K/N tiles. Folding
adjacent W-pixel pairs into the channel dimension (a FREE reshape in NHWC:
W and C are adjacent) fixes the layout: x_p[b,h,w2,r*C+c] = x[b,h,2*w2+r,c].
A 3x3 conv becomes a 3x3 conv with a block-structured (2C -> 2Co) kernel
(2x structural-zero MACs at ~3x the throughput), and every BatchNorm /
ReLU / ECA / elementwise pass moves half the bytes.

The transform is exact and parameter-compatible: every module here
declares the same param/collection tree (same names, shapes, inits) as its
canonical counterpart, so checkpoints interchange and goldens validate
both paths (tests/test_blocks.py). BN statistics and the ECA mean fold
exactly across the two halves (equal pixel counts).

Used by nn/resnet.py (stem + layer1 + stride-2 layer2 entry; see also the
fused Pallas pool in ops/pool_pallas.py) and nn/unet.py (level-1 encoder/
decoder + segmentation head). Reference semantics: PMoE/model/blocks/
basics.py:47-58,79-134, unet.py:8-95, backbone.py:49-104.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from flax import linen as nn

from .blocks import eca_kernel_size

__all__ = [
    "use_packing", "packing_context", "pack_conv_kernel_w2", "PackedConv3",
    "PackedBN", "PackedECA", "PackedConvBlock3", "packed_concat",
]

Dtype = Any

#: stack of context defaults consulted when the switch resolves to "auto".
#: Packing is a TRAINING-regime win: the 2x structural-zero MACs buy fused
#: BN/wgrad bandwidth in the backward pass, but in frozen forward-only
#: trunks (the stage-3 DDPG learn step) they are a pure loss — measured
#: pairwise on v5e at batch 64: all-unpacked 913 ms vs packed-defaults
#: 1103 ms (1.21x, logs/roundwork_s3pair_142204.log). Contexts that know
#: their regime push a default here; an explicit PMOE_PACKED_* env value
#: still wins (the A/B escape hatch).
_CTX_PACKING: list[str] = []


class packing_context:
    """``with packing_context("0"): ...`` — scoped packing default for
    traces made inside the block (e.g. the DDPG agent's frozen trunks)."""

    def __init__(self, flag: str):
        self.flag = flag

    def __enter__(self):
        _CTX_PACKING.append(self.flag)
        return self

    def __exit__(self, *exc):
        _CTX_PACKING.pop()
        return False


def context_packing() -> str | None:
    return _CTX_PACKING[-1] if _CTX_PACKING else None


def use_packing(flag, width: int) -> bool:
    """Resolve the packing switch: explicit config beats the
    PMOE_PACKED_STEM env var beats the ``packing_context`` scope default
    beats auto (on for TPU backends)."""
    if flag is None:
        flag = os.environ.get("PMOE_PACKED_STEM", "auto")
    if flag == "auto" and context_packing() is not None:
        flag = context_packing()
    if isinstance(flag, str):
        flag = (jax.default_backend() == "tpu") if flag == "auto" \
            else flag not in ("0", "false", "False")
    return bool(flag) and width % 2 == 0


def pack_conv_kernel_w2(w: jnp.ndarray) -> jnp.ndarray:
    """(kh, 3, C, Co) 3x3 kernel -> (kh, 3, 2C, 2Co) W-pair-packed kernel.

    Packed channel index is ``parity * C + c``. Output column pair
    (w=2*w2, w=2*w2+1) is produced from packed columns w2-1, w2, w2+1:
    taps kw=-1,0,+1 of output parity r land on input parity (r+kw) mod 2 at
    packed offset (r + kw - r') / 2.
    """
    kh, kw, C, Co = w.shape
    assert kw == 3
    wp = jnp.zeros((kh, 3, 2 * C, 2 * Co), w.dtype)
    wp = wp.at[:, 0, C:, :Co].set(w[:, 0])      # kw=-1 -> (r'=1, kw2=-1)
    wp = wp.at[:, 1, :C, :Co].set(w[:, 1])      # kw=0  -> (r'=0, kw2=0)
    wp = wp.at[:, 1, C:, :Co].set(w[:, 2])      # kw=+1 -> (r'=1, kw2=0)
    wp = wp.at[:, 1, :C, Co:].set(w[:, 0])      # r=1, kw=-1
    wp = wp.at[:, 1, C:, Co:].set(w[:, 1])      # r=1, kw=0
    wp = wp.at[:, 2, :C, Co:].set(w[:, 2])      # r=1, kw=+1
    return wp


@jax.custom_vjp
def _packed_conv3_op(xp: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """conv(xp, pack_conv_kernel_w2(w)), stride 1, pad 1, NHWC/HWIO.

    Wrapped in a custom VJP because differentiating through the kernel-pack
    scatter makes XLA split the weight gradient into per-block contractions,
    one of which re-reads the full-resolution activations as a separate
    HBM-bound pass (measured 6.8 ms/step on the stage-2 stem conv_0 at
    batch 64 on v5e). The explicit backward does ONE dense packed-space
    wgrad conv and gathers the six kernel blocks from it."""
    return lax.conv_general_dilated(
        xp, pack_conv_kernel_w2(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _packed_conv3_fwd(xp, w):
    return _packed_conv3_op(xp, w), (xp, w)


def _packed_conv3_bwd(res, g):
    xp, w = res
    C, Co = w.shape[2], w.shape[3]
    wp = pack_conv_kernel_w2(w)
    # dgrad: conv transpose of a stride-1 pad-1 conv = conv with the
    # spatially-flipped, I/O-swapped kernel (XLA prunes the zero blocks)
    d_xp = lax.conv_general_dilated(
        g, jnp.transpose(wp[::-1, ::-1], (0, 1, 3, 2)), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # wgrad: d_wp[kh,kw,ci,co] = sum_{b,h,w} xp[b,h+kh-1,w+kw-1,ci]*g[b,h,w,co]
    # — one conv with xp's channel dim as the output batch and the true
    # batch contracted ("CHWN"/"IHWO"), f32 accumulation
    d_wp = lax.conv_general_dilated(
        xp, g, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("CHWN", "IHWO", "HWNC"),
        preferred_element_type=jnp.float32)
    # gather the six nonzero blocks (transpose of pack_conv_kernel_w2)
    d_w = jnp.stack([
        d_wp[:, 0, C:, :Co] + d_wp[:, 1, :C, Co:],
        d_wp[:, 1, :C, :Co] + d_wp[:, 1, C:, Co:],
        d_wp[:, 1, C:, :Co] + d_wp[:, 2, :C, Co:],
    ], axis=1).astype(w.dtype)
    return d_xp, d_w


_packed_conv3_op.defvjp(_packed_conv3_fwd, _packed_conv3_bwd)


class PackedConv3(nn.Module):
    """Bias-free 3x3 stride-1 conv on a W-pair-packed tensor. Declares the
    canonical (3,3,C,Co) ``kernel`` param (same path/init as ``nn.Conv``)."""

    in_channels: int
    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp: jnp.ndarray) -> jnp.ndarray:
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.in_channels, self.features),
                       self.param_dtype)
        # The custom VJP pays only where native AD degenerates: for SMALL
        # input channel counts XLA splits the packed wgrad into per-block
        # contractions with an extra full-resolution HBM pass, while for
        # wide convs its block-pruned wgrad is already canonical-FLOPs and
        # the custom dense wgrad would do 2x the MACs (measured A/B on v5e:
        # all-custom is 1% SLOWER at stage-2; conv_0-only is the win).
        if (self.in_channels > 16
                or os.environ.get("PMOE_PACKED_VJP", "1") != "1"):
            return lax.conv_general_dilated(
                xp.astype(self.dtype),
                pack_conv_kernel_w2(w).astype(self.dtype), (1, 1),
                [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return _packed_conv3_op(xp.astype(self.dtype), w.astype(self.dtype))


class PackedBN(nn.Module):
    """BatchNorm on a W-pair-packed tensor with canonical (C,) params/stats.

    Replicates flax ``nn.BatchNorm`` numerics (momentum 0.9, eps 1e-5,
    fast-variance, promoted-f32 stats): packed-half means fold exactly
    because both halves hold the same number of pixels."""

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp: jnp.ndarray, train: bool = False,
                 affine_only: bool = False) -> jnp.ndarray:
        """``affine_only=True`` computes/updates the statistics exactly as
        the normal path but returns the folded per-channel affine
        ``[3, 2C] = (mean, scale/sqrt(var+eps), bias)`` instead of applying
        it — the fused Pallas pool (ops/pool_pallas.fused_packed_pool_bn)
        applies it in-register. Param/stat tree is identical either way."""
        C = self.features
        scale = self.param("scale", nn.initializers.ones, (C,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (C,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (C,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (C,))
        if not train:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = xp.astype(jnp.promote_types(xp.dtype, jnp.float32))
            mu_p = jnp.mean(xf, axis=(0, 1, 2))
            mu2_p = jnp.mean(xf * xf, axis=(0, 1, 2))
            mean = 0.5 * (mu_p[:C] + mu_p[C:])
            mu2 = 0.5 * (mu2_p[:C] + mu2_p[C:])
            var = jnp.maximum(0.0, mu2 - mean * mean)
            if not self.is_initializing():
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * var
        mean2 = jnp.concatenate([mean, mean])
        mul = lax.rsqrt(jnp.concatenate([var, var]) + 1e-5)
        mul = mul * jnp.concatenate([scale, scale]).astype(jnp.float32)
        bias2 = jnp.concatenate([bias, bias]).astype(jnp.float32)
        if affine_only:
            return jnp.stack([mean2, mul, bias2])
        y = (xp - mean2) * mul
        y = y + bias2
        return y.astype(self.dtype)


class PackedECA(nn.Module):
    """ECA gate on a W-pair-packed tensor; canonical ``conv_kernel`` param."""

    channels: int
    gamma: int = 2
    b: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp: jnp.ndarray) -> jnp.ndarray:
        C = self.channels
        k = eca_kernel_size(C, self.gamma, self.b)
        w = self.param("conv_kernel", nn.initializers.lecun_normal(),
                       (k, 1, 1), self.param_dtype)
        m_p = jnp.mean(xp.astype(jnp.promote_types(xp.dtype, jnp.float32)),
                       axis=(1, 2))                              # (B, 2C)
        y = (0.5 * (m_p[:, :C] + m_p[:, C:])).astype(self.dtype)
        y = lax.conv_general_dilated(
            y[:, :, None], w.astype(self.dtype), (1,),
            [(k // 2, k // 2)], dimension_numbers=("NWC", "WIO", "NWC"))
        gate = nn.sigmoid(y)[..., 0]                              # (B, C)
        g2 = jnp.concatenate([gate, gate], axis=-1)
        return xp * g2[:, None, None, :].astype(xp.dtype)


class PackedConvBlock3(nn.Module):
    """(Conv3x3 -> BN -> ReLU) x 2 on a W-pair-packed tensor — the packed
    ``ConvBlock3`` (reference basics.py:47-58); identical param tree."""

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        for i in range(2):
            cin = xp.shape[-1] // 2
            xp = PackedConv3(cin, self.features, name=f"conv_{i}", **kw)(xp)
            xp = PackedBN(self.features, name=f"bn_{i}", **kw)(xp, train)
            xp = nn.relu(xp)
        return xp


def packed_concat(ap: jnp.ndarray, bp: jnp.ndarray) -> jnp.ndarray:
    """Channel-concat two W-pair-packed tensors: [.., 2A] ++ [.., 2B] ->
    [.., 2(A+B)] with the packed channel convention parity*(A+B)+c."""
    A = ap.shape[-1] // 2
    B = bp.shape[-1] // 2
    return jnp.concatenate(
        [ap[..., :A], bp[..., :B], ap[..., A:], bp[..., B:]], axis=-1)

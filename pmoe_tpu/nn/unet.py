"""U-Net segmentation models (reference /root/reference/PMoE/model/blocks/unet.py).

:class:`UNet`    — 5-level encoder (64,128,256,512,512) with MaxPool + channel
dropout, ConvTranspose(k2,s2) decoder with skip concatenation, 1x1 head to 23
CARLA classes; ``inter_repr`` additionally returns the global-avg-pooled 512-d
bottleneck (unet.py:8-95).
:class:`UNetECA` — halved channels (32..512) with ECA gates at the bottleneck and
before each skip-merge conv (unet.py:98-185).

NHWC layout. The torch decoder passes ``output_size=skip.size()`` to each
transposed conv; here the upsampled map is crop-or-padded to the skip's spatial
shape, which is identical for even sizes (224-input path) and well-defined for odd.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax.numpy as jnp
from jax import lax
from flax import linen as nn

from .blocks import ConvBlock3, ECA
from .packed import PackedConvBlock3, packed_concat, use_packing

__all__ = ["UNet", "UNetECA"]

Dtype = Any


def _max_pool(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


def _match_spatial(x: jnp.ndarray, target_hw: Tuple[int, int]) -> jnp.ndarray:
    """Crop or zero-pad (bottom/right) so x's H,W equal ``target_hw`` — the
    behavior of torch ConvTranspose2d's ``output_size=`` adjustment."""
    h, w = x.shape[1], x.shape[2]
    th, tw = target_hw
    if h > th or w > tw:
        x = x[:, :th, :tw, :]
        h, w = x.shape[1], x.shape[2]
    if h < th or w < tw:
        x = jnp.pad(x, ((0, 0), (0, th - h), (0, tw - w), (0, 0)))
    return x


def _packed_maxpool_2x2(xp: jnp.ndarray, C: int) -> jnp.ndarray:
    """2x2/stride-2 max-pool consuming a W-pair-packed tensor: the W window
    is exactly the two lane halves, so the result is naturally UNPACKED:
    (B, H, W2, 2C) -> (B, H//2, W2, C)."""
    m = jnp.maximum(xp[..., :C], xp[..., C:])
    # -inf SCALAR literal: an array init falls off reduce_window's monoid
    # fast path onto the generic primitive (no transpose rule)
    return lax.reduce_window(m, -jnp.inf, lax.max, (1, 2, 1, 1),
                             (1, 2, 1, 1), ((0, 0), (0, 0), (0, 0), (0, 0)))


class _PackedUp(nn.Module):
    """ConvTranspose(k2, s2) emitting a W-pair-packed output (param tree
    identical to ``_Up``). out[2h+s, 2w+r, c] = x[h, w] . K[s, r, :, c], so
    the W doubling folds into channels: a (2,1)/(2,1) transpose conv with
    kernel K'[s, 0, :, r*F+c] = K[s, r, :, c]. Only used on the even-size
    (224-path) pyramid where torch's output_size matching is the identity."""

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        F = self.features
        w = _CTKernel(cin, F, self.param_dtype, self.kernel_init,
                      name="ConvTranspose_0")()
        # (2, 1, cin, 2F): W-parity folded into output channels. NB half
        # order: lax.conv_transpose (no kernel flip) emits output col 2w+r
        # from kernel W-tap (1-r), so packed parity r takes w[:, 1-r]
        # (verified against _Up on shared params).
        wp = jnp.concatenate([w[:, 1], w[:, 0]], axis=-1)[:, None]
        y = lax.conv_transpose(
            x.astype(self.dtype), wp.astype(self.dtype), (2, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bias = self.param("bias", nn.initializers.zeros, (F,),
                          self.param_dtype)
        b2 = jnp.concatenate([bias, bias]).astype(y.dtype)
        return y + b2


class _PackedOut(nn.Module):
    """1x1 segmentation head on a W-pair-packed tensor: block-diagonal
    (1,1,2C,2F) kernel, canonical ``kernel``/``bias`` params (same paths as
    ``nn.Conv(name='out')``)."""

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, xp: jnp.ndarray) -> jnp.ndarray:
        C = xp.shape[-1] // 2
        F = self.features
        w = self.param("kernel", self.kernel_init, (1, 1, C, F),
                       self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (F,),
                          self.param_dtype)
        wp = jnp.zeros((1, 1, 2 * C, 2 * F), w.dtype)
        wp = wp.at[:, :, :C, :F].set(w)
        wp = wp.at[:, :, C:, F:].set(w)
        y = lax.conv_general_dilated(
            xp.astype(self.dtype), wp.astype(self.dtype), (1, 1),
            [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + jnp.concatenate([bias, bias]).astype(y.dtype)


class _CTKernel(nn.Module):
    """Declares the canonical ``ConvTranspose_0/kernel`` param so
    ``_PackedUp``'s tree matches ``_Up``'s exactly."""

    cin: int
    features: int
    param_dtype: Dtype
    kernel_init: Callable

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", self.kernel_init,
                          (2, 2, self.cin, self.features), self.param_dtype)


class _Up(nn.Module):
    """ConvTranspose(k2, s2) upsample matched to the skip's spatial shape.

    The bias is added AFTER the spatial match: torch's ``output_size=``
    realizes odd sizes via ``output_padding``, whose extra bottom/right rows
    carry no input contributions but DO receive the bias (golden-tested on a
    50x50 odd-size input against the reference)."""

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip_hw: Tuple[int, int]) -> jnp.ndarray:
        import os as _os
        if _os.environ.get("PMOE_CONVT_MM", "0") == "1":
            # k2/s2 is NON-overlapping: the transposed conv is exactly one
            # matmul + pixel shuffle, out[2h+s, 2w+r] = x[h, w] @ K[1-s, 1-r]
            # (tap flip per lax.conv_transpose's no-flip orientation, same
            # empirical map _PackedUp uses). Measured on v5e and REJECTED
            # as the default: the pixel-shuffle transpose costs more than
            # the input dilation it avoids (stage-0 144 -> 149 ms, stage-1
            # 357 -> 361 ms, logs/roundwork_convt_ab.log). Kept gated for
            # future A/Bs; bitwise-exact vs conv_transpose incl. odd sizes.
            w = _CTKernel(x.shape[-1], self.features, self.param_dtype,
                          self.kernel_init, name="ConvTranspose_0")()
            B, h, ww, _ = x.shape
            y = jnp.einsum("bhwc,srcf->bhswrf", x.astype(self.dtype),
                           w[::-1, ::-1].astype(self.dtype))
            x = y.reshape(B, 2 * h, 2 * ww, self.features)
        else:
            x = nn.ConvTranspose(
                self.features,
                kernel_size=(2, 2),
                strides=(2, 2),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=self.kernel_init,
            )(x)
        x = _match_spatial(x, skip_hw)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        return x + bias.astype(x.dtype)


class UNet(nn.Module):
    """Basic U-Net (reference unet.py:8-95)."""

    in_features: int = 3
    out_features: int = 23
    gamma: int = 2
    b: int = 1
    dropout: float = 0.0
    inter_repr: bool = False
    packed: Any = None        # None = context default (off; PU-Net opts in)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        def drop(x, packed_c: int = 0):
            if self.dropout > 0.0:
                # Dropout2d: zero whole channels (broadcast over H, W).
                # Flax samples the noise at the broadcast shape (B,1,1,C),
                # so applying the same module to a ones-mask and tiling it
                # across the packed parity halves consumes the identical
                # rng draw — packed and canonical paths drop the SAME
                # channels.
                d = nn.Dropout(rate=self.dropout, broadcast_dims=(1, 2),
                               deterministic=not train)
                if packed_c:
                    m = d(jnp.ones((x.shape[0], 1, 1, packed_c), x.dtype))
                    return x * jnp.concatenate([m, m], axis=-1)
                x = d(x)
            return x

        # Level 1 can run W-pair-packed (64 channels = half-empty lanes;
        # see nn/packed.py). The packing is exact and parameter-identical;
        # only used on the even-size pyramid where the torch output_size
        # matching is the identity. Paired A/B on v5e (PERF.md): packing
        # WINS inside the PU-Net rollout (+3.8% stage-1 step) but LOSES on
        # the standalone segmentation step (-6.2% stage-0), so the default
        # is off and PredictiveUNet opts its sub-UNets in via ``packed=
        # "auto"``. Overrides: PMOE_PACKED_UNET beats an explicit (non-
        # auto) PMOE_PACKED_STEM beats the constructor attribute.
        import os as _os
        _env = _os.environ.get("PMOE_PACKED_UNET") \
            or _os.environ.get("PMOE_PACKED_STEM")
        if _env is not None and _env != "auto":
            _flag = _env
        elif self.packed is not None:
            _flag = self.packed
        else:
            _flag = "0"
        packed = (use_packing(_flag, image.shape[2])
                  and image.shape[1] % 16 == 0 and image.shape[2] % 16 == 0)

        # Contracting path
        if packed:
            B, H, W, Cin = image.shape
            ip = image.reshape(B, H, W // 2, 2 * Cin)
            x1p = drop(PackedConvBlock3(64, name="dwn_1", **kw)(ip, train),
                       packed_c=64)
            x1_hw = (H, W)
            pool1 = _packed_maxpool_2x2(x1p, 64)
        else:
            x1 = drop(ConvBlock3(64, name="dwn_1", **kw)(image, train))
            x1_hw = x1.shape[1:3]
            pool1 = _max_pool(x1)
        x2 = drop(ConvBlock3(128, name="dwn_2", **kw)(pool1, train))
        x3 = drop(ConvBlock3(256, name="dwn_3", **kw)(_max_pool(x2), train))
        x4 = drop(ConvBlock3(512, name="dwn_4", **kw)(_max_pool(x3), train))
        x5 = ConvBlock3(512, name="dwn_5", **kw)(_max_pool(x4), train)

        # Expansive path
        x = _Up(512, name="up_1", **kw)(x5, x4.shape[1:3])
        x = ConvBlock3(512, name="up_forw_1", **kw)(
            jnp.concatenate([x4, x], axis=-1), train)
        x = _Up(256, name="up_2", **kw)(x, x3.shape[1:3])
        x = ConvBlock3(256, name="up_forw_2", **kw)(
            jnp.concatenate([x3, x], axis=-1), train)
        x = _Up(128, name="up_3", **kw)(x, x2.shape[1:3])
        x = ConvBlock3(128, name="up_forw_3", **kw)(
            jnp.concatenate([x2, x], axis=-1), train)
        if packed:
            xp = _PackedUp(64, name="up_4", **kw)(x)
            xp = PackedConvBlock3(64, name="up_forw_4", **kw)(
                packed_concat(x1p, xp), train)
            x = _PackedOut(self.out_features, name="out", **kw)(xp)
            B, H2, W2p, _ = x.shape
            x = x.reshape(B, H2, 2 * W2p, self.out_features)
        else:
            x = _Up(64, name="up_4", **kw)(x, x1_hw)
            x = ConvBlock3(64, name="up_forw_4", **kw)(
                jnp.concatenate([x1, x], axis=-1), train)
            x = nn.Conv(self.out_features, kernel_size=(1, 1), name="out",
                        **kw)(x)

        if self.inter_repr:
            pooled = jnp.mean(x5.astype(jnp.float32), axis=(1, 2)).astype(self.dtype)
            return pooled, x
        return x


class UNetECA(nn.Module):
    """U-Net with ECA channel attention, halved channels (reference unet.py:98-185)."""

    in_features: int = 3
    out_features: int = 23
    gamma: int = 2
    b: int = 1
    dropout: float = 0.0
    inter_repr: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        eca = lambda c, name: ECA(c, self.gamma, self.b, name=name, **kw)

        def drop(x):
            if self.dropout > 0.0:
                x = nn.Dropout(rate=self.dropout, broadcast_dims=(1, 2),
                               deterministic=not train)(x)
            return x

        x1 = drop(ConvBlock3(32, name="dwn_1", **kw)(image, train))
        x2 = drop(ConvBlock3(64, name="dwn_2", **kw)(_max_pool(x1), train))
        x3 = drop(ConvBlock3(128, name="dwn_3", **kw)(_max_pool(x2), train))
        x4 = drop(ConvBlock3(256, name="dwn_4", **kw)(_max_pool(x3), train))
        x5 = eca(256, "eca_0")(_max_pool(x4))
        x5 = ConvBlock3(512, name="dwn_5", **kw)(x5, train)

        x = _Up(256, name="up_1", **kw)(x5, x4.shape[1:3])
        x = ConvBlock3(256, name="up_forw_1", **kw)(
            eca(512, "eca_1")(jnp.concatenate([x4, x], axis=-1)), train)
        x = _Up(128, name="up_2", **kw)(x, x3.shape[1:3])
        x = ConvBlock3(128, name="up_forw_2", **kw)(
            eca(256, "eca_2")(jnp.concatenate([x3, x], axis=-1)), train)
        x = _Up(64, name="up_3", **kw)(x, x2.shape[1:3])
        x = ConvBlock3(64, name="up_forw_3", **kw)(
            eca(128, "eca_3")(jnp.concatenate([x2, x], axis=-1)), train)
        x = _Up(32, name="up_4", **kw)(x, x1.shape[1:3])
        x = ConvBlock3(32, name="up_forw_4", **kw)(
            eca(64, "eca_4")(jnp.concatenate([x1, x], axis=-1)), train)

        x = nn.Conv(self.out_features, kernel_size=(1, 1), name="out", **kw)(x)

        if self.inter_repr:
            pooled = jnp.mean(x5.astype(jnp.float32), axis=(1, 2)).astype(self.dtype)
            return pooled, x
        return x

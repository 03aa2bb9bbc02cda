"""Unit tests for the NN core blocks (shapes + reference-semantics details)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmoe_tpu.nn import (MLP, ConvBlock3, ECA, EfficientConvBlock, UNet,
                         UNetECA, eca_kernel_size)


def test_eca_kernel_size_formula():
    # t = int(|log2(C)+b| / gamma), forced odd (reference basics.py:66-68)
    assert eca_kernel_size(512) == 5
    assert eca_kernel_size(64) == 3
    assert eca_kernel_size(92) == 3      # 4 * 23 mask channels
    assert eca_kernel_size(12) == 3      # 4 frames * 3 channels
    assert eca_kernel_size(256) == 5     # t=4 even -> 5


def test_mlp_bias_follows_bn():
    # bias = not bn (reference basics.py:33)
    m_bn = MLP(dims=(8, 16, 4), act="relu", bn=True)
    v = m_bn.init(jax.random.PRNGKey(0), jnp.ones((2, 8)), False)
    assert "bias" not in v["params"]["dense_0"]
    m_nobn = MLP(dims=(8, 16, 4), act="relu", bn=False)
    v2 = m_nobn.init(jax.random.PRNGKey(0), jnp.ones((2, 8)), False)
    assert "bias" in v2["params"]["dense_0"]


def test_mlp_no_act_after_last_unless_l_act():
    # force the final Dense to emit negatives: raw logits when l_act=False,
    # relu-clamped to zero when l_act=True
    def force_negative_head(v):
        p = jax.tree_util.tree_map(lambda x: x, v)  # shallow copy
        last = p["params"]["dense_1"]
        last["kernel"] = -jnp.abs(last["kernel"]) - 1.0
        last["bias"] = -jnp.ones_like(last["bias"])
        return p

    x = jnp.ones((3, 4))
    m = MLP(dims=(4, 8, 2), act="relu", bn=False)
    v = force_negative_head(m.init(jax.random.PRNGKey(1), x, False))
    assert (m.apply(v, x, False) < 0).all()
    m2 = MLP(dims=(4, 8, 2), act="relu", bn=False, l_act=True)
    v2 = force_negative_head(m2.init(jax.random.PRNGKey(1), x, False))
    assert (m2.apply(v2, x, False) == 0).all()


def test_conv_block3_shape():
    m = ConvBlock3(16)
    x = jnp.ones((2, 8, 8, 3))
    v = m.init(jax.random.PRNGKey(0), x, False)
    assert m.apply(v, x, False).shape == (2, 8, 8, 16)
    # bias-free convs (reference basics.py:51)
    assert "bias" not in v["params"]["conv_0"]


def test_eca_preserves_shape_and_gates():
    m = ECA(32)
    x = jnp.ones((2, 8, 8, 32))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape
    # sigmoid gate in (0, 1): output strictly between 0 and input
    assert (np.asarray(y) > 0).all() and (np.asarray(y) < 1).all()


def test_efficient_conv_block_channels():
    m = EfficientConvBlock(12, 3)
    x = jnp.ones((2, 16, 16, 12))
    v = m.init(jax.random.PRNGKey(0), x, False)
    assert m.apply(v, x, False).shape == (2, 16, 16, 3)
    # hidden stage is 64 channels (reference basics.py:93-101)
    assert v["params"]["conv_0"]["kernel"].shape == (3, 3, 12, 64)


@pytest.mark.parametrize("cls", [UNet, UNetECA])
def test_unet_shapes(cls):
    m = cls(in_features=3, out_features=23)
    x = jnp.ones((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, False)
    assert m.apply(v, x, False).shape == (1, 32, 32, 23)


def test_unet_inter_repr_bottleneck():
    m = UNet(inter_repr=True)
    x = jnp.ones((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, False)
    pooled, logits = m.apply(v, x, False)
    assert pooled.shape == (1, 512)
    assert logits.shape == (1, 32, 32, 23)


def test_unet_odd_spatial_size():
    # ConvTranspose output_size matching must handle odd sizes (crop 99x224
    # in the reference pipeline before resize)
    m = UNet()
    x = jnp.ones((1, 36, 44, 3))
    v = m.init(jax.random.PRNGKey(0), x, False)
    assert m.apply(v, x, False).shape == (1, 36, 44, 23)

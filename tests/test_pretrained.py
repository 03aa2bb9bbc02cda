"""Pretrained-backbone initialization: torchvision-format resnet state_dicts
convert into our flax ResNetBackbone trees, including broadcast over the
stacked-expert axis (reference backbone.py:49-75 loads ImageNet weights)."""

import numpy as np
import pytest


def _torchvision_resnet18_sd():
    """Synthesize a state_dict with torchvision resnet18 naming/shapes."""
    rng = np.random.default_rng(7)
    sd = {}

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = rng.standard_normal(
            (cout, cin, k, k)).astype(np.float32) / np.sqrt(cin * k * k)

    def bn(name, c):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.standard_normal(c).astype(np.float32)
        sd[name + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".num_batches_tracked"] = np.int64(100)

    conv("conv1", 64, 3, 7)       # replaced by the ECA stem; must be ignored
    bn("bn1", 64)
    widths = (64, 128, 256, 512)
    cin = 64
    for s, w in enumerate(widths, start=1):
        for i in range(2):
            p = f"layer{s}.{i}"
            conv(p + ".conv1", w, cin if i == 0 else w, 3)
            bn(p + ".bn1", w)
            conv(p + ".conv2", w, w, 3)
            bn(p + ".bn2", w)
            if i == 0 and s > 1:
                conv(p + ".downsample.0", w, cin, 1)
                bn(p + ".downsample.1", w)
            cin = w
    sd["fc.weight"] = rng.standard_normal((1000, 512)).astype(np.float32)
    sd["fc.bias"] = rng.standard_normal(1000).astype(np.float32)
    return sd


def test_resnet_conversion_shapes():
    from pmoe_tpu.utils.torch_compat import resnet_from_torchvision

    sd = _torchvision_resnet18_sd()
    params, stats = resnet_from_torchvision(sd, "resnet18")
    assert set(params) == {f"layer{s}_{i}" for s in range(1, 5)
                           for i in range(2)} | {"bn1"}
    # kernel layout: (out, in, kh, kw) -> (kh, kw, in, out)
    np.testing.assert_allclose(
        params["layer2_0"]["conv1"]["kernel"],
        np.transpose(sd["layer2.0.conv1.weight"], (2, 3, 1, 0)))
    assert "downsample_conv" in params["layer2_0"]
    assert "downsample_conv" not in params["layer1_0"]
    np.testing.assert_allclose(stats["layer3_1"]["bn2"]["var"],
                               sd["layer3.1.bn2.running_var"])
    # bn1 maps (the surgery keeps torchvision's bn1 after the replaced conv1);
    # the conv1 slot and the 1000-class fc stay unmapped
    np.testing.assert_allclose(stats["bn1"]["mean"], sd["bn1.running_mean"])
    assert "stem" not in params and "fc" not in params


def test_load_pretrained_into_stacked_experts(tmp_path):
    """Graft into an (expert-stacked) params tree, broadcasting the K axis."""
    from pmoe_tpu.utils.torch_compat import load_pretrained_backbone

    sd = _torchvision_resnet18_sd()
    path = tmp_path / "resnet18.npz"
    np.savez(path, **sd)

    K = 3
    w = sd["layer1.0.conv1.weight"]
    dst = {
        "experts": {"backbone": {
            "layer1_0": {"conv1": {"kernel": np.zeros((K, 3, 3, 64, 64),
                                                      np.float32)}},
        }},
        "other": {"dense": {"kernel": np.ones((4, 4), np.float32)}},
    }
    stats = {"experts": {"backbone": {
        "layer1_0": {"bn1": {"mean": np.zeros((K, 64), np.float32),
                             "var": np.ones((K, 64), np.float32)}}}}}
    params2, stats2, n = load_pretrained_backbone(dst, stats, "resnet18",
                                                  str(path), verbose=False)
    assert n == 3        # conv kernel + bn mean + bn var
    got = params2["experts"]["backbone"]["layer1_0"]["conv1"]["kernel"]
    expected = np.transpose(w, (2, 3, 1, 0))
    for k in range(K):   # broadcast across the expert axis
        np.testing.assert_allclose(got[k], expected)
    np.testing.assert_allclose(
        stats2["experts"]["backbone"]["layer1_0"]["bn1"]["mean"][1],
        sd["layer1.0.bn1.running_mean"])
    # untouched leaves intact
    np.testing.assert_allclose(params2["other"]["dense"]["kernel"],
                               np.ones((4, 4)))


def test_backbone_param_names_match_converter():
    """The flax ResNetBackbone's real tree accepts every converted leaf —
    naming contract between nn/resnet.py and torch_compat."""
    import jax
    import jax.numpy as jnp

    from pmoe_tpu.nn.resnet import ResNetBackbone
    from pmoe_tpu.utils.torch_compat import resnet_from_torchvision

    m = ResNetBackbone(arch="resnet18", in_channels=6)
    variables = m.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 32, 32, 6)))
    src_p, src_s = resnet_from_torchvision(_torchvision_resnet18_sd(),
                                           "resnet18")

    def leaves(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(leaves(v, prefix + k + "/"))
            else:
                out[prefix + k] = np.shape(v)
        return out

    dst_p = leaves(variables["params"])
    for name, shape in leaves(src_p).items():
        assert name in dst_p, f"converted param {name} missing from model"
        assert dst_p[name] == shape, (name, dst_p[name], shape)
    dst_s = leaves(variables["batch_stats"])
    for name, shape in leaves(src_s).items():
        assert name in dst_s, f"converted stat {name} missing from model"
        assert dst_s[name] == shape, (name, dst_s[name], shape)

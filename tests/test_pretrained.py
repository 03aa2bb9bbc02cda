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


def _torch_basic_block(sd, prefix, cin, cout, stride):
    """torchvision.models.resnet.BasicBlock forward in torch, loaded from the
    state_dict slice — the semantics resnet_from_torchvision must preserve
    (conv pad/stride, BN eps=1e-5, downsample order, residual ReLU)."""
    import torch

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(cout)
            self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(cout)
            self.down = None
            if stride != 1 or cin != cout:
                self.down = torch.nn.Sequential(
                    torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                    torch.nn.BatchNorm2d(cout))

        def forward(self, x):
            idn = x if self.down is None else self.down(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idn)

    block = Block()
    rename = {f"{prefix}.downsample.0.weight": "down.0.weight"}
    for k in ("weight", "bias", "running_mean", "running_var",
              "num_batches_tracked"):
        rename[f"{prefix}.downsample.1.{k}"] = f"down.1.{k}"
    state = {}
    for k, v in sd.items():
        if not k.startswith(prefix + "."):
            continue
        name = rename.get(k, k[len(prefix) + 1:])
        state[name] = torch.as_tensor(np.asarray(v))
    block.load_state_dict(state)
    block.eval()
    return block


@pytest.mark.parametrize("layer,cin,cout,stride",
                         [("layer1.1", 64, 64, 1), ("layer2.0", 64, 128, 2)])
def test_converted_block_matches_real_torch_forward(layer, cin, cout, stride):
    """Numeric end-to-end converter validation (VERDICT r3 item 7): a REAL
    torch forward of the torchvision BasicBlock vs our flax _BasicBlock on
    the converted tree must agree to float32 tolerance. ImageNet weights are
    unreachable here (no torchvision wheel, zero egress — the environment
    block is recorded in tools/export_torchvision.py), so the state_dict is
    synthesized with realistic shapes/statistics; the torch-side forward is
    the real torch op semantics either way, which is what the converter can
    get wrong."""
    import torch

    from pmoe_tpu.nn.resnet import _BasicBlock
    from pmoe_tpu.utils.torch_compat import resnet_from_torchvision

    sd = _torchvision_resnet18_sd()
    params, stats = resnet_from_torchvision(sd, "resnet18")
    key = layer.replace(".", "_")

    x = np.random.default_rng(3).standard_normal(
        (2, 16, 16, cin)).astype(np.float32)
    with torch.no_grad():
        ref = _torch_basic_block(sd, layer, cin, cout, stride)(
            torch.as_tensor(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))

    block = _BasicBlock(features=cout, stride=stride)
    got = block.apply({"params": params[key], "batch_stats": stats[key]},
                      x, train=False)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)


def test_converted_trunk_matches_real_torch_forward():
    """All 8 resnet18 blocks chained (layer1..layer4) + global average pool:
    real torch vs the converted flax trunk — the full post-stem backbone the
    reference grafts ImageNet weights into (backbone.py:49-75)."""
    import torch

    from pmoe_tpu.nn.resnet import _BasicBlock
    from pmoe_tpu.utils.torch_compat import resnet_from_torchvision

    sd = _torchvision_resnet18_sd()
    params, stats = resnet_from_torchvision(sd, "resnet18")

    x = np.random.default_rng(5).standard_normal(
        (2, 16, 16, 64)).astype(np.float32)
    widths = (64, 128, 256, 512)
    xt = torch.as_tensor(np.transpose(x, (0, 3, 1, 2)))
    xj = x
    cin = 64
    with torch.no_grad():
        for s, w in enumerate(widths, start=1):
            for i in range(2):
                stride = 2 if (s > 1 and i == 0) else 1
                xt = _torch_basic_block(sd, f"layer{s}.{i}", cin, w,
                                        stride)(xt)
                key = f"layer{s}_{i}"
                xj = _BasicBlock(features=w, stride=stride).apply(
                    {"params": params[key], "batch_stats": stats[key]},
                    xj, train=False)
                cin = w
    ref = xt.mean(dim=(2, 3)).numpy()
    got = np.asarray(xj, np.float32).mean(axis=(1, 2))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)

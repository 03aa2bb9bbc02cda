"""Golden-fixture generator: records fp32 activations/losses from the torch
REFERENCE implementation (/root/reference/PMoE) into tests/golden/.

Run offline where the reference is mounted:
    python tools/make_golden.py
It fills every reference module's state_dict with weights that are a pure
function of (name, shape) (tests/golden_utils.tensor_for), runs forward in
eval mode, and stores only the outputs + a names/shapes manifest. The parity
tests (tests/test_golden.py) rebuild the same weights, convert them to flax
layout (pmoe_tpu.utils.torch_compat), and compare against these recordings —
the repo stays standalone (no torch/reference needed to regenerate weights).

Covered (VERDICT round-1 item 5): make_mlp (bn on/off), conv3, ECA at several
widths, EfficientConvBlock, UNet at 64x64 + odd 50x50 (output_size semantics),
all stage losses incl. MixtureSameFamily log_prob with elu(std)+1.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference/PMoE")
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REFERENCE))

from golden_utils import (image_for, mask_for, normal_for, save_manifest,
                          save_outputs, tensor_for)

import torch  # noqa: E402


def fill(module: torch.nn.Module) -> dict:
    """Overwrite the module's state with name-keyed deterministic tensors;
    return the {name: shape} manifest."""
    sd = module.state_dict()
    new = {k: torch.from_numpy(np.array(tensor_for(k, tuple(v.shape))))
           for k, v in sd.items()}
    module.load_state_dict(new)
    manifest = {k: list(v.shape) for k, v in sd.items()}
    return manifest


def main() -> None:
    torch.set_grad_enabled(False)
    from model.blocks.basics import (EfficientBlock, EfficientConvBlock,
                                     conv3, make_mlp)
    from model.blocks.unet import UNet
    from trainer import loss as ref_loss

    manifests = {}

    # -- make_mlp ------------------------------------------------------------
    m = make_mlp([7, 16, 8], "relu", l_act=False, bn=False, dropout=0.0).eval()
    manifests["mlp_plain"] = fill(m)
    x = image_for("mlp_plain", (4, 7))
    save_outputs("mlp_plain", x=x, y=m(torch.from_numpy(x)).numpy())

    m = make_mlp([7, 16, 8], "elu", l_act=True, bn=True, dropout=0.0).eval()
    manifests["mlp_bn_elu"] = fill(m)
    x = image_for("mlp_bn_elu", (4, 7))
    save_outputs("mlp_bn_elu", x=x, y=m(torch.from_numpy(x)).numpy())

    # -- conv3 ---------------------------------------------------------------
    m = conv3(5, 8).eval()
    manifests["conv3"] = fill(m)
    x = image_for("conv3", (2, 5, 16, 16))
    save_outputs("conv3", x=x, y=m(torch.from_numpy(x)).numpy())

    # -- ECA at several widths (kernel-size formula coverage) ----------------
    for c in (16, 64, 92):
        m = EfficientBlock(c, gamma=2, b=1).eval()
        manifests[f"eca_{c}"] = fill(m)
        x = normal_for(f"eca_{c}", (2, c, 8, 8))
        save_outputs(f"eca_{c}", x=x, y=m(torch.from_numpy(x)).numpy())

    # -- EfficientConvBlock --------------------------------------------------
    m = EfficientConvBlock(12, 3, gamma=2, b=1).eval()
    manifests["ecb"] = fill(m)
    x = image_for("ecb", (2, 12, 16, 16))
    save_outputs("ecb", x=x, y=m(torch.from_numpy(x)).numpy())

    # -- UNet ----------------------------------------------------------------
    m = UNet(in_features=3, out_features=23, inter_repr=True).eval()
    manifests["unet64"] = fill(m)
    x = image_for("unet64", (2, 3, 64, 64))
    pooled, logits = m(torch.from_numpy(x))
    save_outputs("unet64", x=x, pooled=pooled.numpy(), logits=logits.numpy())

    m = UNet(in_features=3, out_features=23, inter_repr=False).eval()
    manifests["unet_odd"] = fill(m)
    x = image_for("unet_odd", (1, 3, 50, 50))
    save_outputs("unet_odd", x=x, logits=m(torch.from_numpy(x)).numpy())

    from model.blocks.unet import UNetECA

    m = UNetECA(in_features=3, out_features=23, inter_repr=True).eval()
    manifests["unet_eca"] = fill(m)
    x = image_for("unet_eca", (1, 3, 48, 48))
    pooled, logits = m(torch.from_numpy(x))
    save_outputs("unet_eca", x=x, pooled=pooled.numpy(),
                 logits=logits.numpy())

    # -- full PU-Net autoregressive rollout -----------------------------------
    # (deque/concat frame ordering, entry block fusion, BN-eval rollout)
    from model.punet import PredictiveUnet
    import tempfile

    seed_unet = UNet(in_features=3, out_features=23)
    with tempfile.NamedTemporaryFile(suffix=".pth") as tf:
        torch.save({"unet": seed_unet.state_dict()}, tf.name)
        m = PredictiveUnet(past_frames=4, future_frames=2, in_features=3,
                           num_classes=23, model_name="unet",
                           model_path=tf.name).eval()
    manifests["punet"] = fill(m)
    x = image_for("punet", (1, 4, 3, 32, 32))
    save_outputs("punet", x=x, outs=m(torch.from_numpy(x)).numpy())

    # -- losses --------------------------------------------------------------
    logits = normal_for("loss_logits", (2, 23, 16, 16))
    mask = mask_for("loss_mask", (2, 16, 16))
    tl, tm = torch.from_numpy(logits), torch.from_numpy(mask)
    save_outputs(
        "losses_seg",
        logits=logits, mask=mask,
        class_dice=ref_loss.class_dice(tl, tm).numpy(),
        dice_score=ref_loss.dice_score(tl, tm).numpy(),
        tversky=ref_loss.tversky_loss(tl, tm).numpy(),
        ce_tversky=ref_loss.cross_entropy_tversky_weighted_loss(tl, tm).numpy(),
    )

    seq_logits = normal_for("ar_logits", (2, 3, 23, 8, 8))
    seq_mask = mask_for("ar_mask", (2, 3, 8, 8))
    sl, sm = torch.from_numpy(seq_logits), torch.from_numpy(seq_mask)
    save_outputs(
        "losses_ar",
        logits=seq_logits, mask=seq_mask,
        ar_l1=ref_loss.AutoregressiveCriterion(3, "l1")(sl, sm).numpy(),
        ar_l2=ref_loss.AutoregressiveCriterion(3, "l2")(sl, sm).numpy(),
        ar_tversky=ref_loss.AutoregressiveCriterion(3, "tversky")(sl, sm).numpy(),
        l1_gdl=ref_loss.l1_gdl(sl, sm).numpy(),
    )

    # -- mixture distribution (MixtureSameFamily parity, moe.py:152-157) -----
    import torch.distributions as D
    import torch.nn.functional as F

    B, K = 4, 3
    alphas = normal_for("mix_alpha", (B, K))
    raw_std = normal_for("mix_rawstd", (B, K, 2))
    mean = normal_for("mix_mean", (B, K, 2))
    actions_gt = np.clip(normal_for("mix_actions", (B, 2), 0.5), -1, 1)
    probs = F.softmax(torch.from_numpy(alphas), dim=1)
    std = F.elu(torch.from_numpy(raw_std)) + 1
    dist = D.MixtureSameFamily(
        D.Categorical(probs),
        D.Independent(D.Normal(torch.from_numpy(mean), std), 1))
    log_prob = dist.log_prob(torch.from_numpy(actions_gt)).numpy()

    speed_pred = normal_for("mix_speed_pred", (B, K, 1))
    speed_gt = normal_for("mix_speed_gt", (B, 1))
    moe_l = ref_loss.moe_loss(dist, torch.from_numpy(speed_pred.copy()),
                              torch.from_numpy(actions_gt),
                              torch.from_numpy(speed_gt.copy()), (0.7, 0.3))
    actions = normal_for("pl_actions", (B, 2), 0.5)
    punet_l = ref_loss.punet_loss(
        torch.from_numpy(actions), torch.from_numpy(speed_pred[:, 0]),
        torch.from_numpy(actions_gt), torch.from_numpy(speed_gt.copy()),
        (0.7, 0.3))
    pmoe_l = ref_loss.pmoe_loss(
        torch.from_numpy(actions), None, torch.from_numpy(actions_gt), None,
        (1.0, 0.0))
    save_outputs("losses_action",
                 alphas=alphas, mean=mean, raw_std=raw_std,
                 actions_gt=actions_gt, speed_pred=speed_pred,
                 speed_gt=speed_gt, actions=actions,
                 log_prob=log_prob, moe_loss=np.float32(moe_l),
                 punet_loss=np.float32(punet_l), pmoe_loss=np.float32(pmoe_l))

    # -- backbones (reference backbone.py surgery on torchvision models) -----
    # torchvision is NOT in this environment, so the stock architectures are
    # reconstructed below in torch with torchvision's exact parameter naming
    # and eval semantics (resnet18 BasicBlock; mobilenet_v3_small
    # InvertedResidual + SqueezeExcitation, BN eps=1e-3); the reference's
    # surgery (EfficientConvBlock stem from the REAL reference basics.py,
    # 512-d head) is then applied verbatim per backbone.py:49-104.
    for tag, builder in (
            ("resnet18_backbone", _build_resnet18_surgery),
            ("resnet34_backbone", lambda: _build_resnet_surgery("resnet34")),
            ("resnet50_backbone", lambda: _build_resnet_surgery("resnet50")),
            ("mobilenet_v3s_backbone", _build_mnv3s_surgery),
            ("mobilenet_v3l_backbone", _build_mnv3l_surgery),
            ("mobilenet_v2_backbone", _build_mnv2_surgery)):
        m = builder().eval()
        manifests[tag] = fill(m)
        x = image_for(tag, (2, 12, 64, 64))
        save_outputs(tag, x=x, y=m(torch.from_numpy(x)).numpy())

    _record_aug_factors()

    save_manifest(manifests)
    print("golden fixtures written to tests/golden/")


def _record_aug_factors():
    """Record the reference curriculum-augmenter FACTOR SCHEDULES
    (augmenter.py:79-612) into tests/golden/aug_factors.json.

    imgaug is not installed in this environment, so a recording stub is
    injected as ``imgaug.augmenters``: every op constructor captures its
    (name, args, kwargs) and ``get_augmenter`` then returns the op tree with
    the reference's computed factor values embedded — the transcription in
    pmoe_tpu/ops/augment.py is tested against exactly these numbers."""
    import importlib
    import json
    import sys
    import types

    class _Op:
        def __init__(self, name, *a, **k):
            self.name, self.args, self.kwargs = name, a, k

    iaa = types.ModuleType("imgaug.augmenters")
    for n in ("Sequential", "Sometimes", "GaussianBlur",
              "AdditiveGaussianNoise", "CoarseDropout", "Dropout", "Add",
              "Multiply", "LinearContrast", "Grayscale", "Fliplr", "Crop",
              "SomeOf", "OneOf", "Sharpen", "Emboss", "AddToHueAndSaturation",
              "PiecewiseAffine", "ContrastNormalization", "Affine",
              "ElasticTransformation", "Pad", "CropAndPad"):
        setattr(iaa, n, (lambda _n: lambda *a, **k: _Op(_n, *a, **k))(n))
    pkg = types.ModuleType("imgaug")
    pkg.augmenters = iaa
    sys.modules["imgaug"] = pkg
    sys.modules["imgaug.augmenters"] = iaa
    augmenter = importlib.import_module("model.augmenter")

    def jsonify(v):
        if isinstance(v, _Op):
            return {"op": v.name,
                    "args": [jsonify(a) for a in v.args],
                    "kwargs": {k: jsonify(x) for k, x in v.kwargs.items()}}
        if isinstance(v, (list, tuple)):
            return [jsonify(x) for x in v]
        if isinstance(v, (int, float, str, bool)) or v is None:
            return v
        return repr(v)

    bsz = 120
    iterations = [0, 30000, 120000, 480000, 1920000, 7680000]
    out = {"bsz": bsz, "iterations": iterations, "schedules": {}}
    for aug_type in ("medium", "soft", "high", "medium_harder", "super_hard",
                     "soft_harder", "custom"):
        out["schedules"][aug_type] = [
            jsonify(augmenter.get_augmenter(it, bsz, aug_type))
            for it in iterations]
    out["schedules"]["segmentation"] = [jsonify(augmenter.get_augmenter(
        1, bsz, "segmentation"))]
    path = REPO / "tests" / "golden" / "aug_factors.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"augmenter factor schedules -> {path}")


def _build_resnet18_surgery():
    """torchvision.models.resnet18 skeleton (exact naming/forward) with the
    reference's surgery: conv1 -> EfficientConvBlock(12 -> 64), fc -> Identity
    (backbone.py:49-71)."""
    import torch.nn as nn
    from model.blocks.basics import EfficientConvBlock

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return self.relu(y + idt)

    class ResNet18(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = EfficientConvBlock(in_ch=12, out_ch=64, gamma=2, b=1)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            widths = (64, 128, 256, 512)
            cin = 64
            for s, w in enumerate(widths, start=1):
                blocks = [BasicBlock(cin, w, stride=1 if s == 1 else 2),
                          BasicBlock(w, w)]
                setattr(self, f"layer{s}", nn.Sequential(*blocks))
                cin = w
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Identity()

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for s in range(1, 5):
                x = getattr(self, f"layer{s}")(x)
            return self.fc(torch.flatten(self.avgpool(x), 1))

    return ResNet18()


def _build_resnet_surgery(arch: str):
    """torchvision resnet34/resnet50 skeletons (exact naming/forward) with the
    reference surgery (backbone.py:56-71): conv1 -> EfficientConvBlock(12 ->
    64); fc Identity at width 512 (resnet34) / Linear(2048, 512) (resnet50)."""
    import torch.nn as nn
    from model.blocks.basics import EfficientConvBlock

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return self.relu(y + idt)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, cin, width, stride=1):
            super().__init__()
            cout = width * 4
            self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return self.relu(y + idt)

    block = BasicBlock if arch == "resnet34" else Bottleneck
    counts = (3, 4, 6, 3)

    class ResNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = EfficientConvBlock(in_ch=12, out_ch=64, gamma=2, b=1)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            cin = 64
            for s, (w, n) in enumerate(zip((64, 128, 256, 512), counts),
                                       start=1):
                blocks = [block(cin, w, stride=1 if s == 1 else 2)]
                cin = w * block.expansion
                blocks += [block(cin, w) for _ in range(n - 1)]
                setattr(self, f"layer{s}", nn.Sequential(*blocks))
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = (nn.Identity() if cin == 512
                       else nn.Linear(cin, 512))

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for s in range(1, 5):
                x = getattr(self, f"layer{s}")(x)
            return self.fc(torch.flatten(self.avgpool(x), 1))

    return ResNet()


def _build_mnv2_surgery():
    """torchvision.models.mobilenet_v2 skeleton (0.9.x naming: ConvBNReLU =
    Sequential(conv, bn, relu6); InvertedResidual.conv = [expand?, depthwise,
    project-conv, project-bn]) with the reference surgery: features[0][0] ->
    EfficientConvBlock(12 -> 32), classifier -> Linear(1280, 512)
    (backbone.py:90-100)."""
    import torch.nn as nn
    from model.blocks.basics import EfficientConvBlock

    def cbr(cin, cout, k=3, stride=1, groups=1):
        return nn.Sequential(
            nn.Conv2d(cin, cout, k, stride, (k - 1) // 2, groups=groups,
                      bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU6(inplace=True))

    class InvertedResidual(nn.Module):
        def __init__(self, cin, cout, t, stride):
            super().__init__()
            exp = cin * t
            layers = [] if t == 1 else [cbr(cin, exp, 1)]
            layers += [cbr(exp, exp, 3, stride, groups=exp),
                       nn.Conv2d(exp, cout, 1, bias=False),
                       nn.BatchNorm2d(cout)]
            self.conv = nn.Sequential(*layers)
            self.use_res = stride == 1 and cin == cout

        def forward(self, x):
            y = self.conv(x)
            return x + y if self.use_res else y

    # (out_ch, expand_ratio, stride) expanded per repeat — v2 paper Table 2
    conf = [(16, 1, 1),
            (24, 6, 2), (24, 6, 1),
            (32, 6, 2), (32, 6, 1), (32, 6, 1),
            (64, 6, 2), (64, 6, 1), (64, 6, 1), (64, 6, 1),
            (96, 6, 1), (96, 6, 1), (96, 6, 1),
            (160, 6, 2), (160, 6, 1), (160, 6, 1),
            (320, 6, 1)]

    class MNv2(nn.Module):
        def __init__(self):
            super().__init__()
            stem = nn.Sequential(
                EfficientConvBlock(in_ch=12, out_ch=32, gamma=2, b=1),
                nn.BatchNorm2d(32),
                nn.ReLU6(inplace=True))
            feats, cin = [stem], 32
            for cout, t, stride in conf:
                feats.append(InvertedResidual(cin, cout, t, stride))
                cin = cout
            feats.append(cbr(320, 1280, 1))
            self.features = nn.Sequential(*feats)
            self.classifier = nn.Linear(1280, 512)

        def forward(self, x):
            x = self.features(x)
            x = nn.functional.adaptive_avg_pool2d(x, 1)
            return self.classifier(torch.flatten(x, 1))

    return MNv2()


def _build_mnv3l_surgery():
    """torchvision.models.mobilenet_v3_large skeleton (0.9.x naming, BN
    eps=1e-3) with the reference surgery: features[0][0] ->
    EfficientConvBlock(12 -> 16), classifier[3] -> Linear(1280, 512)."""
    import torch.nn as nn
    from model.blocks.basics import EfficientConvBlock

    def make_divisible(v, divisor=8):
        nv = max(divisor, int(v + divisor / 2) // divisor * divisor)
        return nv + divisor if nv < 0.9 * v else nv

    def cba(cin, cout, k=3, stride=1, groups=1, act="RE"):
        return nn.Sequential(
            nn.Conv2d(cin, cout, k, stride, (k - 1) // 2, groups=groups,
                      bias=False),
            nn.BatchNorm2d(cout, eps=0.001, momentum=0.01),
            nn.Hardswish() if act == "HS" else nn.ReLU(inplace=True))

    class SqueezeExcitation(nn.Module):
        def __init__(self, ch):
            super().__init__()
            squeeze = make_divisible(ch // 4)
            self.fc1 = nn.Conv2d(ch, squeeze, 1)
            self.relu = nn.ReLU(inplace=True)
            self.fc2 = nn.Conv2d(squeeze, ch, 1)

        def forward(self, x):
            s = nn.functional.adaptive_avg_pool2d(x, 1)
            s = self.fc2(self.relu(self.fc1(s)))
            return x * nn.functional.hardsigmoid(s)

    class InvertedResidual(nn.Module):
        def __init__(self, cin, k, exp, cout, se, act, stride):
            super().__init__()
            layers = []
            if exp != cin:
                layers.append(cba(cin, exp, 1, act=act))
            layers.append(cba(exp, exp, k, stride, groups=exp, act=act))
            if se:
                layers.append(SqueezeExcitation(exp))
            layers.append(nn.Sequential(
                nn.Conv2d(exp, cout, 1, bias=False),
                nn.BatchNorm2d(cout, eps=0.001, momentum=0.01),
                nn.Identity()))
            self.block = nn.Sequential(*layers)
            self.use_res = stride == 1 and cin == cout

        def forward(self, x):
            y = self.block(x)
            return x + y if self.use_res else y

    # (cin, k, exp, cout, se, act, stride) — torchvision mobilenet_v3_large
    conf = [
        (16, 3, 16, 16, False, "RE", 1),
        (16, 3, 64, 24, False, "RE", 2),
        (24, 3, 72, 24, False, "RE", 1),
        (24, 5, 72, 40, True, "RE", 2),
        (40, 5, 120, 40, True, "RE", 1),
        (40, 5, 120, 40, True, "RE", 1),
        (40, 3, 240, 80, False, "HS", 2),
        (80, 3, 200, 80, False, "HS", 1),
        (80, 3, 184, 80, False, "HS", 1),
        (80, 3, 184, 80, False, "HS", 1),
        (80, 3, 480, 112, True, "HS", 1),
        (112, 3, 672, 112, True, "HS", 1),
        (112, 5, 672, 160, True, "HS", 2),
        (160, 5, 960, 160, True, "HS", 1),
        (160, 5, 960, 160, True, "HS", 1),
    ]

    class MNv3Large(nn.Module):
        def __init__(self):
            super().__init__()
            stem = nn.Sequential(
                EfficientConvBlock(in_ch=12, out_ch=16, gamma=2, b=1),
                nn.BatchNorm2d(16, eps=0.001, momentum=0.01),
                nn.Hardswish())
            feats = [stem]
            feats += [InvertedResidual(*c) for c in conf]
            feats.append(cba(160, 960, 1, act="HS"))
            self.features = nn.Sequential(*feats)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.classifier = nn.Sequential(
                nn.Linear(960, 1280), nn.Hardswish(), nn.Dropout(0.2),
                nn.Linear(1280, 512))

        def forward(self, x):
            x = self.features(x)
            return self.classifier(torch.flatten(self.avgpool(x), 1))

    return MNv3Large()


def _build_mnv3s_surgery():
    """torchvision.models.mobilenet_v3_small skeleton (0.9.x naming: blocks
    of ConvBNActivation(conv,bn,act) + SqueezeExcitation(fc1,fc2), BN
    eps=1e-3) with the reference's surgery: features[0][0] ->
    EfficientConvBlock(12 -> 16), classifier[3] -> Linear(1024, 512)
    (backbone.py:75-104)."""
    import torch.nn as nn
    from model.blocks.basics import EfficientConvBlock

    def make_divisible(v, divisor=8):
        nv = max(divisor, int(v + divisor / 2) // divisor * divisor)
        return nv + divisor if nv < 0.9 * v else nv

    def cba(cin, cout, k=3, stride=1, groups=1, act="RE"):
        return nn.Sequential(
            nn.Conv2d(cin, cout, k, stride, (k - 1) // 2, groups=groups,
                      bias=False),
            nn.BatchNorm2d(cout, eps=0.001, momentum=0.01),
            nn.Hardswish() if act == "HS" else nn.ReLU(inplace=True))

    class SqueezeExcitation(nn.Module):
        def __init__(self, ch):
            super().__init__()
            squeeze = make_divisible(ch // 4)
            self.fc1 = nn.Conv2d(ch, squeeze, 1)
            self.relu = nn.ReLU(inplace=True)
            self.fc2 = nn.Conv2d(squeeze, ch, 1)

        def forward(self, x):
            s = nn.functional.adaptive_avg_pool2d(x, 1)
            s = self.fc2(self.relu(self.fc1(s)))
            return x * nn.functional.hardsigmoid(s)

    class InvertedResidual(nn.Module):
        def __init__(self, cin, k, exp, cout, se, act, stride):
            super().__init__()
            layers = []
            if exp != cin:
                layers.append(cba(cin, exp, 1, act=act))
            layers.append(cba(exp, exp, k, stride, groups=exp, act=act))
            if se:
                layers.append(SqueezeExcitation(exp))
            layers.append(nn.Sequential(
                nn.Conv2d(exp, cout, 1, bias=False),
                nn.BatchNorm2d(cout, eps=0.001, momentum=0.01),
                nn.Identity()))
            self.block = nn.Sequential(*layers)
            self.use_res = stride == 1 and cin == cout

        def forward(self, x):
            y = self.block(x)
            return x + y if self.use_res else y

    # (cin, k, exp, cout, se, act, stride) — torchvision mobilenet_v3_small
    conf = [
        (16, 3, 16, 16, True, "RE", 2),
        (16, 3, 72, 24, False, "RE", 2),
        (24, 3, 88, 24, False, "RE", 1),
        (24, 5, 96, 40, True, "HS", 2),
        (40, 5, 240, 40, True, "HS", 1),
        (40, 5, 240, 40, True, "HS", 1),
        (40, 5, 120, 48, True, "HS", 1),
        (48, 5, 144, 48, True, "HS", 1),
        (48, 5, 288, 96, True, "HS", 2),
        (96, 5, 576, 96, True, "HS", 1),
        (96, 5, 576, 96, True, "HS", 1),
    ]

    class MNv3Small(nn.Module):
        def __init__(self):
            super().__init__()
            stem = nn.Sequential(
                EfficientConvBlock(in_ch=12, out_ch=16, gamma=2, b=1),
                nn.BatchNorm2d(16, eps=0.001, momentum=0.01),
                nn.Hardswish())
            feats = [stem]
            feats += [InvertedResidual(*c) for c in conf]
            feats.append(cba(96, 576, 1, act="HS"))
            self.features = nn.Sequential(*feats)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.classifier = nn.Sequential(
                nn.Linear(576, 1024), nn.Hardswish(), nn.Dropout(0.2),
                nn.Linear(1024, 512))

        def forward(self, x):
            x = self.features(x)
            return self.classifier(torch.flatten(self.avgpool(x), 1))

    return MNv3Small()


if __name__ == "__main__":
    main()

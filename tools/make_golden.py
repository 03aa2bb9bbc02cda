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

    save_manifest(manifests)
    print("golden fixtures written to tests/golden/")


if __name__ == "__main__":
    main()

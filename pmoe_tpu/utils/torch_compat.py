"""Torch-layout weight conversion into the flax parameter trees.

Two consumers:

* **Golden-parity tests** — identical weights are loaded into the reference's
  torch modules (to record activations) and into our flax modules (to compare),
  backing the "bit-for-bit within fp32 tolerance" contract.
* **Pretrained backbones** — the reference initializes its CNN trunks from
  torchvision ImageNet checkpoints (/root/reference/PMoE/model/blocks/
  backbone.py:49-75, ``pretrained=params.pretrained``). :func:`
  load_pretrained_backbone` grafts an exported torchvision ``state_dict``
  (``torch.save(model.state_dict(), path)`` offline, or an ``.npz`` of the
  same arrays) into every ``backbone`` subtree of a model's params — including
  the K-stacked expert axis of the MoE, where the weights are broadcast.

All converters take a plain ``{name: np.ndarray}`` mapping (a torch state_dict
viewed as numpy), so torch itself is only needed when reading ``.pth`` files.

Layout rules (torch -> flax):
  Linear   weight (out, in)            -> kernel (in, out)
  Conv2d   weight (out, in, kh, kw)    -> kernel (kh, kw, in, out)
  ConvT2d  weight (in, out, kh, kw)    -> kernel (kh, kw, in, out), spatially
                                          flipped (torch's transposed conv is
                                          the conv gradient; flax/lax
                                          conv_transpose correlates directly)
  Conv1d   weight (1, 1, k)  [ECA]     -> kernel (k, 1, 1)
  BatchNorm weight/bias/running_mean/running_var -> scale/bias + mean/var
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Mapping, Tuple

import numpy as np

__all__ = [
    "linear_from_torch", "conv_from_torch", "conv_transpose_from_torch",
    "bn_from_torch", "eca_from_torch", "mlp_from_torch", "conv3_from_torch",
    "efficient_conv_block_from_torch", "unet_from_torch",
    "resnet_from_torchvision", "load_state_dict_file",
    "load_pretrained_backbone", "resnet_backbone_from_torch",
    "mobilenet_backbone_from_torch",
]

Array = np.ndarray
SD = Mapping[str, Array]


def linear_from_torch(sd: SD, prefix: str) -> Dict[str, Array]:
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def conv_from_torch(sd: SD, prefix: str) -> Dict[str, Array]:
    out = {"kernel": np.ascontiguousarray(
        np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0)))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def conv_transpose_from_torch(sd: SD, prefix: str) -> Dict[str, Array]:
    # torch (in, out, kh, kw): flip spatial dims, then (kh, kw, in, out)
    w = sd[f"{prefix}.weight"][:, :, ::-1, ::-1]
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def bn_from_torch(sd: SD, prefix: str) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    params = {"scale": np.asarray(sd[f"{prefix}.weight"]),
              "bias": np.asarray(sd[f"{prefix}.bias"])}
    stats = {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
             "var": np.asarray(sd[f"{prefix}.running_var"])}
    return params, stats


def _dot(prefix: str) -> str:
    return prefix if (not prefix or prefix.endswith(".")) else prefix + "."


def eca_from_torch(sd: SD, prefix: str = "") -> Dict[str, Array]:
    """EfficientBlock's Conv1d(1, 1, k) -> our (k, 1, 1) WIO kernel
    (reference basics.py:68)."""
    w = sd[f"{_dot(prefix)}conv.weight"]     # (1, 1, k)
    return {"conv_kernel": np.ascontiguousarray(
        np.transpose(w, (2, 1, 0)))}


def mlp_from_torch(sd: SD, prefix: str, dims, bn: bool,
                   dropout: float = 0.0, act_between: bool = True):
    """``make_mlp`` Sequential (reference basics.py:10-44): layer indices
    depend on bn/dropout placement; walk them in construction order."""
    params: Dict[str, dict] = {}
    stats: Dict[str, dict] = {}
    idx = 0
    n = len(dims) - 1
    for i in range(n):
        params[f"dense_{i}"] = linear_from_torch(sd, f"{prefix}{idx}")
        idx += 1
        if i != n - 1:
            if bn:
                p, s = bn_from_torch(sd, f"{prefix}{idx}")
                params[f"bn_{i}"] = p
                stats[f"bn_{i}"] = s
                idx += 1
            idx += 1                          # activation module
            if dropout > 0.0:
                idx += 1                      # dropout module
    return params, stats


def conv3_from_torch(sd: SD, prefix: str):
    """``conv3`` Sequential: indices 0,1 (conv,bn) then 3,4
    (reference basics.py:47-58)."""
    params, stats = {}, {}
    for i, base in enumerate((0, 3)):
        params[f"conv_{i}"] = conv_from_torch(sd, f"{prefix}{base}")
        p, s = bn_from_torch(sd, f"{prefix}{base + 1}")
        params[f"bn_{i}"] = p
        stats[f"bn_{i}"] = s
    return params, stats


def efficient_conv_block_from_torch(sd: SD, prefix: str = ""):
    """EfficientConvBlock: layer{1,2} = (eca{1,2}, conv{1,2}: Sequential of
    conv/bn/relu) (reference basics.py:79-134)."""
    params, stats = {}, {}
    prefix = _dot(prefix)
    for i in (0, 1):
        params[f"eca_{i}"] = eca_from_torch(sd, f"{prefix}layer{i+1}.eca{i+1}")
        conv_prefix = f"{prefix}layer{i+1}.conv{i+1}."
        params[f"conv_{i}"] = conv_from_torch(sd, f"{conv_prefix}0")
        p, s = bn_from_torch(sd, f"{conv_prefix}1")
        params[f"bn_{i}"] = p
        stats[f"bn_{i}"] = s
    return params, stats


def unet_from_torch(sd: SD, prefix: str = ""):
    """Full UNet tree (reference unet.py:8-95): dwn_1..5 conv3 encoders,
    up_1..4 transposed convs, up_forw_1..4 conv3 decoders, 1x1 out conv."""
    params, stats = {}, {}
    for i in range(1, 6):
        p, s = conv3_from_torch(sd, f"{prefix}dwn_{i}.")
        params[f"dwn_{i}"] = p
        stats[f"dwn_{i}"] = s
    for i in range(1, 5):
        ct = conv_transpose_from_torch(sd, f"{prefix}up_{i}")
        # _Up owns the bias (added after output_size spatial matching)
        params[f"up_{i}"] = {"ConvTranspose_0": {"kernel": ct["kernel"]},
                             "bias": ct["bias"]}
        p, s = conv3_from_torch(sd, f"{prefix}up_forw_{i}.")
        params[f"up_forw_{i}"] = p
        stats[f"up_forw_{i}"] = s
    params["out"] = conv_from_torch(sd, f"{prefix}out")
    return params, stats


def unet_eca_from_torch(sd: SD, prefix: str = ""):
    """UNetECA tree (reference unet.py:98-185): the UNet mapping plus the
    five ECA gates (bottleneck + each skip-merge)."""
    params, stats = unet_from_torch(sd, prefix)
    prefix = _dot(prefix)
    for i in range(5):
        params[f"eca_{i}"] = eca_from_torch(sd, f"{prefix}eca_{i}")
    return params, stats


def punet_from_torch(sd: SD, prefix: str = ""):
    """Full PredictiveUnet tree (reference punet.py:12-120): frozen seg
    ``unet``, plus the trainable rollout pair ``entry_block`` + ``pred_unet``
    (scanned in our implementation, so they live under the 'rollout' scope
    with no leading axis — params are broadcast across scan steps)."""
    prefix = _dot(prefix)
    params, stats = {}, {}
    params["unet"], stats["unet"] = unet_from_torch(sd, f"{prefix}unet.")
    ep, es = efficient_conv_block_from_torch(sd, f"{prefix}entry_block.")
    pp, ps = unet_from_torch(sd, f"{prefix}pred_unet.")
    params["rollout"] = {"entry_block": ep, "pred_unet": pp}
    stats["rollout"] = {"entry_block": es, "pred_unet": ps}
    return params, stats


# ---------------------------------------------------------------------------
# torchvision ImageNet backbones
# ---------------------------------------------------------------------------

def _resnet_block_from_torch(sd: SD, prefix: str, bottleneck: bool):
    params, stats = {}, {}
    n_convs = 3 if bottleneck else 2
    for c in range(1, n_convs + 1):
        params[f"conv{c}"] = conv_from_torch(sd, f"{prefix}.conv{c}")
        p, s = bn_from_torch(sd, f"{prefix}.bn{c}")
        params[f"bn{c}"] = p
        stats[f"bn{c}"] = s
    if f"{prefix}.downsample.0.weight" in sd:
        params["downsample_conv"] = conv_from_torch(sd, f"{prefix}.downsample.0")
        p, s = bn_from_torch(sd, f"{prefix}.downsample.1")
        params["downsample_bn"] = p
        stats["downsample_bn"] = s
    return params, stats


def resnet_from_torchvision(sd: SD, arch: str = "resnet18"):
    """Map a torchvision resnet state_dict onto our ResNetBackbone: bn1 (the
    reference's surgery keeps torchvision's bn1 after the replaced conv1,
    backbone.py:63-65) and the interior stages (layer1..4 -> layer{s}_{i}).
    The conv1 slot (replaced by the EfficientConvBlock) and the classifier
    head (forced to 512-d, :66-71) are intentionally NOT mapped — they train
    from scratch, like the reference's surgery on the torchvision model."""
    from ..nn.resnet import RESNET_SPECS

    spec = RESNET_SPECS[arch.lower()]
    bottleneck = spec["block"] == "bottleneck"
    params, stats = {}, {}
    if "bn1.weight" in sd:
        p, s = bn_from_torch(sd, "bn1")
        params["bn1"] = p
        stats["bn1"] = s
    for stage, n_blocks in enumerate(spec["layers"], start=1):
        for i in range(n_blocks):
            p, s = _resnet_block_from_torch(sd, f"layer{stage}.{i}",
                                            bottleneck)
            params[f"layer{stage}_{i}"] = p
            stats[f"layer{stage}_{i}"] = s
    return params, stats


def resnet_backbone_from_torch(sd: SD, arch: str = "resnet18"):
    """Full post-surgery resnet (reference backbone.py:49-71: conv1 replaced
    by an EfficientConvBlock, fc forced to 512-d/Identity) -> our
    :class:`~pmoe_tpu.nn.resnet.ResNetBackbone` variables."""
    params, stats = resnet_from_torchvision(sd, arch)
    p, s = efficient_conv_block_from_torch(sd, "conv1")
    params["stem"] = p
    stats["stem"] = s
    if "fc.weight" in sd and sd["fc.weight"].shape[0] == 512:
        params["fc"] = linear_from_torch(sd, "fc")   # resnet50's 2048->512
    return params, stats


def _conv_bn_act_from_torch(sd: SD, conv_prefix: str, bn_prefix: str):
    """torchvision ConvBNActivation -> our _ConvBNAct (auto-named Conv_0 /
    BatchNorm_0)."""
    params = {"Conv_0": conv_from_torch(sd, conv_prefix)}
    p, s = bn_from_torch(sd, bn_prefix)
    params["BatchNorm_0"] = p
    return params, {"BatchNorm_0": s}


def _se_from_torch(sd: SD, prefix: str) -> Dict[str, Array]:
    """torchvision SqueezeExcitation (1x1 convs fc1/fc2) -> our _SqueezeExcite
    (Dense_0/Dense_1): (out,in,1,1) conv kernels transpose to (in,out)."""
    out = {}
    for i, fc in enumerate(("fc1", "fc2")):
        w = sd[f"{prefix}.{fc}.weight"][..., 0, 0]        # (out, in)
        out[f"Dense_{i}"] = {"kernel": np.ascontiguousarray(w.T),
                             "bias": np.asarray(sd[f"{prefix}.{fc}.bias"])}
    return out


def mobilenet_backbone_from_torch(sd: SD, arch: str = "mobilenet_v3_small"):
    """Full post-surgery torchvision mobilenet (reference backbone.py:75-104:
    features[0][0] replaced by an EfficientConvBlock, classifier forced to
    512-d) -> our :class:`~pmoe_tpu.nn.mobilenet.MobileNetBackbone` variables.

    torchvision naming (v0.9.x): v3 InvertedResidual.block is a Sequential of
    ConvBNActivation(0=conv,1=bn,2=act) and SqueezeExcitation(fc1/fc2) in
    order [expand?, depthwise, se?, project]; v2 InvertedResidual.conv is
    [expand?, depthwise, project-conv, project-bn]."""
    from ..nn.mobilenet import _V2_BLOCKS, _V3_LARGE_BLOCKS, _V3_SMALL_BLOCKS

    arch = arch.lower()
    params, stats = {}, {}
    p, s = efficient_conv_block_from_torch(sd, "features.0.0")
    params["stem"] = p
    stats["stem"] = s
    p, s = bn_from_torch(sd, "features.0.1")
    params["stem_bn"] = p
    stats["stem_bn"] = s

    def put(name, p, s):
        params.setdefault(bname, {})[name] = p
        if s:
            stats.setdefault(bname, {})[name] = s

    if arch == "mobilenet_v2":
        in_ch = 32
        for i, (out_ch, t, stride) in enumerate(_V2_BLOCKS):
            bname = f"block_{i}"
            tv = f"features.{i + 1}.conv"
            j = 0
            if t != 1:                                  # expand stage exists
                p, s = _conv_bn_act_from_torch(sd, f"{tv}.{j}.0", f"{tv}.{j}.1")
                put("expand", p, s)
                j += 1
            p, s = _conv_bn_act_from_torch(sd, f"{tv}.{j}.0", f"{tv}.{j}.1")
            put("depthwise", p, s)
            p, s = _conv_bn_act_from_torch(sd, f"{tv}.{j + 1}", f"{tv}.{j + 2}")
            put("project", p, s)
            in_ch = out_ch
        bname = "head_conv"
        p, s = _conv_bn_act_from_torch(sd, "features.18.0", "features.18.1")
        params["head_conv"], stats["head_conv"] = p, s
        params["classifier"] = linear_from_torch(sd, "classifier")
        return params, stats

    blocks = _V3_LARGE_BLOCKS if arch == "mobilenet_v3_large" \
        else _V3_SMALL_BLOCKS
    in_ch = 16
    for i, (k, exp, out_ch, se, act, stride) in enumerate(blocks):
        bname = f"block_{i}"
        tv = f"features.{i + 1}.block"
        j = 0
        if exp != in_ch:                                # expand stage exists
            p, s = _conv_bn_act_from_torch(sd, f"{tv}.{j}.0", f"{tv}.{j}.1")
            put("expand", p, s)
            j += 1
        p, s = _conv_bn_act_from_torch(sd, f"{tv}.{j}.0", f"{tv}.{j}.1")
        put("depthwise", p, s)
        j += 1
        if se:
            put("se", _se_from_torch(sd, f"{tv}.{j}"), None)
            j += 1
        p, s = _conv_bn_act_from_torch(sd, f"{tv}.{j}.0", f"{tv}.{j}.1")
        put("project", p, s)
        in_ch = out_ch
    last = len(blocks) + 1
    p, s = _conv_bn_act_from_torch(sd, f"features.{last}.0",
                                   f"features.{last}.1")
    params["head_conv"], stats["head_conv"] = p, s
    params["pre_classifier"] = linear_from_torch(sd, "classifier.0")
    params["classifier"] = linear_from_torch(sd, "classifier.3")
    return params, stats


def load_state_dict_file(path: str) -> Dict[str, Array]:
    """Read an exported state_dict: ``.pth/.pt`` via torch (CPU), ``.npz``
    directly."""
    path = str(path)
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().numpy() for k, v in sd.items()}


def _graft_backbone(dst: dict, src: dict, dst_stats: dict, src_stats: dict):
    """Copy matching leaves; broadcast over a leading stacked-expert axis when
    the destination has one extra dim (nn.vmap-stacked MoE experts)."""
    n_loaded = 0

    def rec(d, s):
        nonlocal n_loaded
        for k, v in s.items():
            if k not in d:
                continue
            if isinstance(v, dict):
                rec(d[k], v)
            else:
                tgt = d[k]
                if tgt.shape == v.shape:
                    d[k] = v.astype(np.asarray(tgt).dtype)
                    n_loaded += 1
                elif (np.ndim(tgt) == v.ndim + 1
                      and tuple(tgt.shape[1:]) == v.shape):
                    d[k] = np.broadcast_to(
                        v, tgt.shape).astype(np.asarray(tgt).dtype).copy()
                    n_loaded += 1
    rec(dst, src)
    rec(dst_stats, src_stats)
    return n_loaded


def load_pretrained_backbone(params: dict, batch_stats: dict, arch: str,
                             path: str, verbose: bool = True):
    """Graft ImageNet weights into every ``backbone`` subtree of ``params``.

    Returns (params, batch_stats, n_loaded_leaves). Mutates copies, not the
    inputs. Safe no-op (n=0) when no ``backbone`` scope matches."""
    import copy

    sd = load_state_dict_file(path)
    src_p, src_s = resnet_from_torchvision(sd, arch)
    params = copy.deepcopy(
        {k: v for k, v in params.items()}) if params else {}
    batch_stats = copy.deepcopy(
        {k: v for k, v in batch_stats.items()}) if batch_stats else {}
    total = 0

    def walk(p, s):
        nonlocal total
        for k in list(p.keys()):
            if not isinstance(p[k], dict):
                continue
            if k == "backbone":
                total += _graft_backbone(p[k], src_p,
                                         s.get(k, {}) if s else {}, src_s)
            else:
                walk(p[k], s.get(k, {}) if isinstance(s, dict) else {})

    walk(params, batch_stats)
    if verbose:
        print(f"[pretrained] {arch}: grafted {total} leaves from {path}")
    return params, batch_stats, total

"""Action-prediction model zoo: MoE / MoE-alt / MoE-shared / PU-Net expert / PMoE.

TPU-native redesign of /root/reference/PMoE/model/moe.py. The key structural
change: the K unshared experts of ``MixtureOfExperts`` are NOT a Python loop
over modules (reference moe.py:140-148) but a single expert with K-stacked
parameters (``nn.vmap`` with ``variable_axes={'params': 0}``) — every expert
matmul/conv becomes one batched MXU contraction over the expert axis, and the
expert axis is shardable across devices (expert parallelism; see
pmoe_tpu.parallel).

Interface contract (reference moe.py:358-363): every model maps
``(images[B,T,H,W,C], speed[B,1], command[B,n])`` to ``(actions, speed_pred)``
and offers ``sample`` drawing concrete actions. Images are NHWC (TPU layout);
time is folded into channels frame-major, matching the reference's
``images.view(B, T*C, H, W)`` (moe.py:90-92).

Mixture distribution semantics match ``MixtureSameFamily(Categorical(softmax
alpha), Independent(Normal(mean, elu(std)+1), 1))`` (moe.py:96-99,152-157).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import MLP
from ..nn.backbone import SegmentationBackbone
from ..ops.distributions import MixtureOfGaussians
from .punet import PredictiveUNet

__all__ = [
    "get_model",
    "BaseExpert",
    "MixtureOfExperts",
    "MixtureOfExpertsShared",
    "PUNetExpert",
    "PMoE",
    "MODEL_TYPES",
]

Dtype = Any

MODEL_TYPES = (
    "moe", "moe_alt", "moe_shared", "punet", "punet_inter",
    "pmoe", "pmoe+pretrained",
)


def _mlp(cfg: Mapping, dtype, param_dtype, name: str) -> MLP:
    return MLP(
        dims=tuple(cfg["dims"]),
        act=cfg.get("act", "relu"),
        l_act=bool(cfg.get("l_act", False)),
        bn=bool(cfg.get("bn", True)),
        dropout=float(cfg.get("dropout", 0.0)),
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )


def _build_backbone(backbone_cfg: Mapping, dtype, param_dtype,
                    n_frames: int | None = None, n_channels: int = 3,
                    name: str = "backbone"):
    """Reference backbone selection (moe.py:57-66): 'rgb' -> CNN zoo,
    'segmentation' -> pretrained U-Net feature extractor."""
    btype = backbone_cfg.get("type", "rgb")
    n_frames = int(n_frames if n_frames is not None
                   else backbone_cfg.get("n_frames", 4))
    if btype == "rgb":
        rgb = dict(backbone_cfg.get("rgb", {}))
        arch = rgb.get("arch", "resnet18").lower()
        common = dict(in_channels=n_frames * n_channels,
                      gamma=int(rgb.get("gamma", 2)), b=int(rgb.get("b", 1)),
                      dtype=dtype, param_dtype=param_dtype, name=name)
        from ..nn.resnet import RESNET_SPECS, ResNetBackbone
        from ..nn.mobilenet import MobileNetBackbone
        from ..nn.backbone import TinyBackbone
        if arch == "tiny":
            common.pop("gamma"), common.pop("b")
            return TinyBackbone(**common)
        if arch in RESNET_SPECS:
            return ResNetBackbone(arch=arch, **common)
        if "mobilenet" in arch:
            return MobileNetBackbone(arch=arch, **common)
        raise ValueError(f"Unknown backbone arch {arch!r}")
    seg = dict(backbone_cfg.get("segmentation", {}))
    return SegmentationBackbone(
        n_frames=n_frames,
        n_channels=n_channels,
        gamma=int(seg.get("gamma", 2)),
        b=int(seg.get("b", 1)),
        model_dir=str(seg.get("model_dir", "")),
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )


def _fold_time(images: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, H, W, T*C), frame-major channel blocks."""
    B, T, H, W, C = images.shape
    return jnp.moveaxis(images, 1, 3).reshape(B, H, W, T * C)


class BaseExpert(nn.Module):
    """One expert (reference moe.py:50-128). ``alt=True`` switches the gate to
    the input-feature MLP of ``BaseExpertAlt`` (moe.py:104-128)."""

    cfg: Mapping            # the model config block (speed_encoder, backbone, ...)
    alt: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, speed, command, train: bool = False):
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        speed_f = _mlp(self.cfg["speed_encoder"], name="speed_encoder", **dt)(
            speed, train)
        command_f = _mlp(self.cfg["command_encoder"], name="command_encoder", **dt)(
            command, train)
        backbone = _build_backbone(self.cfg["backbone"], name="backbone", **dt)
        img_f = backbone(_fold_time(images), train)

        features = jnp.concatenate([img_f, speed_f, command_f], axis=-1)
        pred_speed = _mlp(self.cfg["speed_prediction"], name="speed_pred", **dt)(
            features, train)
        action_f = _mlp(self.cfg["action_head"], name="action_features", **dt)(
            features, train)
        mean, std = jnp.split(
            nn.Dense(4, name="action_pred", **dt)(action_f), 2, axis=-1)
        std = nn.elu(std) + 1.0
        if self.alt:
            h = nn.relu(nn.Dense(512, name="alpha_hidden", **dt)(features))
            alpha = nn.Dense(1, name="alpha_out", **dt)(h)
        else:
            alpha = nn.relu(nn.Dense(1, name="alpha", **dt)(action_f))
        return alpha, mean, std, pred_speed


class MixtureOfExperts(nn.Module):
    """K weight-disjoint experts, stacked on a leading axis (reference
    moe.py:131-177). Forward returns the mixture distribution and per-expert
    speed predictions (B, K, 1)."""

    cfg: Mapping
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _stack(self):
        return nn.vmap(
            BaseExpert,
            in_axes=(None, None, None, None),
            out_axes=0,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "dropout": True},
            axis_size=int(self.cfg["n_experts"]),
        )(cfg=self.cfg, alt=self.cfg.get("type") == "moe_alt",
          dtype=self.dtype, param_dtype=self.param_dtype, name="experts")

    @nn.compact
    def __call__(self, images, speed, command, train: bool = False):
        alphas, mean, std, speeds = self._stack()(images, speed, command, train)
        # (K, B, ...) -> batch-major
        probs = jax.nn.softmax(alphas[..., 0].T, axis=-1)       # (B, K)
        dist = MixtureOfGaussians(
            probs=probs,
            mean=jnp.moveaxis(mean, 0, 1),                      # (B, K, 2)
            std=jnp.moveaxis(std, 0, 1),
        )
        return dist, jnp.moveaxis(speeds, 0, 1)                 # (B, K, 1)

    def sample(self, images, speed, command, train: bool = False):
        dist, _ = self(images, speed, command, train)
        return dist.sample(self.make_rng("sample"))


class MixtureOfExpertsShared(nn.Module):
    """Shared-backbone MoE (reference moe.py:180-265): one trunk, heads emit
    (B, K, 4) mixture params and a single speed prediction."""

    cfg: Mapping
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, speed, command, train: bool = False):
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        K = int(self.cfg["n_experts"])
        speed_f = _mlp(self.cfg["speed_encoder"], name="speed_encoder", **dt)(
            speed, train)
        command_f = _mlp(self.cfg["command_encoder"], name="command_encoder", **dt)(
            command, train)
        backbone = _build_backbone(self.cfg["backbone"], name="backbone", **dt)
        img_f = backbone(_fold_time(images), train)

        features = jnp.concatenate([img_f, speed_f, command_f], axis=-1)
        pred_speed = _mlp(self.cfg["speed_prediction"], name="speed_pred", **dt)(
            features, train)
        action_f = _mlp(self.cfg["action_head"], name="action_features", **dt)(
            features, train)
        raw = nn.Dense(4 * K, name="action_pred", **dt)(action_f)
        mean, std = jnp.split(raw.reshape(raw.shape[0], K, 4), 2, axis=-1)
        std = nn.elu(std) + 1.0
        probs = jax.nn.softmax(nn.Dense(K, name="alpha", **dt)(action_f), axis=-1)
        dist = MixtureOfGaussians(probs=probs, mean=mean, std=std)
        return dist, pred_speed

    def sample(self, images, speed, command, train: bool = False):
        dist, _ = self(images, speed, command, train)
        return dist.sample(self.make_rng("sample"))


class PUNetExpert(nn.Module):
    """PU-Net as a deterministic action expert (reference moe.py:268-323).
    ``punet_inter`` skips the RGB backbone and uses the PU-Net bottleneck."""

    cfg: Mapping
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, speed, command, train: bool = False,
                 seg_masks=None, seg_only: bool = False):
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        return_inter = self.cfg.get("type") == "punet_inter"
        punet_cfg = dict(self.cfg["punet"])
        punet = PredictiveUNet(
            past_frames=int(punet_cfg.get("past_frames", 4)),
            future_frames=int(punet_cfg.get("future_frames", 4)),
            in_features=int(punet_cfg.get("in_features", 3)),
            num_classes=int(punet_cfg.get("num_classes", 23)),
            gamma=int(punet_cfg.get("gamma", 2)),
            b=int(punet_cfg.get("b", 1)),
            inter_repr=return_inter,
            unet_inter_repr=bool(punet_cfg.get("unet_inter_repr", False)),
            name="punet",
            **dt,
        )
        if seg_only:
            # segmentation masks only (any frame count) — the DDPG window path
            return punet(images, train=False, seg_only=True)
        speed_f = _mlp(self.cfg["speed_encoder"], name="speed_encoder", **dt)(
            speed, train)
        command_f = _mlp(self.cfg["command_encoder"], name="command_encoder", **dt)(
            command, train)

        # The pretrained PU-Net is frozen (reference moe.py:281-283).
        punet_out = jax.lax.stop_gradient(
            punet(images, train=False, seg_masks=seg_masks))
        if return_inter:
            img_f = punet_out
        else:
            backbone = _build_backbone(
                self.cfg["backbone"],
                n_frames=int(punet_cfg.get("future_frames", 4)),
                n_channels=int(punet_cfg.get("num_classes", 23)),
                name="backbone", **dt)
            img_f = backbone(_fold_time(punet_out), train)

        features = jnp.concatenate([img_f, speed_f, command_f], axis=-1)
        action_f = _mlp(self.cfg["action_head"], name="action_head", **dt)(
            features, train)
        actions = jnp.tanh(nn.Dense(2, name="action_out", **dt)(action_f))
        pred_speed = _mlp(self.cfg["speed_prediction"], name="speed_pred", **dt)(
            features, train)
        return actions, pred_speed

    def sample(self, images, speed, command, train: bool = False):
        actions, _ = self(images, speed, command, train)
        return actions


class PMoE(nn.Module):
    """Fusion of a frozen MoE (sampled) and a PU-Net expert through per-axis
    Linear(2 -> 1) mixers + tanh (reference moe.py:326-363). Speed output is the
    dummy -1 for interface consistency. Needs a 'sample' RNG stream.

    The forward is split into :meth:`trunk` (the expensive MoE sample +
    PU-Net expert pass — entirely frozen under the stage-3 recipe) and
    :meth:`head` (the two mixers) so the DDPG learn step can batch the actor
    and target-actor trunks into one double-size pass
    (models/rl_agent.py fused path)."""

    cfg: Mapping
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.moe = MixtureOfExperts(cfg=self.cfg, **dt)
        self.punet = PUNetExpert(cfg=self.cfg, **dt)
        self.lat_weights = nn.Dense(1, **dt)
        self.long_weights = nn.Dense(1, **dt)

    def trunk(self, images, speed, command, train: bool = False):
        """(moe_actions, punet_actions) — everything upstream of the mixers."""
        punet_actions, _ = self.punet(images, speed, command, train)
        dist, _ = self.moe(images, speed, command, train)
        moe_actions = dist.sample(self.make_rng("sample"))
        return moe_actions, punet_actions

    def trunk_pair(self, window, speed, command, train: bool = False):
        """Fused trunk over two OVERLAPPING frame stacks s / s' sharing T-1
        frames (consecutive replay transitions): ``window`` is the (B, T+1,
        H, W, C) union, ``speed``/``command`` are the stacked (2B, ...) inputs
        for [s; s']. The frozen segmentation U-Net runs once over the T+1
        unique frames instead of the 2T stacked ones (5 instead of 8 passes at
        the reference T=4 — the DDPG learn step's biggest redundant compute),
        then both stacks' mask windows are gathered from it. Outputs are
        ordered [s; s'] exactly like ``trunk`` on the concatenated stacks."""
        T = window.shape[1] - 1
        masks = self.punet(window, None, None, False,
                           seg_only=True)                   # (B, T+1, H, W, K)
        masks2 = jnp.concatenate([masks[:, :T], masks[:, 1:]], axis=0)
        images2 = jnp.concatenate([window[:, :T], window[:, 1:]], axis=0)
        punet_actions, _ = self.punet(images2, speed, command, train,
                                      seg_masks=masks2)
        dist, _ = self.moe(images2, speed, command, train)
        moe_actions = dist.sample(self.make_rng("sample"))
        return moe_actions, punet_actions

    def head(self, moe_actions, punet_actions):
        """Per-axis Linear(2 -> 1) mixers + tanh over the trunk outputs."""
        lat = self.lat_weights(
            jnp.concatenate([moe_actions[:, 0:1], punet_actions[:, 0:1]], axis=-1))
        lon = self.long_weights(
            jnp.concatenate([moe_actions[:, 1:2], punet_actions[:, 1:2]], axis=-1))
        return jnp.tanh(jnp.concatenate([lat, lon], axis=-1))

    def __call__(self, images, speed, command, train: bool = False):
        moe_actions, punet_actions = self.trunk(images, speed, command, train)
        return self.head(moe_actions, punet_actions), -1

    def sample(self, images, speed, command, train: bool = False):
        actions, _ = self(images, speed, command, train)
        return actions


def get_model(cfg: Mapping, dtype=jnp.float32, param_dtype=jnp.float32) -> nn.Module:
    """Config-driven model factory keyed on the same ``model.type`` strings as
    the reference (moe.py:25-47)."""
    model_type = cfg.get("type")
    assert model_type is not None, "Network type can not be None"
    if model_type in ("moe", "moe_alt"):
        return MixtureOfExperts(cfg=cfg, dtype=dtype, param_dtype=param_dtype)
    if model_type == "moe_shared":
        return MixtureOfExpertsShared(cfg=cfg, dtype=dtype, param_dtype=param_dtype)
    if model_type in ("punet", "punet_inter"):
        return PUNetExpert(cfg=cfg, dtype=dtype, param_dtype=param_dtype)
    if model_type in ("pmoe", "pmoe+pretrained"):
        pmoe_cfg = cfg.get("pmoe", {})
        assert pmoe_cfg.get("moe_dir", "") != "", (
            "MoE pretrained weights directory should be specified")
        if model_type == "pmoe+pretrained":
            assert pmoe_cfg.get("punet_dir", "") != "", (
                "PU-Net pretrained weights directory should be specified")
        return PMoE(cfg=cfg, dtype=dtype, param_dtype=param_dtype)
    raise ValueError(
        f"{model_type} is UNKNOWN, model type should be one of {MODEL_TYPES}")

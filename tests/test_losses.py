"""Golden numerics tests: loss functions vs independent torch implementations.

torch (CPU) is used as the oracle for the reference's loss semantics — dice
weights, torch weighted-CE normalization, tversky, mixture NLL — on random
inputs at fp32 tolerance (SURVEY §4's golden-test strategy)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pmoe_tpu.ops.distributions import MixtureOfGaussians
from pmoe_tpu.trainer import losses as L

RTOL, ATOL = 2e-4, 2e-5


@pytest.fixture
def seg_batch():
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(2, 12, 16, 5)).astype(np.float32)   # NHWC
    target = rng.integers(0, 5, (2, 12, 16)).astype(np.int64)
    return pred, target


def _torch_class_dice(pred_nchw, target, eps=1e-6):
    num_classes = pred_nchw.size(1)
    pred_class = torch.argmax(pred_nchw, dim=1)
    out = []
    for c in range(num_classes):
        p = (pred_class == c).float()
        t = (target == c).float()
        inter = (p * t).sum() + eps
        union = p.sum() + t.sum() + eps
        out.append(1 - 2 * inter / union)
    return torch.stack(out)


def test_class_dice_matches_torch(seg_batch):
    pred, target = seg_batch
    ours = np.asarray(L.class_dice(jnp.asarray(pred), jnp.asarray(target)))
    ref = _torch_class_dice(
        torch.tensor(pred).permute(0, 3, 1, 2), torch.tensor(target)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=RTOL, atol=ATOL)


def test_tversky_matches_torch(seg_batch):
    pred, target = seg_batch
    p = torch.tensor(pred).permute(0, 3, 1, 2)
    t = torch.tensor(target)
    t_oh = torch.zeros_like(p).scatter_(1, t.unsqueeze(1), 1.0)
    probs = F.softmax(p, dim=1)
    # the reference reduces over (0,) + range(2, target.ndim) == (0, 2) —
    # the last spatial axis survives into the mean (loss.py:41); we replicate
    dims = (0,) + tuple(range(2, t.ndim))
    inter = (probs * t_oh).sum(dims)
    fps = (probs * (1 - t_oh)).sum(dims)
    fns = ((1 - probs) * t_oh).sum(dims)
    ref = 1 - (inter / (inter + 0.5 * fps + 0.5 * fns)).mean()
    ours = float(L.tversky_loss(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(ours, float(ref), rtol=RTOL, atol=ATOL)


def test_ce_tversky_matches_torch(seg_batch):
    pred, target = seg_batch
    p = torch.tensor(pred).permute(0, 3, 1, 2)
    t = torch.tensor(target)
    w = _torch_class_dice(p, t)
    ce = F.cross_entropy(p, t, weight=w)
    t_oh = torch.zeros_like(p).scatter_(1, t.unsqueeze(1), 1.0)
    probs = F.softmax(p, dim=1)
    # the reference reduces over (0,) + range(2, target.ndim) == (0, 2) —
    # the last spatial axis survives into the mean (loss.py:41); we replicate
    dims = (0,) + tuple(range(2, t.ndim))
    inter = (probs * t_oh).sum(dims)
    fps = (probs * (1 - t_oh)).sum(dims)
    fns = ((1 - probs) * t_oh).sum(dims)
    tv = 1 - (inter / (inter + 0.5 * fps + 0.5 * fns)).mean()
    ref = 0.5 * ce + 0.5 * tv
    ours = float(L.cross_entropy_tversky_weighted_loss(
        jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(ours, float(ref), rtol=RTOL, atol=ATOL)


def test_mixture_nll_matches_torch():
    rng = np.random.default_rng(1)
    B, K, D = 4, 3, 2
    logits = rng.normal(size=(B, K)).astype(np.float32)
    mean = rng.normal(size=(B, K, D)).astype(np.float32)
    std = (0.5 + rng.uniform(size=(B, K, D))).astype(np.float32)
    x = rng.normal(size=(B, D)).astype(np.float32)

    probs = torch.softmax(torch.tensor(logits), dim=-1)
    mix = torch.distributions.Categorical(probs)
    comp = torch.distributions.Independent(
        torch.distributions.Normal(torch.tensor(mean), torch.tensor(std)), 1)
    dist = torch.distributions.MixtureSameFamily(mix, comp)
    ref_lp = dist.log_prob(torch.tensor(x)).numpy()

    ours = MixtureOfGaussians(
        probs=jnp.asarray(np.asarray(probs)),
        mean=jnp.asarray(mean), std=jnp.asarray(std))
    np.testing.assert_allclose(np.asarray(ours.log_prob(jnp.asarray(x))),
                               ref_lp, rtol=RTOL, atol=ATOL)


def test_moe_loss_per_expert_speed_broadcast():
    rng = np.random.default_rng(2)
    B, K = 4, 3
    dist = MixtureOfGaussians(
        probs=jnp.full((B, K), 1 / K),
        mean=jnp.asarray(rng.normal(size=(B, K, 2)).astype(np.float32)),
        std=jnp.ones((B, K, 2)))
    speed_pred = jnp.asarray(rng.normal(size=(B, K, 1)).astype(np.float32))
    speed_gt = jnp.asarray(rng.normal(size=(B, 1)).astype(np.float32))
    action_gt = jnp.zeros((B, 2))
    loss = L.moe_loss(dist, speed_pred, action_gt, speed_gt, (0.7, 0.3))
    # manual: nll + mse over expert-broadcast speed / K
    nll = -np.mean(np.asarray(dist.log_prob(action_gt)))
    sp = np.asarray(speed_pred)
    sg = np.broadcast_to(np.asarray(speed_gt)[:, None, :], sp.shape)
    mse = np.mean((sp - sg) ** 2) / K
    np.testing.assert_allclose(float(loss), 0.7 * nll + 0.3 * mse,
                               rtol=RTOL, atol=ATOL)


def test_autoregressive_loss_l1_sum_over_frames():
    rng = np.random.default_rng(3)
    inputs = rng.normal(size=(2, 3, 8, 8, 5)).astype(np.float32)
    targets = rng.integers(0, 5, (2, 3, 8, 8))
    total = float(L.autoregressive_loss(jnp.asarray(inputs),
                                        jnp.asarray(targets), "l1"))
    per_frame = 0.0
    for t in range(3):
        oh = np.eye(5, dtype=np.float32)[targets[:, t]]
        per_frame += np.abs(inputs[:, t] - oh).mean()
    np.testing.assert_allclose(total, per_frame, rtol=RTOL, atol=ATOL)


def test_sample_respects_mixture_weights():
    import jax
    # weight fully on component 0 -> samples near its mean
    dist = MixtureOfGaussians(
        probs=jnp.asarray([[1.0, 0.0]]),
        mean=jnp.asarray([[[5.0, 5.0], [-5.0, -5.0]]]),
        std=jnp.full((1, 2, 2), 0.01))
    s = dist.sample(jax.random.PRNGKey(0))
    assert np.allclose(np.asarray(s), 5.0, atol=0.1)

"""Model-zoo interface tests: every model type maps
(images, speed, command) -> (actions, speed_pred) and samples actions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmoe_tpu.models import get_model, PredictiveUNet
from pmoe_tpu.ops.distributions import MixtureOfGaussians

B, T, H, W = 2, 4, 32, 32


def _inputs():
    k = jax.random.PRNGKey(0)
    return (jax.random.uniform(k, (B, T, H, W, 3)), jnp.ones((B, 1)) * 0.3,
            jax.nn.one_hot(jnp.array([0, 2]), 4))


def _init_apply(model, needs_sample=False):
    from pmoe_tpu.utils.nn import jit_init

    img, spd, cmd = _inputs()
    rngs = {"params": jax.random.PRNGKey(0)}
    if needs_sample:
        rngs["sample"] = jax.random.PRNGKey(1)
    v = jit_init(model, rngs, img, spd, cmd)
    fwd = jax.jit(lambda v, i, s, c, k: model.apply(
        v, i, s, c, False, rngs={"sample": k} if needs_sample else None))
    out = fwd(v, img, spd, cmd, jax.random.PRNGKey(2))
    smp = jax.jit(lambda v, i, s, c, k: model.apply(
        v, i, s, c, False, method="sample", rngs={"sample": k}))
    sample = smp(v, img, spd, cmd, jax.random.PRNGKey(3))
    return v, out, sample


def test_moe(tiny_moe_cfg):
    model = get_model(tiny_moe_cfg)
    v, (dist, speeds), sample = _init_apply(model)
    assert isinstance(dist, MixtureOfGaussians)
    assert dist.probs.shape == (B, 2)
    np.testing.assert_allclose(np.asarray(dist.probs.sum(-1)), 1.0, rtol=1e-5)
    assert dist.mean.shape == (B, 2, 2)
    assert (np.asarray(dist.std) >= 0).all()      # elu(x)+1 can reach 0 only at -inf
    assert speeds.shape == (B, 2, 1)              # per-expert speed preds
    assert sample.shape == (B, 2)
    # stacked expert params: leading K axis (TPU-native expert batching)
    kernel = v["params"]["experts"]["alpha"]["kernel"]
    assert kernel.shape[0] == 2


def test_moe_alt_gate_uses_input_features(tiny_moe_cfg):
    cfg = dict(tiny_moe_cfg, type="moe_alt")
    model = get_model(cfg)
    v, (dist, _), _ = _init_apply(model)
    assert "alpha_hidden" in v["params"]["experts"]
    assert dist.probs.shape == (B, 2)


def test_moe_shared(tiny_moe_cfg):
    cfg = dict(tiny_moe_cfg, type="moe_shared")
    model = get_model(cfg)
    v, (dist, speed), sample = _init_apply(model)
    assert dist.mean.shape == (B, 2, 2)
    assert speed.shape == (B, 1)                  # single shared speed head
    assert sample.shape == (B, 2)
    # one shared backbone, no stacked axis
    assert "experts" not in v["params"]


def test_punet_expert(tiny_moe_cfg):
    cfg = dict(tiny_moe_cfg, type="punet")
    model = get_model(cfg)
    v, (actions, speed), sample = _init_apply(model)
    assert actions.shape == (B, 2)
    assert np.abs(np.asarray(actions)).max() <= 1.0          # tanh squashed
    assert speed.shape == (B, 1)
    np.testing.assert_allclose(np.asarray(sample), np.asarray(actions))


def test_punet_inter_skips_backbone(tiny_moe_cfg):
    cfg = dict(tiny_moe_cfg, type="punet_inter")
    model = get_model(cfg)
    v, (actions, _), _ = _init_apply(model)
    assert actions.shape == (B, 2)
    assert "backbone" not in v["params"]


def test_pmoe(tiny_moe_cfg):
    cfg = dict(tiny_moe_cfg, type="pmoe")
    model = get_model(cfg)
    v, (actions, speed), sample = _init_apply(model, needs_sample=True)
    assert actions.shape == (B, 2)
    assert np.abs(np.asarray(actions)).max() <= 1.0
    assert speed == -1                            # dummy (reference moe.py:361)
    assert sample.shape == (B, 2)
    assert "lat_weights" in v["params"] and "long_weights" in v["params"]


def test_punet_rollout_is_autoregressive():
    """Each future mask must depend on the previous prediction."""
    from pmoe_tpu.utils.nn import jit_init
    m = PredictiveUNet(past_frames=2, future_frames=3, num_classes=7)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, 16, 16, 3))
    v = jit_init(m, {"params": jax.random.PRNGKey(1)}, x)
    out = jax.jit(lambda v, x: m.apply(v, x, False))(v, x)
    assert out.shape == (1, 3, 16, 16, 7)
    # frames differ (rollout actually advanced)
    assert not np.allclose(np.asarray(out[0, 0]), np.asarray(out[0, 1]))


def test_frozen_unet_gets_no_gradient(tiny_moe_cfg):
    """PU-Net expert: grads through the frozen PredictiveUNet must be zero
    (stop_gradient), everything else nonzero."""
    from pmoe_tpu.utils.nn import jit_init
    cfg = dict(tiny_moe_cfg, type="punet")
    model = get_model(cfg)
    img, spd, cmd = _inputs()
    v = jit_init(model, {"params": jax.random.PRNGKey(0)}, img, spd, cmd)

    def loss(params):
        a, s = model.apply({"params": params,
                            "batch_stats": v.get("batch_stats", {})},
                           img, spd, cmd, False)
        return jnp.sum(a ** 2) + jnp.sum(s ** 2)

    g = jax.jit(jax.grad(loss))(v["params"])
    punet_norm = sum(float(jnp.abs(x).sum())
                     for x in jax.tree_util.tree_leaves(g["punet"]))
    head_norm = sum(float(jnp.abs(x).sum())
                    for x in jax.tree_util.tree_leaves(g["action_head"]))
    assert punet_norm == 0.0
    assert head_norm > 0.0


def test_punet_remat_resolution(monkeypatch):
    """PMOE_PUNET_REMAT env > constructor bool > default ON (the no-remat
    rollout OOMs at 224^2 — PERF.md round-9 — so auto always remats)."""
    from pmoe_tpu.models.punet import _use_remat

    monkeypatch.delenv("PMOE_PUNET_REMAT", raising=False)
    assert _use_remat("auto", 10, 6, 224) is True
    assert _use_remat(False, 10, 6, 224) is False
    assert _use_remat(True, 10, 6, 224) is True
    monkeypatch.setenv("PMOE_PUNET_REMAT", "0")
    assert _use_remat(True, 10, 6, 224) is False
    monkeypatch.setenv("PMOE_PUNET_REMAT", "1")
    assert _use_remat(False, 10, 6, 224) is True


@pytest.mark.parametrize("mode", [True, "slab"])
def test_slot_rollout_matches_deque_rollout(mode):
    """The slot-rotated ring-buffer carry (PMOE_ROLLOUT_SLOTS; channel-folded
    or frame-slab form) is the deque rollout computed with rotated
    gate/weights instead of shifted data: identical variable trees
    (checkpoints interchange), near-identical outputs (exact at shift 0;
    channel-summation reassociation after)."""
    kw = dict(past_frames=4, future_frames=3, in_features=3, num_classes=5)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32, 3))
    m_old = PredictiveUNet(slot_carry=False, **kw)
    m_new = PredictiveUNet(slot_carry=mode, **kw)
    v_old = m_old.init({"params": jax.random.PRNGKey(0)}, x)
    v_new = m_new.init({"params": jax.random.PRNGKey(0)}, x)

    assert (jax.tree_util.tree_structure(v_old)
            == jax.tree_util.tree_structure(v_new))
    for (p1, a), (p2, b) in zip(jax.tree_util.tree_leaves_with_path(v_old),
                                jax.tree_util.tree_leaves_with_path(v_new)):
        assert p1 == p2 and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # eval: same weights, same rollout
    out_old = m_old.apply(v_old, x, False)
    out_new = m_new.apply(v_old, x, False)
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_old),
                               rtol=2e-5, atol=2e-5)

    # train: outputs + mutated batch_stats agree (BN sees the same batches)
    o1, s1 = m_old.apply(v_old, x, True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(2)})
    o2, s2 = m_new.apply(v_old, x, True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)

    # a single-step rollout never rotates (shift stays 0): BPTT grads are
    # bitwise-equal between the two carries
    kw1 = dict(kw, future_frames=1)
    m1_old = PredictiveUNet(slot_carry=False, **kw1)
    m1_new = PredictiveUNet(slot_carry=mode, **kw1)

    def gradtree(fn):
        def f(p):
            out = fn.apply(
                {"params": p, "batch_stats": v_old["batch_stats"]}, x, True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})[0]
            return jnp.mean(out ** 2)
        return jax.grad(f)(v_old["params"])

    for a, b in zip(jax.tree_util.tree_leaves(gradtree(m1_old)),
                    jax.tree_util.tree_leaves(gradtree(m1_new))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_slot_rollout_resolution(monkeypatch):
    """PMOE_ROLLOUT_SLOTS env > constructor value > context default:
    channel-folded slots for frozen/inference rollouts, frame-slab slots
    when training through the rollout (all measured on v5e — see the
    _use_slots docstring)."""
    from pmoe_tpu.models.punet import _use_slots

    monkeypatch.delenv("PMOE_ROLLOUT_SLOTS", raising=False)
    assert _use_slots("auto", train=False) is True
    assert _use_slots("auto", train=True) == "slab"
    assert _use_slots(False, train=False) is False
    assert _use_slots(True, train=True) is True
    assert _use_slots("slab", train=False) == "slab"
    monkeypatch.setenv("PMOE_ROLLOUT_SLOTS", "0")
    assert _use_slots(True, train=False) is False
    monkeypatch.setenv("PMOE_ROLLOUT_SLOTS", "1")
    assert _use_slots(False, train=True) is True
    monkeypatch.setenv("PMOE_ROLLOUT_SLOTS", "2")
    assert _use_slots(False, train=False) == "slab"

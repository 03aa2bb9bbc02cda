"""Curriculum-augmenter parity against the reference factor schedules.

``tests/golden/aug_factors.json`` records the reference ``get_augmenter``'s
op trees — with every computed factor value embedded — at fixed iterations,
captured by driving /root/reference/PMoE/model/augmenter.py through an
imgaug recording stub (tools/make_golden.py, imgaug itself is not needed).
Here the transcription in pmoe_tpu/ops/augment.py must reproduce every
number and apply exactly the reference's op set per schedule (including the
super_hard/custom Grayscale omissions and custom's constant Add/Multiply).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from pmoe_tpu.ops.augment import augment, schedule_factors

GOLDEN = Path(__file__).resolve().parent / "golden" / "aug_factors.json"

pytestmark = pytest.mark.skipif(not GOLDEN.exists(),
                                reason="aug_factors.json not recorded")


@pytest.fixture(scope="module")
def recorded():
    return json.loads(GOLDEN.read_text())


def _ops_of(tree):
    """{op_name: (gate_prob, args, kwargs)} from a recorded Sequential."""
    out = {}
    for sometimes in tree["args"][0]:
        assert sometimes["op"] == "Sometimes"
        gate, op = sometimes["args"]
        out[op["op"]] = (gate, op["args"], op["kwargs"])
    return out


SCHEDULES = ("medium", "soft", "high", "medium_harder", "super_hard",
             "soft_harder")


@pytest.mark.parametrize("aug_type", SCHEDULES)
def test_factor_schedule_matches_reference(recorded, aug_type):
    bsz = recorded["bsz"]
    for it, tree in zip(recorded["iterations"],
                        recorded["schedules"][aug_type]):
        ops = _ops_of(tree)
        f = {k: float(v) for k, v in
             schedule_factors(aug_type, it, bsz)._asdict().items()}
        rt = dict(rtol=1e-6, atol=1e-8)
        # every Sometimes gate is the frequency factor
        for gate, _a, _k in ops.values():
            np.testing.assert_allclose(f["freq"], gate, **rt)
        np.testing.assert_allclose(f["blur"], ops["GaussianBlur"][1][0][1],
                                   **rt)
        noise = ops["AdditiveGaussianNoise"][2]
        np.testing.assert_allclose(f["dropout"], noise["scale"][1], **rt)
        np.testing.assert_allclose(f["color"], noise["per_channel"], **rt)
        add = ops["Add"][1][0]
        np.testing.assert_allclose(f["add"], add[1], **rt)
        np.testing.assert_allclose(-f["add"], add[0], **rt)
        mult = ops["Multiply"][1][0]
        np.testing.assert_allclose(f["mult_neg"], mult[0], **rt)
        np.testing.assert_allclose(f["mult_pos"], mult[1], **rt)
        con = ops["LinearContrast"][1][0]
        np.testing.assert_allclose(f["con_neg"], con[0], **rt)
        np.testing.assert_allclose(f["con_pos"], con[1], **rt)
        np.testing.assert_allclose(
            f["dropout"], ops["CoarseDropout"][1][0][1], **rt)
        np.testing.assert_allclose(f["dropout"], ops["Dropout"][1][0][1], **rt)


def test_op_sets_match_reference(recorded):
    """super_hard and custom drop Grayscale; custom also drops CoarseDropout
    and LinearContrast and pins Add/Multiply constants
    (reference augmenter.py:465,529,503-531)."""
    base = set(_ops_of(recorded["schedules"]["medium"][0]))
    assert base == {"GaussianBlur", "AdditiveGaussianNoise", "CoarseDropout",
                    "Dropout", "Add", "Multiply", "LinearContrast",
                    "Grayscale"}
    sh = set(_ops_of(recorded["schedules"]["super_hard"][0]))
    assert sh == base - {"Grayscale"}
    cu = _ops_of(recorded["schedules"]["custom"][0])
    assert set(cu) == {"GaussianBlur", "AdditiveGaussianNoise", "Dropout",
                       "Add", "Multiply"}
    assert cu["Add"][1][0] == [-30, 30]
    assert cu["Multiply"][1][0] == [0.9, 1.3]
    assert cu["Multiply"][2]["per_channel"] is True
    # custom's blur divisor is the aggressive 2e4 one
    it, tree = recorded["iterations"][2], recorded["schedules"]["custom"][2]
    f = schedule_factors("custom", it, recorded["bsz"])
    np.testing.assert_allclose(float(f.blur),
                               _ops_of(tree)["GaussianBlur"][1][0][1],
                               rtol=1e-6)


def test_segmentation_schedule_recorded(recorded):
    """seg_aug (augmenter.py:57-76): fixed gates 0.3/0.3/0.1/0.1/0.2, imgaug
    0.4.0 default magnitudes."""
    ops = _ops_of(recorded["schedules"]["segmentation"][0])
    gates = {name: g for name, (g, _a, _k) in ops.items()}
    assert gates == {"GaussianBlur": 0.3, "AdditiveGaussianNoise": 0.3,
                     "CoarseDropout": 0.1, "Dropout": 0.1,
                     "LinearContrast": 0.2}


def test_augment_applies_factor_magnitudes(recorded):
    """Statistical tie-in: late-curriculum super_hard (freq -> 1.0) zeroes a
    pixel fraction consistent with the recorded dropout factor, and custom's
    brightness shift stays inside the recorded +-30/255 bound."""
    import jax

    bsz = recorded["bsz"]
    it = recorded["iterations"][-1]                  # deep into the curriculum
    f = schedule_factors("super_hard", it, bsz)
    assert float(f.freq) == 1.0
    rng = jax.random.PRNGKey(0)
    x = 0.5 * np.ones((8, 64, 64, 3), np.float32)
    y = np.asarray(augment(rng, x, it, "super_hard", bsz))
    assert y.shape == x.shape
    zero_frac = float((y == 0.0).mean())
    # Dropout + CoarseDropout each sample p in (0, dropout); with gates at
    # 1.0 the expected zeroed fraction is positive and well below 3*dropout
    assert 0.0 < zero_frac < 3.0 * float(f.dropout) + 0.05

    y = np.asarray(augment(rng, x, 0, "custom", bsz))
    assert (y >= 0.0).all() and (y <= 1.0).all()
    # non-zeroed pixels stay inside the recorded custom envelope:
    # Add(+-30/255) then Multiply(0.9..1.3), plus blur/noise slack
    nz = y[y > 0.05]
    assert np.abs(nz - 0.5).max() <= (30.0 / 255.0 + 0.5) * 1.3 - 0.5 + 0.15


def test_augment_bf16_path_statistically_close(recorded, monkeypatch):
    """The TPU-default bf16 compute path (PMOE_AUG_BF16) must keep the same
    augmentation statistics as the f32 path to within bf16 resolution —
    same rng, same gates, only elementwise rounding differs."""
    import jax
    import jax.numpy as jnp

    bsz = recorded["bsz"]
    it = recorded["iterations"][-1]
    rng = jax.random.PRNGKey(3)
    x = np.linspace(0.1, 0.9, 8 * 64 * 64 * 3, dtype=np.float32).reshape(
        8, 64, 64, 3)
    monkeypatch.setenv("PMOE_AUG_BF16", "0")
    y32 = np.asarray(augment(rng, jnp.asarray(x), it, "medium", bsz))
    monkeypatch.setenv("PMOE_AUG_BF16", "force")
    yb = augment(rng, jnp.asarray(x), it, "medium", bsz)
    assert yb.dtype == jnp.bfloat16
    yb = np.asarray(yb, np.float32)
    assert yb.shape == y32.shape
    # identical rng draws -> identical gate decisions; bf16 only rounds
    assert np.mean(np.abs(yb - y32)) < 5e-3
    assert np.max(np.abs(yb - y32)) < 0.05

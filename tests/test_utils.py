"""Tests for config, checkpoint grafting, freeze masks, augmentation, noise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmoe_tpu.ops.augment import augment, schedule_factors
from pmoe_tpu.utils import (Config, get_conf, graft, load_checkpoint,
                            make_freeze_mask, save_checkpoint, to_dict)
from pmoe_tpu.utils.noise import OrnsteinUhlenbeckActionNoise


def test_config_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a:\n  b: 1\n  c: [1, 2]\nd: hello\n")
    cfg = get_conf(str(p)[:-5])          # stem, .yaml appended (reference API)
    assert cfg.a.b == 1
    assert cfg.d == "hello"
    assert dict(cfg.a)["c"] == [1, 2]
    merged = cfg.merge({"a": {"b": 7}})
    assert merged.a.b == 7 and merged.a.c == [1, 2]
    assert to_dict(cfg) == {"a": {"b": 1, "c": [1, 2]}, "d": "hello"}


def test_config_splat():
    cfg = Config({"dims": [1, 2], "act": "relu"})

    def f(dims, act):
        return dims, act

    assert f(**cfg) == ([1, 2], "relu")


def test_checkpoint_save_best_copy(tmp_path):
    state = {"model": {"w": np.arange(4.0)}, "epoch": np.int64(3)}
    save_checkpoint(state, True, tmp_path, "unet-e3", best_prefix="unet")
    ck = load_checkpoint(tmp_path / "unet-best")
    np.testing.assert_array_equal(ck["model"]["w"], np.arange(4.0))
    assert ck["epoch"] == 3


def test_graft_partial_restore():
    target = {"a": {"w": jnp.zeros((2, 2)), "b": jnp.zeros(3)},
              "c": jnp.zeros(5)}
    source = {"a": {"w": np.ones((2, 2)), "b": np.ones(4)},   # b mismatched
              "d": np.ones(1)}                                 # d unknown
    out = graft(target, source)
    np.testing.assert_array_equal(np.asarray(out["a"]["w"]), 1.0)
    np.testing.assert_array_equal(np.asarray(out["a"]["b"]), 0.0)  # skipped
    np.testing.assert_array_equal(np.asarray(out["c"]), 0.0)


def test_freeze_mask_substring_semantics():
    params = {"moe": {"alpha": {"kernel": jnp.zeros(2)},
                      "backbone": {"kernel": jnp.zeros(2)}},
              "lat_weights": {"kernel": jnp.zeros(2)}}
    # empty exclude -> everything frozen (reference utils/nn.py:39-46)
    m = make_freeze_mask(params, [])
    assert not any(jax.tree_util.tree_leaves(m))
    m2 = make_freeze_mask(params, ["alpha", "lat_weights"])
    assert m2["moe"]["alpha"]["kernel"] is True
    assert m2["moe"]["backbone"]["kernel"] is False
    assert m2["lat_weights"]["kernel"] is True


def test_schedule_factors_monotone():
    f0 = schedule_factors("medium", 0.0, 32)
    f1 = schedule_factors("medium", 1e6, 32)
    assert float(f1.freq) > float(f0.freq)
    assert float(f1.blur) > float(f0.blur)
    assert float(f1.dropout) > float(f0.dropout)    # dropout anneals UP
    np.testing.assert_allclose(float(f0.dropout), 0.03856658, rtol=1e-5)
    # super_hard caps frequency at 1.0
    fsh = schedule_factors("super_hard", 1e9, 32)
    assert float(fsh.freq) == 1.0


@pytest.mark.parametrize("aug_type", ["segmentation", "medium", "super_hard",
                                      "custom", "none"])
def test_augment_shapes_and_range(aug_type):
    x = jnp.full((4, 16, 16, 3), 0.5)
    y = augment(jax.random.PRNGKey(0), x, 1000.0, aug_type, 32)
    assert y.shape == x.shape
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_augment_at_iteration_zero_mostly_identity():
    """freq=0.05 at it=0: with 4 images x ~8 ops most pixels untouched."""
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3))
    y = augment(jax.random.PRNGKey(2), x, 0.0, "medium", 32)
    frac_same = float(jnp.mean(jnp.abs(y - x) < 1e-6))
    assert frac_same > 0.5


def test_ou_noise_reproducible():
    rng = np.random.default_rng(0)
    n = OrnsteinUhlenbeckActionNoise(mu=np.zeros(2), sigma=np.array([0.3, 0.1]),
                                     theta=0.6, rng=rng)
    a = n()
    assert a.shape == (2,)
    n.reset()
    assert np.array_equal(n.x_prev, np.zeros(2))


def test_stop_gradient_frozen_prunes_grads():
    """Frozen leaves get exactly-zero gradients (torch requires_grad parity);
    trainable leaves keep their true gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pmoe_tpu.utils.nn import make_freeze_mask, stop_gradient_frozen

    params = {"alpha": {"kernel": jnp.ones((3,))},
              "backbone": {"kernel": jnp.full((3,), 2.0)}}
    mask = make_freeze_mask(params, ["alpha"])   # only alpha trains

    def loss(p):
        p = stop_gradient_frozen(p, mask)
        return sum(jnp.sum(l ** 2) for l in jax.tree_util.tree_leaves(p))

    g = jax.grad(loss)(params)
    np.testing.assert_allclose(np.asarray(g["alpha"]["kernel"]), 2.0)
    np.testing.assert_allclose(np.asarray(g["backbone"]["kernel"]), 0.0)


def test_profiler_trace_writes_artifacts(tmp_path):
    """profiling.trace captures a TensorBoard-loadable profile."""
    import jax
    import jax.numpy as jnp

    from pmoe_tpu.utils import profiling

    with profiling.trace(str(tmp_path)):
        _ = jax.jit(lambda x: x @ x)(jnp.ones((64, 64))).block_until_ready()
    files = list(tmp_path.rglob("*"))
    assert any(f.is_file() for f in files), "no trace artifacts written"


def test_step_timer_summary():
    import jax.numpy as jnp

    from pmoe_tpu.utils.profiling import StepTimer

    t = StepTimer()
    for _ in range(3):
        t.start()
        t.stop(probe=jnp.ones(()))
    s = t.summary()
    assert s["steps"] == 3 and s["mean_ms"] >= 0.0


def test_logger_media_outputs(tmp_path):
    """log_image writes a PNG and log_video an MJPG .avi (the comet
    image/video-asset analogs, reference image_agent.py:90-99)."""
    import numpy as np

    from pmoe_tpu.utils.logger import ExperimentLogger

    lg = ExperimentLogger(log_dir=tmp_path, experiment_name="media")
    lg.log_image(np.zeros((3, 16, 16), np.float32), name="strip", step=7)
    frames = [np.full((24, 32, 3), i * 30, np.uint8) for i in range(6)]
    lg.log_video(frames, name="eval", step=7)
    lg.end()
    imgs = list(tmp_path.rglob("images/strip-7.png"))
    vids = list(tmp_path.rglob("videos/eval-7.avi"))
    assert imgs and vids
    assert vids[0].stat().st_size > 1000      # real encoded frames

    lg2 = ExperimentLogger(log_dir=tmp_path, disabled=True)
    lg2.log_video(frames, name="x")           # no-op when disabled
    assert not list(tmp_path.rglob("videos/x.avi"))


def test_logger_histogram_3d(tmp_path):
    """log_histogram_3d (comet auto-histogram analog, reference
    train_0.py:288-307): counts sum to the sample count, edges bracket the
    data, disabled sink writes nothing."""
    import json

    import numpy as np

    from pmoe_tpu.utils.logger import ExperimentLogger

    lg = ExperimentLogger(log_dir=tmp_path, experiment_name="hist")
    vals = np.linspace(-2.0, 3.0, 1000).reshape(10, 100)
    lg.log_histogram_3d(vals, name="weights/unet", step=5, bins=16)
    lg.end()
    [f] = list(tmp_path.rglob("histograms.jsonl"))
    rec = json.loads(f.read_text().strip())
    assert rec["name"] == "weights/unet" and rec["step"] == 5
    assert sum(rec["counts"]) == vals.size and len(rec["edges"]) == 17
    assert rec["edges"][0] <= -2.0 and rec["edges"][-1] >= 3.0

    lg2 = ExperimentLogger(log_dir=tmp_path, disabled=True)
    lg2.log_histogram_3d(vals, name="nope")
    assert len(list(tmp_path.rglob("histograms.jsonl"))) == 1


def test_agent_realtime_ratio():
    """The base agent tracks wallclock-vs-simtime when stepped through
    __call__ (reference autonomous_agent.py:108-113 prints it per tick)."""
    from pmoe_tpu.agents.autonomous_agent import AutonomousAgent
    from pmoe_tpu.sim.interface import VehicleControl

    class Idle(AutonomousAgent):
        def run_step(self, input_data, timestamp):
            return VehicleControl()

    agent = Idle(None)
    agent({}, 0.05)
    agent({}, 0.10)
    assert agent.wallclock_t0 is not None
    assert agent.realtime_ratio >= 0.0      # wallclock elapsed / sim time


def test_conf_schema_parity_with_reference():
    """SURVEY §5: "YAML keys ARE the API schema". Every key path in every
    reference conf/*.yaml (recorded golden via tools/export_conf_schema.py)
    must exist in the same-named pmoe_tpu/conf file — a reference user's
    config edits keep working verbatim."""
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    schema = json.loads((root / "tests" / "golden" /
                         "ref_conf_schema.json").read_text())
    conf_dir = root / "pmoe_tpu" / "conf"

    def paths(tree, prefix=()):
        if not isinstance(tree, dict):
            return [prefix]
        out = []
        for k, v in tree.items():
            out.extend(paths(v, prefix + (k,)))
        return out

    from collections.abc import Mapping

    def has_path(cfg, path):
        node = cfg
        for k in path:
            if not isinstance(node, Mapping) or k not in node:
                return False
            node = node[k]
        return True

    missing = []
    for fname, tree in schema.items():
        ours = conf_dir / fname
        assert ours.exists(), f"pmoe_tpu/conf/{fname} missing entirely"
        cfg = get_conf(str(ours))
        cfg = cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
        for p in paths(tree):
            if not has_path(cfg, p):
                missing.append(f"{fname}: {'.'.join(p)}")
    assert not missing, "reference conf keys absent:\n" + "\n".join(missing)

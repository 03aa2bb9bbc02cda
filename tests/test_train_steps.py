"""End-to-end trainer tests: 1-epoch tiny runs of stages 0/1/2 over the
synthetic episodes, exercising config -> data -> jitted step -> SWA ->
validation -> checkpointing."""

import jax.numpy as jnp
import numpy as np
import pytest

from pmoe_tpu.utils import Config


def _base_cfg(root, tmp_path, name):
    return {
        "train_params": {"epochs": 1, "optimizer": "adam", "save_every": 1,
                         "swa_start": 1, "patience": 3, "early_stopping": False,
                         "grad_clipping": 1.0, "start_saving_best": 0},
        # single-device: SPMD compiles of full stage steps are too slow for CI
        # on the virtual mesh; mesh coverage lives in test_sharding.py
        "parallel": {"data": 1},
        "logger": {"disabled": True},
        "dataloader": {"batch_size": 4, "shuffle": True},
        "directory": {"model_name": name, "save": str(tmp_path / "ckpt"),
                      "load": ""},
        "adam": {"lr": 1e-3, "betas": [0.9, 0.999], "eps": 1e-8,
                 "weight_decay": 0, "amsgrad": True},
        "SWA": {"swa_lr": 5e-4, "anneal_epochs": 5, "anneal_strategy": "linear"},
    }


def _dataset_cfg(root, **extra):
    d = {"root": str(root), "crop": [8, 8], "resize": [32, 32], "seed": 0,
         "aug_type": "segmentation", "batch_size": 4, "boost": 1,
         "n_commands": 4, "speed_factor": 10}
    d.update(extra)
    return d


@pytest.mark.heavy
def test_stage0_one_epoch(synthetic_root_small, tmp_path):
    from pmoe_tpu.trainer.train_0 import Learner

    cfg = _base_cfg(synthetic_root_small, tmp_path, "unet")
    cfg["dataset"] = _dataset_cfg(synthetic_root_small)
    cfg["val_dataset"] = _dataset_cfg(synthetic_root_small)
    cfg["model"] = {"in_features": 3, "out_features": 23, "gamma": 2, "b": 1}
    learner = Learner(Config(cfg))
    learner.train()
    assert learner.iteration == 3           # 12 samples / bs 4
    assert (tmp_path / "ckpt" / "unet-best.ckpt").exists()
    # SWA kicked in at epoch 1 and produced a -swa checkpoint
    assert any(p.name.endswith("-swa.ckpt")
               for p in (tmp_path / "ckpt").iterdir())
    val = learner.validate()
    assert np.isfinite(val["val_loss"])
    assert "dice_Road" in val


@pytest.mark.heavy
def test_stage1_one_epoch_freezes_unet(synthetic_root_small, tmp_path):
    from pmoe_tpu.trainer.train_1 import Learner

    cfg = _base_cfg(synthetic_root_small, tmp_path, "punet")
    cfg["train_params"]["swa_start"] = 99
    cfg["train_params"]["loss_type"] = "tversky"
    # future_frames=1 halves the rollout graph; the scan/remat structure and
    # freeze semantics under test are identical; the 8-frame episode keeps
    # the full-width U-Net's CPU execution cost inside the suite budget
    cfg["dataset"] = _dataset_cfg(synthetic_root_small, past_frames=4,
                                  future_frames=1)
    cfg["val_dataset"] = dict(cfg["dataset"])
    cfg["model"] = {"past_frames": 4, "future_frames": 1, "in_features": 3,
                    "num_classes": 23, "gamma": 2, "b": 1,
                    "model_name": "unet", "model_path": ""}
    import jax

    learner = Learner(Config(cfg))
    unet_before = jax.tree_util.tree_map(np.asarray,
                                         learner.state.params["unet"])
    roll_before = jax.tree_util.tree_map(np.asarray,
                                         learner.state.params["rollout"])
    learner.train()
    unet_after = learner.state.params["unet"]
    roll_after = learner.state.params["rollout"]
    # frozen segmentation U-Net unchanged
    for a, b in zip(jax.tree_util.tree_leaves(unet_before),
                    jax.tree_util.tree_leaves(unet_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # trained rollout (entry block + pred unet) changed
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(jax.tree_util.tree_leaves(roll_before),
                                  jax.tree_util.tree_leaves(roll_after)))
    assert changed


@pytest.mark.heavy
def test_stage2_moe_one_epoch(synthetic_root, tmp_path, tiny_moe_cfg):
    from pmoe_tpu.trainer.train_2 import Learner

    cfg = _base_cfg(synthetic_root, tmp_path, "MoE")
    cfg["train_params"]["swa_start"] = 99
    cfg["dataset"] = _dataset_cfg(synthetic_root, past_frames=4,
                                  future_frames=2, load_measurements=True,
                                  aug_type="super_hard")
    cfg["val_dataset"] = dict(cfg["dataset"])
    cfg["model"] = tiny_moe_cfg
    learner = Learner(Config(cfg))
    learner.train()
    val = learner.validate()
    assert np.isfinite(val["val_loss"])
    assert (tmp_path / "ckpt" / "MoE-best.ckpt").exists()


@pytest.mark.heavy
def test_stage3_one_episode(tmp_path, tiny_moe_cfg):
    """The stage-3 trainer loop end-to-end on the fake backend: env reset ->
    OU-noised sample -> remember -> jitted DDPG learn -> checkpoint. The
    reference ships this stage broken (missing env modules, SURVEY §2.4)."""
    from pmoe_tpu.trainer.train_3 import train
    from pmoe_tpu.utils import Config

    mlp = lambda dims: {"dims": dims, "act": "relu", "l_act": False,
                        "bn": False, "dropout": 0.0}
    actor = dict(tiny_moe_cfg, lr=1e-4, exclude_freeze=[], model_dir="")
    critic = {
        "lr": 1e-3,
        "backbone": actor["backbone"],
        "speed_encoder": mlp([1, 16, 64]),
        "command_encoder": mlp([4, 16, 64]),
        "action_encoder": mlp([2, 16, 64]),
        "value_prediction": mlp([704, 32, 1]),
    }
    cfg = Config({
        "train_params": {"max_episodes": 1, "episode_length": 10,
                         "n_commands": 4, "critic_warmup": 6},
        "env": {"backend": "fake", "town": "Town01", "img_width": 160,
                "img_height": 120},
        "logger": {"disabled": True},
        "dataset": {"crop": [20, 20], "resize": [32, 32],
                    "speed_factor": 10},
        "directory": {"save": str(tmp_path), "model_name": "rl"},
        "model": {"tau": 0.01, "buffer_size": 64, "batch_size": 4,
                  "gamma": 0.9,
                  "OU": {"mu": [0.0, 0.0], "sigma": [0.3, 0.1],
                         "theta": [0.6, 0.15]},
                  "actor": actor, "critic": critic},
    })
    agent = train(cfg)
    assert len(agent.memory) == 10          # one full episode remembered
    assert (tmp_path / "rl-e0.ckpt").exists()


def test_parse_dtype():
    import jax.numpy as jnp

    from pmoe_tpu.utils.nn import parse_dtype

    assert parse_dtype(None) == jnp.float32
    assert parse_dtype("float32") == jnp.float32
    assert parse_dtype("bf16") == jnp.bfloat16
    assert parse_dtype("bfloat16") == jnp.bfloat16
    assert parse_dtype(jnp.bfloat16) == jnp.bfloat16
    with pytest.raises(ValueError):
        parse_dtype("int7")


def test_stage0_bf16_mixed_precision(synthetic_root_small, tmp_path):
    """``train_params.dtype: bfloat16`` = bf16 compute, fp32 params: the
    TPU MXU path for the production trainers (bench.py measures this same
    configuration). Construction + one forward only — the full-epoch
    numerics live in the heavy fp32 tests."""
    import jax

    from pmoe_tpu.trainer.train_0 import Learner

    cfg = _base_cfg(synthetic_root_small, tmp_path, "unet")
    cfg["train_params"]["dtype"] = "bfloat16"
    cfg["dataset"] = _dataset_cfg(synthetic_root_small)
    cfg["val_dataset"] = _dataset_cfg(synthetic_root_small)
    cfg["model"] = {"in_features": 3, "out_features": 23, "gamma": 2, "b": 1}
    learner = Learner(Config(cfg))
    assert learner.compute_dtype == jnp.bfloat16
    assert learner.model.dtype == jnp.bfloat16
    # params stay fp32 (mixed precision, not half-precision training)
    for leaf in jax.tree_util.tree_leaves(learner.state.params):
        assert leaf.dtype == jnp.float32
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    y = learner.state.apply_fn(
        {"params": learner.state.params,
         "batch_stats": learner.state.batch_stats}, x, False)
    assert y.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(y, np.float32)))


@pytest.mark.heavy
def test_stage2_device_pool_matches_streaming(synthetic_root, tmp_path,
                                              tiny_moe_cfg):
    """dataset.device_pool: frames live in HBM, batches carry int32 ids, and
    the jitted step gathers windows on device — must reproduce the streaming
    pixel path exactly (same decode, same batch order, same rng)."""
    from pmoe_tpu.trainer.train_2 import Learner

    def run(device_pool):
        cfg = _base_cfg(synthetic_root, tmp_path / f"dp{device_pool}", "MoE")
        cfg["train_params"]["swa_start"] = 99
        cfg["dataset"] = _dataset_cfg(synthetic_root, past_frames=4,
                                      future_frames=2,
                                      load_measurements=True,
                                      aug_type="super_hard",
                                      device_pool=device_pool)
        cfg["val_dataset"] = dict(cfg["dataset"])
        cfg["model"] = tiny_moe_cfg
        learner = Learner(Config(cfg))
        learner.train()
        return learner.validate()["val_loss"], learner.state.params

    loss_stream, p_stream = run(False)
    loss_pool, p_pool = run(True)
    np.testing.assert_allclose(loss_pool, loss_stream, rtol=1e-5)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(p_stream),
                    jax.tree_util.tree_leaves(p_pool)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

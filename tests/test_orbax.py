"""Orbax checkpoint store: sharding-preserving save/restore and the
learner-level `directory.format: orbax` path (async multi-chip checkpoints —
SURVEY §5's 'orbax checkpointing of train-state pytrees')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pmoe_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_orbax_store_preserves_shardings(tmp_path):
    from pmoe_tpu.utils.orbax_io import OrbaxStore

    mesh = make_mesh()
    tree = {"w": jax.device_put(jnp.arange(16.0).reshape(8, 2),
                                NamedSharding(mesh, P("data", None))),
            "b": jnp.ones((4,)),
            "step": np.int64(7)}
    store = OrbaxStore(tmp_path)
    store.save("state-1", tree, wait=True)
    assert store.exists("state-1")
    restored = store.restore("state-1", target=tree)
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.asarray(tree["w"]))
    assert restored["w"].sharding == tree["w"].sharding
    assert int(restored["step"]) == 7
    # restore without a target: plain host arrays
    raw = store.restore("state-1")
    np.testing.assert_allclose(np.asarray(raw["b"]), 1.0)
    store.close()


def test_learner_orbax_roundtrip(synthetic_root, tmp_path, tiny_moe_cfg):
    """Stage-2 learner with `directory.format: orbax`: async save during the
    epoch loop, then a fresh learner resumes epoch/params from the store."""
    from pmoe_tpu.trainer.train_2 import Learner
    from pmoe_tpu.utils import Config

    base = {
        "train_params": {"epochs": 1, "optimizer": "adam", "save_every": 1,
                         "swa_start": 99, "grad_clipping": 1.0,
                         "start_saving_best": 0},
        "parallel": {"data": 1},
        "logger": {"disabled": True},
        "dataloader": {"batch_size": 4, "shuffle": False},
        "directory": {"model_name": "moe", "save": str(tmp_path / "ck"),
                      "load": "", "format": "orbax"},
        "adam": {"lr": 1e-3, "betas": [0.9, 0.999], "eps": 1e-8,
                 "weight_decay": 0, "amsgrad": False},
        "SWA": {"swa_lr": 5e-4},
        "dataset": {"root": str(synthetic_root), "crop": [8, 8],
                    "resize": [16, 16], "seed": 0,
                    "aug_type": "segmentation", "batch_size": 4, "boost": 1,
                    "n_commands": 4, "speed_factor": 10, "past_frames": 4,
                    "future_frames": 2},
        "model": tiny_moe_cfg,
    }
    base["val_dataset"] = dict(base["dataset"])
    learner = Learner(Config(base))
    learner.train()
    ckpt_dir = tmp_path / "ck" / "moe-best"
    assert ckpt_dir.exists()

    resumed_cfg = dict(base)
    resumed_cfg["logger"] = {"disabled": True, "resume": True}
    resumed_cfg["directory"] = dict(base["directory"], load=str(ckpt_dir))
    learner2 = Learner(Config(resumed_cfg))
    assert learner2.epoch == learner.epoch
    for a, b in zip(jax.tree_util.tree_leaves(learner.state.params),
                    jax.tree_util.tree_leaves(learner2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

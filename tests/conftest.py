"""Test configuration: force the CPU backend with 8 virtual devices so
sharding/collective tests run without TPU hardware, and provide a synthetic
CARLA-layout episode fixture (the reference has no tests and no simulator-less
path at all — SURVEY §4)."""

import os

# FORCE cpu (not setdefault): the environment may carry JAX_PLATFORMS=axon
# (tunneled TPU) which would silently run every test on the real chip with
# TPU matmul numerics and tunnel latency. The TPU runtime's sitecustomize may
# have imported jax already, in which case jax.config captured the axon value
# at import time — override through the config, before any backend is built.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
import sys as _sys

if "jax" in _sys.modules:
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# NOTE: --xla_backend_optimization_level=0 was tried to cut compile time but
# unfused CPU execution made heavy steps ~20x slower (stage-1: 130 s/step vs
# 6.7 s at full opt) — keep full optimization.
os.environ["XLA_FLAGS"] = flags
# persistent compilation cache: U-Net/MoE CPU compiles dominate test time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES",
                      "xla_gpu_per_fusion_autotune_cache_dir")
if "jax" in _sys.modules:
    # jax was pre-imported (TPU sitecustomize) BEFORE the env vars above, so
    # its config captured cache_dir=None at import time and the persistent
    # cache silently never engages — set it through the live config too
    import jax as _jax2

    _jax2.config.update("jax_compilation_cache_dir",
                        os.environ["JAX_COMPILATION_CACHE_DIR"])
    _jax2.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _jax2.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import json
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="session")
def synthetic_root(tmp_path_factory) -> Path:
    """Two episodes in the reference on-disk layout:
    root/<ep>/{rgb,mask,measurements}/ with sorted files
    (reference data_loader.py:62-80,175-196). Small 64x64 frames."""
    import cv2

    root = tmp_path_factory.mktemp("carla_data")
    rng = np.random.default_rng(0)
    for ep in range(2):
        d = root / f"episode_{ep:03d}"
        for sub in ("rgb", "mask", "measurements"):
            (d / sub).mkdir(parents=True)
        for i in range(16):
            img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            cv2.imwrite(str(d / "rgb" / f"{i:05d}.png"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            mask = rng.integers(0, 23, (64, 64), dtype=np.uint8)
            cv2.imwrite(str(d / "mask" / f"{i:05d}.png"), mask)
            meas = {
                "steer": float(rng.uniform(-1, 1)),
                "brake": float(rng.uniform(0, 0.2)),
                "throttle": float(rng.uniform(0, 1)),
                "speed": float(rng.uniform(0, 10)),
                "target_speed": float(rng.uniform(0, 10)),
                "command": int(rng.integers(1, 5)),
            }
            (d / "measurements" / f"{i:05d}.json").write_text(json.dumps(meas))
    return root


@pytest.fixture(scope="session")
def synthetic_root_small(tmp_path_factory) -> Path:
    """One 12-frame episode — for the execution-heavy stage-0/1 epoch tests,
    where per-step CPU cost (full-width U-Net) dominates suite time and 2-3
    batches exercise the same mechanics as 8."""
    import cv2

    root = tmp_path_factory.mktemp("carla_data_small")
    rng = np.random.default_rng(1)
    d = root / "episode_000"
    for sub in ("rgb", "mask", "measurements"):
        (d / sub).mkdir(parents=True)
    for i in range(12):
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(d / "rgb" / f"{i:05d}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        mask = rng.integers(0, 23, (64, 64), dtype=np.uint8)
        cv2.imwrite(str(d / "mask" / f"{i:05d}.png"), mask)
        meas = {
            "steer": float(rng.uniform(-1, 1)),
            "brake": float(rng.uniform(0, 0.2)),
            "throttle": float(rng.uniform(0, 1)),
            "speed": float(rng.uniform(0, 10)),
            "target_speed": float(rng.uniform(0, 10)),
            "command": int(rng.integers(1, 5)),
        }
        (d / "measurements" / f"{i:05d}.json").write_text(json.dumps(meas))
    return root


TINY_GEOM = dict(crop=(8, 8), resize=(32, 32))


@pytest.fixture
def tiny_moe_cfg():
    return {
        "type": "moe", "n_experts": 2, "loss_coefs": [0.7, 0.3],
        "speed_encoder": {"dims": [1, 32, 512], "act": "relu", "bn": False,
                          "dropout": 0.0},
        "command_encoder": {"dims": [4, 32, 512], "act": "relu", "bn": False,
                            "dropout": 0.0},
        "speed_prediction": {"dims": [1536, 32, 1], "act": "relu", "bn": False},
        "action_head": {"dims": [1536, 32, 512], "act": "elu", "l_act": True,
                        "bn": False},
        "backbone": {"type": "rgb", "n_frames": 4,
                     "rgb": {"arch": "tiny", "pretrained": False,
                             "gamma": 2, "b": 1}},
        "punet": {"past_frames": 4, "future_frames": 2, "in_features": 3,
                  "num_classes": 23, "gamma": 2, "b": 1,
                  "unet_inter_repr": False, "model_name": "unet",
                  "model_path": ""},
        "pmoe": {"moe_dir": "unused", "punet_dir": ""},
        "exclude_freeze": [],
    }

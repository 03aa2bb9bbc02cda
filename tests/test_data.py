"""Dataset / loader tests over the synthetic CARLA-layout episodes."""

import numpy as np

from pmoe_tpu.data.dataset import (BatchLoader, CarlaSeg, CarlaSegPred,
                                   preprocess_measurements)


def test_carla_seg(synthetic_root):
    ds = CarlaSeg(root=str(synthetic_root), mode="train", crop=(8, 8),
                  resize=(32, 32))
    assert len(ds) == 32            # 2 episodes x 16 frames
    img, mask = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert mask.shape == (32, 32) and mask.dtype == np.int32


def test_carla_seg_pred_masks(synthetic_root):
    ds = CarlaSegPred(root=str(synthetic_root), past_frames=4, future_frames=3,
                      load_measurements=False, crop=(8, 8), resize=(32, 32))
    # per episode: 16 - (4+3) = 9 windows
    assert len(ds) == 18
    imgs, masks = ds[0]
    assert imgs.shape == (4, 32, 32, 3)
    assert masks.shape == (3, 32, 32)


def test_carla_seg_pred_measurements(synthetic_root):
    ds = CarlaSegPred(root=str(synthetic_root), past_frames=4, future_frames=3,
                      load_measurements=True, crop=(8, 8), resize=(32, 32),
                      n_commands=4)
    imgs, meas = ds[0]
    assert imgs.shape == (4, 32, 32, 3)
    assert meas["control"].shape == (2,)
    assert meas["command"].shape == (4,)
    assert meas["command"].sum() == 1.0


def test_preprocess_measurements_pedal_folding():
    # brake > 0.05 -> pedal = -brake (reference data_loader.py:236-240)
    m = preprocess_measurements(
        {"steer": 0.1, "brake": 0.5, "throttle": 0.9, "speed": 5.0,
         "target_speed": 6.0, "command": 2}, speed_factor=10, n_commands=4)
    np.testing.assert_allclose(m["control"], [0.1, -0.5])
    assert m["speed"] == np.float32(0.5)
    assert m["command"][1] == 1.0
    # brake <= 0.05 -> pedal = throttle
    m2 = preprocess_measurements(
        {"steer": 0.0, "brake": 0.05, "throttle": 0.7, "speed": 0,
         "target_speed": 0, "command": 1}, 10, 4)
    np.testing.assert_allclose(m2["control"], [0.0, 0.7])


def test_batch_loader_collation(synthetic_root):
    ds = CarlaSegPred(root=str(synthetic_root), past_frames=4, future_frames=3,
                      load_measurements=True, crop=(8, 8), resize=(32, 32))
    loader = BatchLoader(ds, batch_size=4)
    batch = next(iter(loader))
    imgs, meas = batch
    assert imgs.shape == (4, 4, 32, 32, 3)
    assert meas["control"].shape == (4, 2)
    assert len(loader) == 18 // 4


def test_thin_stopped_windows(tmp_path):
    """thin_stopped keeps 1-in-N fully-stopped brake windows and never thins
    moving-brake (onset) or cruise windows — the red-light-wait duplication
    fix (a waiting expert records hundreds of identical stopped frames)."""
    import cv2
    import json as _json

    from pmoe_tpu.data.dataset import CarlaSegPred

    rng = np.random.default_rng(0)
    d = tmp_path / "episode_000"
    for sub in ("rgb", "measurements"):
        (d / sub).mkdir(parents=True)
    # frames 0-9 cruising, 10-11 braking while moving (onset), 12-51 stopped
    # at a light (brake, speed 0), 52-59 cruising again
    for i in range(60):
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        cv2.imwrite(str(d / "rgb" / f"{i:05d}.png"), img)
        if 10 <= i < 12:
            m = {"steer": 0.0, "brake": 1.0, "throttle": 0.0, "speed": 4.0,
                 "target_speed": 6.0, "command": 4}
        elif 12 <= i < 52:
            m = {"steer": 0.0, "brake": 1.0, "throttle": 0.0, "speed": 0.0,
                 "target_speed": 6.0, "command": 4}
        else:
            m = {"steer": 0.1, "brake": 0.0, "throttle": 0.7, "speed": 5.0,
                 "target_speed": 6.0, "command": 4}
        (d / "measurements" / f"{i:05d}.json").write_text(_json.dumps(m))

    def build(thin):
        return CarlaSegPred(root=str(tmp_path), past_frames=4,
                            future_frames=1, crop=(4, 4), resize=(16, 16),
                            mode="train", load_measurements=True,
                            thin_stopped=thin)

    full, thinned = build(1), build(8)
    n_stopped_full = sum(1 for i in full.indices
                         if 12 <= i + 4 < 52)
    n_stopped_thin = sum(1 for i in thinned.indices
                         if 12 <= i + 4 < 52)
    assert n_stopped_full == 40
    assert n_stopped_thin == 5                      # 1 in 8
    # non-stopped windows are untouched (onset + cruise all kept)
    assert len(thinned) == len(full) - (40 - 5)


def test_thin_to_frame_budget(tmp_path):
    """Pool-budget thinning (round-5 OOM fix): drops contiguous unprotected
    frame segments until the unique-frame set fits, pins turn/brake-onset
    windows, and rebuilds train+val indices consistently."""
    import json

    from pmoe_tpu.data.device_pool import (thin_to_frame_budget,
                                           unique_window_paths)

    root = tmp_path / "data"
    rng = np.random.default_rng(3)
    for ep in range(3):
        d = root / f"episode_{ep:03d}"
        (d / "rgb").mkdir(parents=True)
        (d / "measurements").mkdir()
        for i in range(200):
            (d / "rgb" / f"{i:05d}.png").touch()
            # one short turn burst per episode; everything else cruising
            cmd = 3 if 90 <= i < 98 else 4
            (d / "measurements" / f"{i:05d}.json").write_text(json.dumps({
                "steer": 0.0, "brake": 0.0, "throttle": 0.6,
                "speed": 5.0, "target_speed": 5.0, "command": cmd}))

    def make(stride):
        return CarlaSegPred(root=str(root), past_frames=4, future_frames=1,
                            mode="train", load_measurements=True,
                            stride=stride, seed=0)

    train, val = make(1), make(8)
    n_frames = len(unique_window_paths(train, val))
    assert n_frames > 500
    turn_windows = {tuple(train.img_address[i]) for i in train.indices
                    if json.load(open(train.measurements[i]))["command"] != 4}

    budget = n_frames - 128
    dropped = thin_to_frame_budget(train, val, budget, seg=16, seed=0)
    assert dropped >= 128
    assert len(unique_window_paths(train, val)) <= budget
    # every protected (turn) window survived the rebuild
    survivors = {tuple(train.img_address[i]) for i in train.indices}
    assert turn_windows <= survivors
    # val windows referencing dropped frames are gone too: no kept window
    # (either split) references a frame outside the surviving pool
    pool = set(unique_window_paths(train, val))
    for ds in (train, val):
        for i in ds.indices:
            assert all(p in pool for p in ds.img_address[i])

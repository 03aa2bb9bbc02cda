"""Vision utilities: mask decoding to the CARLA palette and action overlays.

Vectorized replacement for the reference utils/vision.py (decode_mask:26,
draw_on_image:88, plot_images:9): mask decode is a single palette gather instead
of a per-class Python loop, and overlays use PIL's default font (the reference's
bundled FUTURAM.ttf is not redistributed).
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw

__all__ = ["LABEL_COLORS", "decode_mask", "draw_on_image", "make_grid"]

# CARLA 0.9.10 semantic palette (reference utils/vision.py:40-70)
LABEL_COLORS = np.array(
    [
        (0, 0, 0),        # 0  Unlabeled
        (70, 70, 70),     # 1  Building
        (100, 40, 40),    # 2  Fence
        (55, 90, 80),     # 3  Other
        (220, 20, 60),    # 4  Pedestrian
        (153, 153, 153),  # 5  Pole
        (157, 234, 50),   # 6  RoadLine
        (128, 64, 128),   # 7  Road
        (244, 35, 232),   # 8  SideWalk
        (107, 142, 35),   # 9  Vegetation
        (0, 0, 142),      # 10 Vehicles
        (102, 102, 156),  # 11 Wall
        (220, 220, 0),    # 12 TrafficSign
        (70, 130, 180),   # 13 Sky
        (81, 0, 81),      # 14 Ground
        (150, 100, 100),  # 15 Bridge
        (230, 150, 140),  # 16 RailTrack
        (180, 165, 180),  # 17 GuardRail
        (250, 170, 30),   # 18 TrafficLight
        (110, 190, 160),  # 19 Static
        (170, 120, 50),   # 20 Dynamic
        (45, 60, 150),    # 21 Water
        (145, 170, 100),  # 22 Terrain
    ],
    dtype=np.uint8,
)


def decode_mask(mask: np.ndarray, nc: int = 23) -> np.ndarray:
    """Segmentation map -> float RGB in [0,1], shape (3, H, W).

    Accepts either class indices (H, W) or logits (C, H, W) which are argmaxed,
    matching the reference interface (utils/vision.py:26-86).
    """
    mask = np.asarray(mask)
    if mask.ndim == 3:
        mask = np.argmax(mask, axis=0)
    mask = np.clip(mask.astype(np.int64), 0, nc - 1)
    rgb = LABEL_COLORS[mask]                      # (H, W, 3) palette gather
    return rgb.transpose(2, 0, 1).astype(np.float64) / 255.0


def _split_pedal(pedal: float) -> tuple[float, float]:
    return (pedal, 0.0) if pedal > 0 else (0.0, -pedal)


def draw_on_image(img: np.ndarray, measurements: dict, action, gt: bool = True) -> np.ndarray:
    """Overlay predicted (red) and ground-truth (green) controls on a frame.

    ``img`` is (C, H, W) float; returns an annotated HWC uint8 array
    (reference utils/vision.py:88-152 layout).
    """
    action = np.asarray(action, dtype=np.float64).reshape(-1)
    steer, pedal = float(action[0]), float(action[1])
    throttle, brake = _split_pedal(pedal)

    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] in (1, 3):
        img = img.transpose(1, 2, 0)
    lo, hi = img.min(), img.max()
    img8 = (((img - lo) / max(hi - lo, 1e-8)) * 255).astype(np.uint8)
    if img8.shape[-1] == 1:
        img8 = np.repeat(img8, 3, axis=-1)
    pil = Image.fromarray(img8)
    draw = ImageDraw.Draw(pil)
    w = img8.shape[1] // 2
    red, green = (255, 0, 0), (0, 255, 0)
    draw.text((5, 30), "Steer: %.3f" % steer, fill=red)
    draw.text((5, 50), "Throttle: %.3f" % throttle, fill=red)
    draw.text((5, 70), "Brake: %.3f" % brake, fill=red)

    command = np.asarray(measurements["command"])
    draw.text((w, 10), "Command: %i" % int(command.argmax()), fill=green)
    if gt:
        control = np.asarray(measurements["control"], dtype=np.float64).reshape(-1)
        steer_gt, pedal_gt = float(control[0]), float(control[1])
        throttle_gt, brake_gt = _split_pedal(pedal_gt)
        draw.text((5, 10), "Speed: %.3f" % float(measurements["speed"]), fill=green)
        draw.text((w, 30), "Steer: %.3f" % steer_gt, fill=green)
        draw.text((w, 50), "Throttle: %.3f" % throttle_gt, fill=green)
        draw.text((w, 70), "Brake: %.3f" % brake_gt, fill=green)
    return np.array(pil)


def make_grid(batch: np.ndarray, padding: int = 2, normalize: bool = True) -> np.ndarray:
    """Tile a batch (B, C, H, W) into one (C, H', W') image grid."""
    batch = np.asarray(batch, dtype=np.float64)
    b, c, h, w = batch.shape
    if normalize:
        lo = batch.reshape(b, -1).min(axis=1).reshape(b, 1, 1, 1)
        hi = batch.reshape(b, -1).max(axis=1).reshape(b, 1, 1, 1)
        batch = (batch - lo) / np.maximum(hi - lo, 1e-8)
    cols = int(np.ceil(np.sqrt(b)))
    rows = int(np.ceil(b / cols))
    grid = np.zeros((c, rows * (h + padding) + padding, cols * (w + padding) + padding))
    for i in range(b):
        r, cc = divmod(i, cols)
        y = r * (h + padding) + padding
        x = cc * (w + padding) + padding
        grid[:, y:y + h, x:x + w] = batch[i]
    return grid

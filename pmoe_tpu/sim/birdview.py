"""Ego-centric bird's-eye-view renderer (12-channel occupancy map).

Functional rebuild of the reference's pygame map renderer backing the
``sensor.map`` pseudo-sensor (/root/reference/PMoE/leaderboard/leaderboard/
envs/map_utils.py, 1728 LoC; consumed through MapReader,
sensor_interface.py:241-258). Instead of rasterizing OpenDRIVE through pygame,
this renders the simulator seam's world state with numpy/cv2 — it works on the
fake backend out of the box and on any backend exposing the same duck-typed
entity state.

Channel layout (one uint8 0/255 plane each, reference map_utils' channel set):
  0 road          4 pedestrians      8 stop signs
  1 lane edges    5 red lights       9 ego
  2 route plan    6 yellow lights   10 reserved
  3 vehicles      7 green lights    11 reserved

The view is ego-centric: ego at (0.5*W, 0.75*H) heading up, ``ppm`` pixels per
meter.
"""

from __future__ import annotations

import math
from typing import Optional

import cv2
import numpy as np

from .interface import Route

__all__ = ["render_birdview", "BIRDVIEW_CHANNELS"]

BIRDVIEW_CHANNELS = 12
_ROAD_HALF_WIDTH = 3.5


def _world_to_px(pts, ego_x, ego_y, ego_yaw, size, ppm):
    """(N,2) world -> (N,2) int pixel coords, ego-centric, heading up."""
    pts = np.atleast_2d(np.asarray(pts, float))
    c, s = math.cos(-ego_yaw), math.sin(-ego_yaw)
    rel = pts - np.array([ego_x, ego_y])
    xf = rel[:, 0] * c - rel[:, 1] * s          # forward
    yl = rel[:, 0] * s + rel[:, 1] * c          # left
    u = size * 0.5 - yl * ppm
    v = size * 0.75 - xf * ppm
    return np.stack([u, v], axis=-1).round().astype(np.int32)


def render_birdview(backend, route: Optional[Route] = None, size: int = 192,
                    ppm: float = 5.0) -> np.ndarray:
    """(size, size, 12) uint8 ego-centric occupancy planes."""
    ego = backend.ego_state()
    # draw into contiguous per-channel planes (cv2 rejects strided views)
    bev = [np.zeros((size, size), np.uint8)
           for _ in range(BIRDVIEW_CHANNELS)]
    to_px = lambda pts: _world_to_px(pts, ego.x, ego.y, ego.yaw, size, ppm)
    road_px = max(int(2 * _ROAD_HALF_WIDTH * ppm), 1)

    # roads + lane edges: grid-line corridors (fake town layout)
    grid_n = getattr(backend, "_grid_n", None)
    if grid_n is not None:
        span = grid_n * 100.0
        lines = []
        for k in range(grid_n):
            lines.append(((k * 100.0, -10.0), (k * 100.0, span + 10.0)))
            lines.append(((-10.0, k * 100.0), (span + 10.0, k * 100.0)))
        for a, b in lines:
            pa, pb = to_px([a, b])
            cv2.line(bev[0], tuple(map(int, pa)), tuple(map(int, pb)), 255,
                     thickness=road_px)
            for off in (-_ROAD_HALF_WIDTH, _ROAD_HALF_WIDTH):
                ax, ay = a
                bx, by = b
                if abs(ax - bx) < 1e-6:       # vertical road: offset in x
                    ea, eb = (ax + off, ay), (bx + off, by)
                else:
                    ea, eb = (ax, ay + off), (bx, by + off)
                qa, qb = to_px([ea, eb])
                cv2.line(bev[1], tuple(map(int, qa)), tuple(map(int, qb)), 255, thickness=1)

    # route plan
    if route is not None and len(route.positions) > 1:
        pts = to_px(route.positions)
        cv2.polylines(bev[2], [pts], False, 255, thickness=2)

    # actors
    t = getattr(backend, "t", 0.0)
    for npc in getattr(backend, "_npcs", []):
        p = to_px(npc.position(t))[0]
        if npc.kind == "vehicle":
            h = int(2.2 * ppm / 2)
            cv2.rectangle(bev[3], (int(p[0]) - h, int(p[1]) - h),
                          (int(p[0]) + h, int(p[1]) + h), 255, -1)
        else:
            cv2.circle(bev[4], (int(p[0]), int(p[1])), max(int(0.4 * ppm), 1), 255, -1)

    for light in getattr(backend, "_lights", []):
        p = to_px((light.x, light.y))[0]
        ch = 5 if light.is_red(t) else 7
        cv2.circle(bev[ch], (int(p[0]), int(p[1])), max(int(0.8 * ppm), 1), 255, -1)

    for sign in getattr(backend, "_stop_signs", []):
        p = to_px(sign)[0]
        cv2.circle(bev[8], (int(p[0]), int(p[1])), max(int(0.6 * ppm), 1), 255, -1)

    # ego marker: 4.5 x 2 m box at the anchor
    eu, ev = int(size * 0.5), int(size * 0.75)
    half_l, half_w = int(2.25 * ppm), int(1.0 * ppm)
    cv2.rectangle(bev[9], (eu - half_w, ev - half_l),
                  (eu + half_w, ev + half_l), 255, -1)
    return np.stack(bev, axis=-1)

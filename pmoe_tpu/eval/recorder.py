"""Episode recorder + metrics log — the srunner metrics toolchain analog.

The reference replays CARLA server recorder ``.log`` files through
``srunner/metrics/tools/metrics_log.py``'s query API and runs user metric
classes over them (``scenario_runner/metrics_manager.py``). Here the recorder
is client-side: :class:`EpisodeRecorder` snapshots the world (ego + scripted
actors + traffic lights + collisions) every tick into a JSON document, and
:class:`MetricsLog` exposes the same query surface (actor ids by type,
per-frame transforms/velocities, criteria results) over it. Metric classes
live in :mod:`pmoe_tpu.eval.metrics` and are executed by
``python -m pmoe_tpu.eval.metrics_manager``.

Actor ids: the ego is always id 0 with type ``"ego"``; scripted NPCs get
ids 1..N with their backend kind (vehicle / walker / static).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np

__all__ = ["EpisodeRecorder", "MetricsLog"]

_FORMAT_VERSION = 1


class EpisodeRecorder:
    """Per-tick world-state recorder over the simulator seam.

    Hook into the tick loop via ``run_episode(..., recorder=rec)``; save with
    :meth:`save` once the episode ends.
    """

    def __init__(self, town: str = "", route=None):
        self.header = {"version": _FORMAT_VERSION, "town": town}
        if route is not None:
            self.header["route"] = np.asarray(route.positions).tolist()
        self.frames: List[dict] = []
        self.criteria: Dict[str, dict] = {}

    def on_tick(self, backend, frame) -> None:
        ego = backend.ego_state()
        actors = [{"id": 0, "type": "ego", "x": ego.x, "y": ego.y,
                   "yaw": ego.yaw, "speed": ego.speed}]
        for i, npc in enumerate(getattr(backend, "_npcs", [])):
            p = npc.position(backend.t)
            actors.append({"id": i + 1, "type": npc.kind,
                           "x": float(p[0]), "y": float(p[1]),
                           "yaw": 0.0, "speed": float(npc.speed)})
        rec = {"frame": frame.frame, "t": frame.timestamp, "actors": actors}
        if frame.collision is not None:
            rec["collision"] = {"other_type": frame.collision.other_type,
                                "intensity": frame.collision.intensity}
        lights = getattr(backend, "_lights", None)
        if lights:
            rec["lights_red"] = [bool(l.is_red(backend.t)) for l in lights]
        self.frames.append(rec)

    def record_criteria(self, criteria_tree) -> None:
        """Store final criteria results (the reference's criteria JSON fed to
        metrics_manager --criteria)."""
        for c in getattr(criteria_tree, "criteria", []):
            self.criteria[type(c).__name__] = {
                "test_status": c.test_status,
                "actual_value": c.actual_value,
                "events": list(c.events),
            }

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"header": self.header, "frames": self.frames,
                       "criteria": self.criteria}, f)


class MetricsLog:
    """Query API over a saved recording
    (srunner/metrics/tools/metrics_log.py contract)."""

    def __init__(self, data: dict):
        if data.get("header", {}).get("version") != _FORMAT_VERSION:
            raise ValueError("unknown recording format")
        self.header = data["header"]
        self.frames: List[dict] = data["frames"]
        self.criteria: Dict[str, dict] = data.get("criteria", {})

    @classmethod
    def load(cls, path: str) -> "MetricsLog":
        with open(path) as f:
            return cls(json.load(f))

    # -- actor queries ---------------------------------------------------------
    def get_ego_vehicle_id(self) -> int:
        return 0

    def get_actor_ids_with_type(self, actor_type: str) -> List[int]:
        ids: List[int] = []
        for fr in self.frames:
            for a in fr["actors"]:
                if a["type"] == actor_type and a["id"] not in ids:
                    ids.append(a["id"])
        return ids

    def get_total_frame_count(self) -> int:
        return len(self.frames)

    def _actor_at(self, actor_id: int, frame_idx: int) -> Optional[dict]:
        for a in self.frames[frame_idx]["actors"]:
            if a["id"] == actor_id:
                return a
        return None

    def get_actor_transform(self, actor_id: int, frame_idx: int):
        """(x, y, yaw) or None when the actor wasn't alive that frame."""
        a = self._actor_at(actor_id, frame_idx)
        return None if a is None else (a["x"], a["y"], a["yaw"])

    def get_actor_velocity(self, actor_id: int, frame_idx: int) -> Optional[float]:
        a = self._actor_at(actor_id, frame_idx)
        return None if a is None else a["speed"]

    def get_actor_alive_frames(self, actor_id: int):
        alive = [i for i in range(len(self.frames))
                 if self._actor_at(actor_id, i) is not None]
        return (alive[0], alive[-1]) if alive else (None, None)

    def get_simulation_time(self, frame_idx: int) -> float:
        return self.frames[frame_idx]["t"]

    def get_collisions(self) -> List[dict]:
        return [{"frame": fr["frame"], **fr["collision"]}
                for fr in self.frames if "collision" in fr]

    def get_criterion(self, name: str) -> Optional[dict]:
        return self.criteria.get(name)

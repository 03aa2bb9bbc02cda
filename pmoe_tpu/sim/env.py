"""Gym-style RL environment over a :class:`DrivingBackend` — the ``make_suite``
equivalent the reference's stage 3 imports but never vendored
(reference trainer/train_3.py:21-27 imports the missing utils.carla_utils /
utils.benchmark; SURVEY §2.4 flags this as broken-as-shipped).

Behavioral spec reconstructed from the call sites (train_3.py:85-188): the env
yields (frame-stack, speed, command) observations, accepts [steer, pedal]
actions post-processed to vehicle controls, returns a scalar reward in
``info["reward"]``, and terminates on collision / completion / timeout.

Reward design (documented, config-tunable): route progress (m per tick)
+ speed-tracking toward a target speed - heavy collision penalty
- off-route penalty, the standard shaping used by the World-on-Rails-style
CARLA benchmarks the reference borrowed from.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..data.dataset import crop_resize
from ..eval.criteria import (BlockedTest, CollisionTest, CriteriaTree,
                             InRouteTest, RouteCompletionTest, TimeoutTest)
from .interface import (DrivingBackend, RoadOption, VehicleControl, SIM_DT)

__all__ = ["DrivingGym", "postprocess_action"]


def postprocess_action(action: np.ndarray) -> VehicleControl:
    """[steer, pedal] -> control (reference train_3.py:30-42 semantics:
    pedal >= 0 is throttle, pedal < 0 is brake)."""
    steer = float(np.clip(action[0], -1.0, 1.0))
    pedal = float(action[1])
    if pedal >= 0:
        return VehicleControl(steer=steer, throttle=min(pedal, 1.0), brake=0.0)
    return VehicleControl(steer=steer, throttle=0.0, brake=min(-pedal, 1.0))


class DrivingGym:
    def __init__(self, backend: DrivingBackend, past_frames: int = 4,
                 crop=(125, 90), resize=(224, 224), n_commands: int = 4,
                 speed_factor: float = 10.0, target_speed: float = 6.0,
                 episode_length: int = 1000,
                 collision_penalty: float = 100.0):
        self.backend = backend
        self.past_frames = past_frames
        self.crop, self.resize = tuple(crop), tuple(resize)
        self.n_commands = n_commands
        self.speed_factor = speed_factor
        self.target_speed = target_speed
        self.episode_length = episode_length
        self.collision_penalty = collision_penalty
        self._frames: Optional[np.ndarray] = None
        self._criteria: Optional[CriteriaTree] = None
        self._route = None
        self._ticks = 0
        self._last_completion = 0.0

    # -- observation assembly ------------------------------------------------------
    def _push_frame(self, rgb: np.ndarray) -> None:
        small = crop_resize(rgb, self.crop, self.resize)
        self._frames = np.concatenate(
            [self._frames[1:], small[None]], axis=0)

    def _current_command(self) -> int:
        """RoadOption at the route node the ego has reached (the waypointer's
        command stream, remapped like ImageAgent: value-1, VOID -> 3)."""
        cmd = RoadOption.LANEFOLLOW
        if self._criteria is not None and self._route is not None:
            rc = self._criteria.get("RouteCompletionTest")
            idx = min(getattr(rc, "_best_idx", 0),
                      len(self._route.options) - 1)
            if self._route.options:
                cmd = self._route.options[idx]
        value = int(cmd) - 1
        value = 3 if value < 0 else value
        return min(value, self.n_commands - 1)

    def _obs(self, frame) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        speed = np.array([[frame.speed / self.speed_factor]], np.float32)
        command = np.zeros((1, self.n_commands), np.float32)
        command[0, self._current_command()] = 1.0
        return self._frames[None].copy(), speed, command

    # -- gym API --------------------------------------------------------------------
    def reset(self, start_idx: int = 0, target_idx: int = 5, weather: int = 1,
              n_vehicles: int = 0, n_pedestrians: int = 0, seed: int = 0):
        self._route = self.backend.trace_route(start_idx, target_idx)
        frame = self.backend.reset(self._route, weather=weather,
                                   n_vehicles=n_vehicles,
                                   n_pedestrians=n_pedestrians, seed=seed)
        h, w = self.resize
        self._frames = np.zeros((self.past_frames, h, w, 3), np.uint8)
        if frame.rgb is not None:
            self._push_frame(frame.rgb)
        self._criteria = CriteriaTree([
            CollisionTest(terminate_on_failure=True),
            RouteCompletionTest(self._route),
            InRouteTest(self._route),
            BlockedTest(),
            TimeoutTest(self._route),
        ])
        self._ticks = 0
        self._last_completion = 0.0
        return self._obs(frame)

    def step(self, action: np.ndarray):
        control = postprocess_action(np.asarray(action).reshape(-1))
        frame = self.backend.tick(control)
        if frame.rgb is not None:
            self._push_frame(frame.rgb)
        ego = self.backend.ego_state()
        self._criteria.update(ego, frame)
        self._ticks += 1

        rc = self._criteria.get("RouteCompletionTest")
        progress = max(float(rc.actual_value) - self._last_completion, 0.0)
        self._last_completion = float(rc.actual_value)

        reward = (1.0 * progress
                  - 0.05 * abs(ego.speed - self.target_speed) * SIM_DT)
        done = False
        if frame.collision is not None:
            reward -= self.collision_penalty
            done = True
        if self._criteria.should_terminate or self._ticks >= self.episode_length:
            done = True

        obs = self._obs(frame)
        info = {"reward": reward, "route_completion": self._last_completion,
                "collision": frame.collision is not None,
                "speed": ego.speed}
        return obs, reward, done, info

"""ImageAgent: the closed-loop vision->control inference agent.

Reference: /root/reference/PMoE/autoagents/image_agent.py. Behavior preserved:
* sensors: collision + speedometer + GNSS + one 800x600 fov-100 RGB camera
  (image_agent.py:101-112);
* per tick: BGR->RGB, crop(125,90) + resize(224), 4-frame window, speed / 10,
  waypointer command remapped ``cmd.value - 1`` with VOID -> 3
  (image_agent.py:148-149);
* asymmetric postprocess: pedal < -0.5 -> brake with steer zeroed, else
  throttle clip(0, 0.75) floored at 0.4 (image_agent.py:114-125).

TPU redesign of the hot path (SURVEY §7.1 step 6): the 4-frame window is a
DEVICE-RESIDENT ring buffer — each 20 Hz tick uploads ONE 224x224 uint8 frame
(150 KB instead of 2.4 MB of float32 4-frame stacks), and normalize + roll +
model.sample run inside a single jitted function with static shapes (no
recompiles in the sync loop).

One-tick-latency pipeline (default on, ``pipeline: false`` to disable): the
tick-t ``sample`` is DISPATCHED asynchronously and the action applied at tick
t is the one computed from tick t-1's frame, whose device->host copy was
started at dispatch and overlapped the intervening simulator step. The
synchronous form pays (dispatch + compute + fetch) round-trip latency inside
every tick; the pipelined form pays only host-side dispatch overhead, so the
loop holds the 20 Hz budget even when the device round-trip alone exceeds it
(standard real-time-control practice; the reference's synchronous
image_agent.py:127-177 inherits torch's eager blocking semantics instead).
"""

from __future__ import annotations

import os
import time
from functools import partial
from pathlib import Path

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import crop_resize
from ..models.moe import get_model
from ..sim.interface import RoadOption, VehicleControl
from ..utils import get_conf, load_checkpoint, graft, init_logger
from ..utils.nn import jit_init
from .autonomous_agent import AutonomousAgent, Track
from .waypointer import Waypointer

__all__ = ["ImageAgent", "get_entry_point", "postprocess",
           "load_actor_variables"]


def get_entry_point() -> str:
    return "ImageAgent"


def postprocess(action: np.ndarray) -> VehicleControl:
    """Asymmetric brake/throttle mapping (reference image_agent.py:114-125):
    pedal < -0.5 brakes with steer zeroed; else throttle clip(0, 0.75)
    floored at 0.4. Module-level so the fleet runner shares the exact
    mapping with the per-episode agent."""
    control = VehicleControl()
    control.steer = float(np.clip(action[0], -1.0, 1.0))
    if action[1] < -0.5:
        control.throttle = 0.0
        control.brake = float(np.clip(-action[1], 0.0, 1.0))
        control.steer = 0.0
    else:
        control.throttle = max(float(np.clip(action[1], 0.0, 0.75)), 0.4)
        control.brake = 0.0
    return control


def load_actor_variables(model, actor_cfg, n_frames: int, n_commands: int):
    """Init the actor and graft its checkpoint (``model_dir``), committing the
    restored tree to the device once (see setup(); shared with the fleet
    runner so both restore paths are one implementation)."""
    rng = jax.random.PRNGKey(0)
    dummy = (jnp.zeros((1, n_frames, 224, 224, 3)), jnp.zeros((1, 1)),
             jnp.zeros((1, n_commands)))
    variables = jit_init(model, {"params": rng, "sample": rng}, *dummy)
    model_dir = str(actor_cfg.get("model_dir", ""))
    if model_dir and Path(model_dir).exists():
        ck = load_checkpoint(model_dir)
        variables = {
            "params": graft(variables["params"], ck.get("model", ck)),
            "batch_stats": (graft(variables.get("batch_stats", {}),
                                  ck["batch_stats"])
                            if "batch_stats" in ck
                            else variables.get("batch_stats", {})),
        }
        variables = jax.device_put(variables)
    return variables


class ImageAgent(AutonomousAgent):
    """Trained image agent (leaderboard plug-in)."""

    #: compiled (model, step_fn) shared across instances — evaluators create
    #: a fresh agent per episode (reference semantics) and a tunneled-TPU
    #: recompile costs minutes
    _step_cache: dict = {}

    def setup(self, config) -> None:
        self.track = Track.SENSORS
        self.num_frames = 0
        self.config = get_conf(config) if isinstance(config, (str, Path)) else config

        actor_cfg = self.config.model.actor
        self.n_commands = int(actor_cfg.get("n_commands", 4))
        self.n_frames = int(actor_cfg.backbone.get("n_frames", 4))
        from ..utils import to_dict
        import json

        cache_key = json.dumps(to_dict(actor_cfg), sort_keys=True,
                               default=str)
        cached = self._step_cache.get(cache_key)
        self.model = cached[0] if cached else get_model(actor_cfg)

        # init + restore. The grafted variables are cached with the compiled
        # step (the cache key includes model_dir): evaluators build a fresh
        # agent per episode, and re-initializing + re-reading the checkpoint
        # every episode costs minutes on a tunneled chip.
        if cached:
            variables = cached[2]
        else:
            # init + graft + one-time device commit (graft returns host numpy
            # leaves; numpy arguments re-upload on EVERY jitted call — ~90
            # MB/tick through the agent hot loop on a tunneled link)
            variables = load_actor_variables(self.model, actor_cfg,
                                             self.n_frames, self.n_commands)
        # optional expert-parallel inference: the stacked-expert axis of the
        # MoE params shards over an 'expert' mesh and XLA partitions the
        # jitted sample accordingly (the cache key includes the actor cfg,
        # so sharded and unsharded agents never share compiled steps)
        par = dict(actor_cfg.get("parallel", {}) or {})
        n_expert_devices = int(par.get("expert", 1))
        self.mesh = None
        if n_expert_devices > 1:
            from ..parallel import make_mesh, shard_params

            self.mesh = make_mesh(jax.devices()[:n_expert_devices],
                                  data=1, expert=n_expert_devices)
            variables = {k: shard_params(self.mesh, v)
                         for k, v in variables.items()}
        self._variables = variables

        # device-resident ring buffer of normalized frames (1, T, H, W, 3)
        self._frames = jnp.zeros((1, self.n_frames, 224, 224, 3), jnp.float32)
        self._rng = jax.random.PRNGKey(2021)
        # one-tick-latency pipeline: the action applied at tick t was computed
        # from tick t-1's frame (see module docstring). The first tick blocks
        # (no previous action exists), so tick 0 matches the synchronous form.
        self._pipeline = bool(self.config.get("pipeline", True))
        self._pending_action = None
        # fetch-thread overlap (loop_diag decomposition: the ~12 ms/tick D2H
        # fetch of the PREVIOUS action still ran synchronously inside
        # run_step; a single reader thread makes it overlap the simulator
        # tick, so the loop pays only the residual wait). Same one-tick
        # alignment — only WHERE the copy completes changes.
        self._fetch_pool = None
        self._pending_future = None
        if self._pipeline and os.environ.get(
                "PMOE_PIPELINE_FETCH_THREAD", "0") == "1":
            import concurrent.futures

            self._fetch_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="pmoe-action-fetch")
        # PMOE_AGENT_TIMERS=1: accumulate per-stage wall time (preprocess /
        # dispatch / fetch) for the closed-loop decomposition in
        # tools/bench_sweep.diag_closed_loop — negligible overhead when off
        self._timers = ({"pre": 0.0, "dispatch": 0.0, "fetch": 0.0}
                        if os.environ.get("PMOE_AGENT_TIMERS") else None)

        if cached:
            self._jit_step = cached[1]
        else:
            model = self.model

            @jax.jit
            def _step(variables, frames, new_frame_u8, speed, command, rng):
                """Roll the window, normalize the new frame on device, sample."""
                frame = new_frame_u8.astype(jnp.float32) / 255.0
                frames = jnp.concatenate([frames[:, 1:], frame[None, None]],
                                         axis=1)
                action = model.apply(
                    variables, frames, speed, command, False,
                    method="sample", rngs={"sample": rng})
                return frames, action[0]

            self._jit_step = _step
            self._step_cache[cache_key] = (self.model, _step, variables)
        self.waypointer = None
        self.vizs = []
        self.logger = (init_logger(self.config.logger)
                       if "logger" in self.config else None)

    def sensors(self):
        s = self.config.get("sensors", {})
        return [
            {"type": "sensor.collision", "id": "COLLISION"},
            {"type": "sensor.speedometer", "id": "EGO"},
            {"type": "sensor.other.gnss", "x": 0.0, "y": 0.0,
             "z": float(s.get("camera_z", 1.3)), "id": "GPS"},
            {"type": "sensor.camera.rgb", "x": float(s.get("camera_x", 1.3)),
             "y": 0, "z": float(s.get("camera_z", 1.3)),
             "roll": 0.0, "pitch": 0.0, "yaw": 0.0,
             "width": int(s.get("img_width", 800)),
             "height": int(s.get("img_height", 600)),
             "fov": int(s.get("fov", 100)), "id": "Narrow_RGB"},
        ]

    def postprocess(self, action: np.ndarray) -> VehicleControl:
        """Asymmetric brake/throttle mapping (reference image_agent.py:114-125)."""
        return postprocess(action)

    def run_step(self, input_data: dict, timestamp: float) -> VehicleControl:
        t0 = time.perf_counter() if self._timers is not None else 0.0
        _, rgb_raw = input_data["Narrow_RGB"]
        # cameras deliver BGR(A) (CARLA convention; the fake backend matches)
        rgb = rgb_raw[..., :3][..., ::-1]

        rgb224 = crop_resize(np.ascontiguousarray(rgb), (125, 90), (224, 224))

        _, ego = input_data["EGO"]
        _, gps = input_data["GPS"]
        if self.waypointer is None:
            self.waypointer = Waypointer(self._global_plan, gps)
        _, _, cmd = self.waypointer.tick(gps)

        # command remap (reference image_agent.py:148-149)
        cmd_value = int(cmd) - 1
        cmd_value = 3 if cmd_value < 0 else cmd_value

        speed = np.array([[ego["spd"] / 10.0]], np.float32)
        command = np.zeros((1, self.n_commands), np.float32)
        command[0, cmd_value] = 1.0

        if self._timers is not None:
            t1 = time.perf_counter()
            self._timers["pre"] += t1 - t0
        self._rng, k = jax.random.split(self._rng)
        self._frames, action_dev = self._jit_step(
            self._variables, self._frames, jnp.asarray(rgb224),
            jnp.asarray(speed), jnp.asarray(command), k)
        if self._pipeline:
            # start the D2H copy now so it overlaps the coming sim tick, and
            # apply the PREVIOUS tick's (already-arrived) action this tick
            if hasattr(action_dev, "copy_to_host_async"):
                action_dev.copy_to_host_async()
            if self._fetch_pool is not None:
                prev_future = self._pending_future
                self._pending_future = self._fetch_pool.submit(
                    np.asarray, action_dev)
                if self._timers is not None:
                    t2 = time.perf_counter()
                    self._timers["dispatch"] += t2 - t1
                action = (np.asarray(action_dev) if prev_future is None
                          else prev_future.result())
                if self._timers is not None:
                    self._timers["fetch"] += time.perf_counter() - t2
            else:
                prev = self._pending_action
                self._pending_action = action_dev
                if self._timers is not None:
                    t2 = time.perf_counter()
                    self._timers["dispatch"] += t2 - t1
                action = np.asarray(action_dev if prev is None else prev)
                if self._timers is not None:
                    self._timers["fetch"] += time.perf_counter() - t2
        else:
            action = np.asarray(action_dev)
            if self._timers is not None:
                self._timers["fetch"] += time.perf_counter() - t1
        self.num_frames += 1

        # eval media: annotated frames every ~25 ticks, flushed as a strip
        # every 1000 frames (reference image_agent.py:90-99 logs videos)
        if self.logger is not None and not self.logger.disabled:
            if self.num_frames % 25 == 0:
                from ..utils.vision import draw_on_image

                self.vizs.append(draw_on_image(
                    rgb224.astype(np.float32).transpose(2, 0, 1) / 255.0,
                    {"command": command[0]}, action, gt=False))
            if self.num_frames % 1000 == 0:
                self.flush_vizs()
        return self.postprocess(action)

    def flush_vizs(self) -> None:
        if self.vizs and self.logger is not None:
            strip = np.concatenate(self.vizs[-16:], axis=1)
            self.logger.log_image(strip, name="eval_strip",
                                  step=self.num_frames)
            # the comet video-asset analog (reference image_agent.py:90-99)
            self.logger.log_video(self.vizs, name="eval",
                                  step=self.num_frames)
            self.vizs.clear()

    def destroy(self) -> None:
        self.flush_vizs()
        self.waypointer = None
        self._pending_action = None
        if self._fetch_pool is not None:
            self._fetch_pool.shutdown(wait=False)
            self._fetch_pool = None
        self._pending_future = None
        self.vizs.clear()

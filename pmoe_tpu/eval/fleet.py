"""Fleet NoCrash runner: N episodes stepped in lockstep with ONE batched
jitted ``sample`` per tick.

The reference scales evaluation by fanning out Ray actors over many CARLA
servers and many GPUs (runners/scenario_runner.py:124). On a single TPU chip
the idiomatic equivalent is batching: the per-episode agent's device work
(ring-buffer roll + normalize + MoE sample) is identical across episodes, so
N episode slots share one jitted call whose batch axis is the slot axis —
the dispatch/round-trip cost that bounds the sequential loop (~30 ms through
a tunneled chip) amortizes over N episodes, and the one-tick-latency pipeline
(agents/image_agent.py module docstring) overlaps the device round trip with
the N simulator ticks.

Semantic parity with the official per-episode path is engineered, not hoped
for: per-slot RNG streams split exactly like ``ImageAgent`` (PRNGKey(2021),
host-ordered splits), the same crop/resize/normalize, the same eval-threshold
``Waypointer`` commands, the same ``postprocess``, and the same
``nocrash_criteria`` tree — pinned by tests/test_fleet.py, which requires the
fleet to reproduce the sequential evaluator's episode rows. What the fleet
does NOT replicate is the per-episode harness plumbing (SensorHub reader
threads, watchdogs): it is a throughput runner for the fake backend; real-
CARLA evaluation keeps the per-episode path.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..agents.image_agent import load_actor_variables, postprocess
from ..agents.waypointer import Waypointer
from ..data.dataset import crop_resize
from ..models.moe import get_model
from ..sim.interface import SIM_DT
from .nocrash import TRAFFIC_TABLES, nocrash_criteria

__all__ = ["FleetNoCrashRunner", "FleetTask"]


@dataclass
class FleetTask:
    town: str
    traffic_idx: int
    weather: int
    start_idx: int
    target_idx: int


@dataclass
class _Slot:
    backend: object
    task: Optional[FleetTask] = None
    trace: object = None
    criteria: object = None
    waypointer: object = None
    frame: object = None                    # latest SensorFrame
    ticks: int = 0
    fresh: bool = True                      # ring buffer zeroed this tick
    pending: Optional[np.ndarray] = None    # one-tick-latency pipeline state
    t0: float = 0.0


class FleetNoCrashRunner:
    def __init__(self, cfg, n_slots: int = 8, max_ticks: Optional[int] = None,
                 verbose: bool = True, backend_factory=None):
        self.cfg = cfg
        self.n_slots = int(n_slots)
        self.max_ticks = max_ticks
        self.verbose = verbose
        actor_cfg = cfg.model.actor
        self.n_commands = int(actor_cfg.get("n_commands", 4))
        self.n_frames = int(actor_cfg.backbone.get("n_frames", 4))
        self.model = get_model(actor_cfg)
        self.variables = load_actor_variables(self.model, actor_cfg,
                                              self.n_frames, self.n_commands)
        if backend_factory is None:
            s = cfg.get("sensors", {})

            def backend_factory(town):
                from ..sim.fake_carla import FakeCarlaBackend

                return FakeCarlaBackend(
                    town=town, img_width=int(s.get("img_width", 800)),
                    img_height=int(s.get("img_height", 600)))

        self._backend_factory = backend_factory
        self._build_step()

    def _build_step(self) -> None:
        model = self.model
        S, T = self.n_slots, self.n_frames

        @jax.jit
        def fleet_step(variables, frames, fresh, new_u8, speed, command,
                       keys):
            """Per-slot: zero-if-fresh, roll window, normalize, sample —
            the ImageAgent jitted step vmapped over the slot axis with
            per-slot RNG keys (split exactly like the per-episode agent so
            slot streams match single-agent streams)."""
            frame = new_u8.astype(jnp.float32) / 255.0
            frames = jnp.where(fresh[:, None, None, None, None], 0.0, frames)
            frames = jnp.concatenate([frames[:, 1:], frame[:, None]], axis=1)

            def one(fr, sp, cm, key):
                new_key, k = jax.random.split(key)
                action = model.apply(variables, fr[None], sp[None], cm[None],
                                     False, method="sample",
                                     rngs={"sample": k})
                return action[0], new_key

            actions, new_keys = jax.vmap(one)(frames, speed, command, keys)
            return frames, actions, new_keys

        self._fleet_step = fleet_step
        self._frames = jnp.zeros((S, T, 224, 224, 3), jnp.float32)
        self._keys = jnp.stack([jax.random.PRNGKey(2021)] * S)

    # -- episode lifecycle -------------------------------------------------
    def _start(self, slot: _Slot, task: FleetTask, slot_idx: int) -> None:
        b = slot.backend
        if b.town != task.town:
            b.load_world(task.town)
        table = TRAFFIC_TABLES.get(task.town, TRAFFIC_TABLES["Town01"])
        trace = b.trace_route(task.start_idx, task.target_idx)
        frame = b.reset(
            trace, weather=task.weather,
            n_vehicles=table["cars"][task.traffic_idx],
            n_pedestrians=table["peds"][task.traffic_idx],
            seed=hash((task.traffic_idx, task.weather, task.start_idx,
                       task.target_idx)) % (2**31))
        slot.task = task
        slot.trace = trace
        slot.criteria = nocrash_criteria(b, trace)
        slot.waypointer = None
        slot.frame = frame
        slot.ticks = 0
        slot.fresh = True
        slot.pending = None
        slot.t0 = time.perf_counter()
        # fresh RNG stream, exactly the per-episode agent's (PRNGKey(2021))
        self._keys = self._keys.at[slot_idx].set(jax.random.PRNGKey(2021))

    def _finish(self, slot: _Slot, stats) -> None:
        slot.criteria.finalize()
        rc = slot.criteria.get("RouteCompletionTest")
        lights = slot.criteria.get("RunningRedLightTest")
        duration = slot.ticks * SIM_DT
        t = slot.task
        stats.log(t.town, t.traffic_idx, t.weather, t.start_idx, t.target_idx,
                  float(rc.actual_value), int(lights.actual_value), duration)
        if self.verbose:
            wall = time.perf_counter() - slot.t0
            print(f"[fleet] {t.town} t{t.traffic_idx} w{t.weather} "
                  f"{t.start_idx}->{t.target_idx}: "
                  f"RC={rc.actual_value:.1f}% lights={lights.actual_value} "
                  f"game={duration:.1f}s wall={wall:.1f}s")

    def _preprocess(self, slot: _Slot):
        """Host-side per-slot input assembly — bitwise the ImageAgent path
        (the evaluator hands the agent BGR which it flips back to RGB; the
        double flip is the identity, so the backend frame feeds directly)."""
        frame = slot.frame
        rgb224 = crop_resize(np.ascontiguousarray(frame.rgb[..., :3]),
                             (125, 90), (224, 224))
        gps = frame.gnss
        if slot.waypointer is None:
            # the same reference-downsampled plan ImageAgent.set_global_plan
            # hands its waypointer (parity requirement)
            from ..agents.autonomous_agent import downsample_plan

            slot.waypointer = Waypointer(
                downsample_plan(slot.trace.gps_plan()), gps)
        _, _, cmd = slot.waypointer.tick(gps)
        cmd_value = int(cmd) - 1
        cmd_value = 3 if cmd_value < 0 else cmd_value
        speed = np.array([frame.speed / 10.0], np.float32)
        command = np.zeros((self.n_commands,), np.float32)
        command[cmd_value] = 1.0
        return rgb224, speed, command

    # -- the lockstep loop -------------------------------------------------
    def run(self, tasks: Sequence[FleetTask], stats) -> None:
        queue: List[FleetTask] = list(tasks)
        slots: List[Optional[_Slot]] = []
        for _ in range(min(self.n_slots, max(len(queue), 1))):
            slots.append(_Slot(backend=self._backend_factory(
                queue[0].town if queue else "Town01")))
        while len(slots) < self.n_slots:
            slots.append(None)              # fewer tasks than slots

        for i, slot in enumerate(slots):
            if slot is not None and queue:
                self._start(slot, queue.pop(0), i)
            elif slot is not None:
                slots[i] = None

        S = self.n_slots
        new_u8 = np.zeros((S, 224, 224, 3), np.uint8)
        speeds = np.zeros((S, 1), np.float32)
        commands = np.zeros((S, self.n_commands), np.float32)
        fresh = np.zeros((S,), bool)

        while any(s is not None for s in slots):
            active = [i for i, s in enumerate(slots) if s is not None]
            for i in active:
                rgb224, spd, cmd = self._preprocess(slots[i])
                new_u8[i] = rgb224
                speeds[i] = spd
                commands[i] = cmd
                fresh[i] = slots[i].fresh
            # dispatch the batched sample; its upload/compute/round-trip
            # overlaps the simulator ticks below (one-tick pipeline)
            self._frames, actions_dev, self._keys = self._fleet_step(
                self.variables, self._frames, jnp.asarray(fresh),
                jnp.asarray(new_u8), jnp.asarray(speeds),
                jnp.asarray(commands), self._keys)
            if hasattr(actions_dev, "copy_to_host_async"):
                actions_dev.copy_to_host_async()

            # tick non-fresh slots with their pipelined (t-1) action now
            deferred = []
            for i in active:
                slot = slots[i]
                if slot.fresh or slot.pending is None:
                    deferred.append(i)      # needs this tick's action
                else:
                    self._tick_slot(slot, slot.pending)
            actions = np.asarray(actions_dev)
            for i in active:
                slot = slots[i]
                if i in deferred:
                    self._tick_slot(slot, actions[i])
                slot.pending = actions[i]
                slot.fresh = False

            # retire finished episodes, refill from the queue
            for i in active:
                slot = slots[i]
                done = slot.criteria.should_terminate or (
                    self.max_ticks is not None
                    and slot.ticks >= self.max_ticks)
                if done:
                    self._finish(slot, stats)
                    if queue:
                        self._start(slot, queue.pop(0), i)
                    else:
                        slot.backend.close()
                        slots[i] = None

    def _tick_slot(self, slot: _Slot, action: np.ndarray) -> None:
        control = postprocess(action)
        slot.frame = slot.backend.tick(control)
        ego = slot.backend.ego_state()
        slot.criteria.update(ego, slot.frame)
        slot.ticks += 1


def build_tasks(town: str, routes: Sequence[Tuple[int, int]],
                weathers: Sequence[int], stats) -> List[FleetTask]:
    """The evaluator's traffic x route x weather product with resume-skip
    (nocrash.py NoCrashEvaluator.run ordering)."""
    tasks = []
    for traffic_idx in range(3):
        for route in routes:
            for weather in weathers:
                if stats.is_finished(town, route, weather, traffic_idx):
                    continue
                tasks.append(FleetTask(town, traffic_idx, weather,
                                       route[0], route[1]))
    return tasks

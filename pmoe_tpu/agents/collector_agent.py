"""Data-collection agent: drives a route and writes training episodes.

The reference vendors World-on-Rails collector agents that write lmdb
(reference autoagents/collector_agents/random_collector.py; the Q-collector is
broken — it imports absent ``rails.*`` modules, SURVEY §1.5). This rebuild
writes directly in the framework's dataset layout
(``root/<episode>/{rgb,mask,measurements}/`` — data/dataset.py), so collected
episodes feed stages 0-2 without conversion. The driving policy is a scripted
waypoint follower with optional action noise (the reference random collector's
noisy-expert idea).
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Optional

import cv2
import numpy as np

from ..sim.interface import RoadOption, VehicleControl
from .autonomous_agent import AutonomousAgent, Track
from .waypointer import Waypointer

__all__ = ["CollectorAgent", "TrafficAwareExpert", "RandomCollectorAgent",
           "QCollectorAgent", "CollectorCollision", "collect_episode",
           "get_entry_point"]


def get_entry_point() -> str:
    return "CollectorAgent"


class CollectorAgent(AutonomousAgent):
    """Scripted follower that records (rgb, mask, measurements) per tick."""

    def setup(self, config) -> None:
        config = config or {}
        self.out_dir = Path(config.get("out_dir", "data/train"))
        self.episode_name = config.get("episode", "episode_000")
        self.target_speed = float(config.get("target_speed", 6.0))
        self.noise_std = float(config.get("noise_std", 0.0))
        self.save_every = int(config.get("save_every", 1))
        #: pure-pursuit lookahead (m) on the DENSE plan; ~8 m keeps the
        #: expert in-lane through 90-degree grid corners (25 m on the sparse
        #: agent plan cut corners by up to ~17 m)
        self.pursuit_lookahead = float(config.get("pursuit_lookahead", 8.0))
        self._rng = np.random.default_rng(int(config.get("seed", 0)))
        self.waypointer = None
        self.idx = 0
        ep = self.out_dir / self.episode_name
        for sub in ("rgb", "mask", "measurements"):
            (ep / sub).mkdir(parents=True, exist_ok=True)
        self._ep_dir = ep

    def set_global_plan(self, global_plan_gps, global_plan_world_coord=None,
                        downsample: int = 50) -> None:
        """Keep the DENSE plan for the pursuit controller; the base class
        stores the reference-downsampled plan the label waypointer (and the
        eval-time agent) sees."""
        super().set_global_plan(global_plan_gps, global_plan_world_coord,
                                downsample)
        self._dense_plan = list(global_plan_gps)

    def run_step(self, input_data: dict, timestamp: float) -> VehicleControl:
        _, gps = input_data["GPS"]
        _, ego = input_data["EGO"]
        if self.waypointer is None:
            # pursuit on the dense (1 m) route: the checkpoint hovers
            # ~lookahead ahead of the ego, giving a proper pure-pursuit
            # target that keeps the expert in-lane
            self.waypointer = Waypointer(
                getattr(self, "_dense_plan", self._global_plan), gps,
                threshold_before=self.pursuit_lookahead,
                threshold_after=self.pursuit_lookahead)
            # a SECOND waypointer on the DOWNSAMPLED plan with the
            # ImageAgent's default thresholds produces the recorded command
            # LABEL — the exact command stream the trained agent will see at
            # eval time (same plan, same thresholds)
            self.label_waypointer = Waypointer(self._global_plan, gps)
        _, _, cmd = self.label_waypointer.tick(gps)
        self.waypointer.tick(gps)
        # pure pursuit on the node AFTER the consumed checkpoint (the
        # checkpoint sits at/behind the ego once consumed)
        nxt = min(self.waypointer.current_idx + 1,
                  len(self.waypointer.global_plan) - 1)
        wx, wy, _ = self.waypointer.global_plan[max(nxt, 0)]
        x, y = self.waypointer.latlon_to_xy(gps[0], gps[1])
        heading = input_data.get("COMPASS", (0, 0.0))[1]
        target = math.atan2(wy - y, wx - x)
        err = (target - heading + math.pi) % (2 * math.pi) - math.pi
        steer = float(np.clip(err, -1.0, 1.0))
        spd = ego["spd"]
        brake = self._brake_decision(x, y, heading, spd)
        throttle = 0.0 if brake > 0 else (0.7 if spd < self.target_speed
                                          else 0.0)
        # CIL-style noise injection: the noise perturbs the APPLIED control
        # (so the expert visits recovery states and demonstrates the
        # correction), but the RECORDED label stays the clean expert action —
        # recording the noised steer would teach the clone to wobble
        steer_applied = steer
        if self.noise_std > 0:
            steer_applied = float(np.clip(
                steer + self._rng.normal(0, self.noise_std), -1, 1))

        # record the tick (clean label)
        self._record(input_data, cmd, steer, throttle, brake, spd)
        return VehicleControl(steer=steer_applied, throttle=throttle,
                              brake=brake)

    def _brake_decision(self, x: float, y: float, heading: float,
                        spd: float) -> float:
        """Brake command for this tick; the base follower never brakes (the
        reference's scripted collectors are traffic-blind too), the
        privileged :class:`TrafficAwareExpert` overrides this."""
        return 0.0

    def _record(self, input_data, cmd, steer, throttle, brake, spd) -> None:
        """Write one (rgb, mask, measurements) tick in the dataset layout."""
        if self.idx % self.save_every == 0:
            name = f"{self.idx:06d}"
            _, rgb_bgr = input_data["Narrow_RGB"]
            cv2.imwrite(str(self._ep_dir / "rgb" / f"{name}.png"),
                        np.ascontiguousarray(rgb_bgr[..., :3]))
            seg = input_data.get("SEG")
            if seg is not None:
                cv2.imwrite(str(self._ep_dir / "mask" / f"{name}.png"), seg[1])
            cmd_value = int(cmd) if int(cmd) > 0 else int(RoadOption.LANEFOLLOW)
            meas = {"steer": float(steer), "brake": float(brake),
                    "throttle": float(throttle),
                    "speed": float(spd),
                    "target_speed": float(self.target_speed),
                    "command": cmd_value}
            (self._ep_dir / "measurements" / f"{name}.json").write_text(
                json.dumps(meas))
        self.idx += 1


class TrafficAwareExpert(CollectorAgent):
    """Privileged expert follower: pursuit steering + hazard braking.

    The round-3 verdict's root-cause finding: the plain scripted follower
    never brakes, so behavior-cloning data carries no stop-at-red or
    follow-vehicle braking signal, while the reference's datasets have real
    brake labels (pedal folding, reference model/data_loader.py:216-243).
    This expert reads privileged world state through the backend seam
    (``DrivingBackend.actor_states`` / ``traffic_light_states`` — the same
    privileged access the reference's collectors get via CarlaDataProvider)
    and brakes for

    * **lead vehicles / walkers** — constant time-headway rule: predicted
      actor positions over a short horizon are tested against the ego's
      forward corridor; anything inside ``d_min + headway*speed`` triggers a
      full brake;
    * **red lights** — stop before the enforcement line: the fake backend
      (and the CARLA bridge) flag a violation when the ego comes within 8 m
      of a red light (fake_carla.py _check_red_light), so the expert brakes
      to a halt just outside that radius and resumes on green.

    The recorded label keeps the full (steer, throttle, brake) triple; the
    dataset folds it into the reference's single pedal
    (``-brake if brake > 0.05 else throttle``, data/dataset.py).
    """

    #: tuning defaults, shared by the agent and the offline labeler:
    #: headway_s/d_min — constant time-headway envelope; corridor — ego
    #: half-width + NPC half-width + margin (walkers get +0.6); horizon_s —
    #: actor prediction horizon sampled every 0.5 s; light_radius — mirror
    #: of the violation check's 8 m; decel — planned service deceleration
    #: (sim max is 8 m/s^2, fake_carla._MAX_BRAKE; planning with less
    #: leaves margin)
    DEFAULTS = {"headway_s": 1.4, "d_min": 6.0, "corridor": 2.6,
                "horizon_s": 1.5, "light_radius": 8.0, "decel": 4.0}

    def setup(self, config) -> None:
        super().setup(config)
        config = config or {}
        #: privileged world handle (set by collect_episode / the DAgger tool)
        self.backend = config.get("backend")
        for k, v in self.DEFAULTS.items():
            setattr(self, k, float(config.get(k, v)))

    @classmethod
    def labeler(cls, backend, **overrides):
        """Standalone expert instance for OFFLINE brake labeling (the DAgger
        tool: the policy drives, this labels) — no dataset dirs, no
        waypointers, just ``_brake_decision`` bound to the backend with the
        same tuning the online expert uses."""
        obj = cls.__new__(cls)
        obj.backend = backend
        for k, v in cls.DEFAULTS.items():
            setattr(obj, k, float(overrides.get(k, v)))
        return obj

    def _brake_decision(self, x: float, y: float, heading: float,
                        spd: float) -> float:
        if self.backend is None:
            return 0.0
        cos_h, sin_h = math.cos(heading), math.sin(heading)

        # --- actors in the forward corridor (time-headway rule) -------------
        d_brake = self.d_min + self.headway_s * spd
        n_steps = max(int(round(self.horizon_s / 0.5)), 1)
        for actor in self.backend.actor_states():
            margin = self.corridor + (0.6 if actor.kind == "walker" else 0.0)
            for k in range(n_steps + 1):
                dt = 0.5 * k
                dx = actor.x + actor.vx * dt - x
                dy = actor.y + actor.vy * dt - y
                fwd = dx * cos_h + dy * sin_h
                lat = -dx * sin_h + dy * cos_h
                if -1.0 < fwd < d_brake and abs(lat) < margin:
                    return 1.0

        # --- red lights: stop before the enforcement radius ------------------
        # stop envelope: worst-case travel before standstill at the planned
        # service deceleration, plus one tick of reaction
        stop_d = spd * spd / (2.0 * self.decel) + spd * 0.1 + 1.0
        for light in self.backend.traffic_light_states():
            if not light.red:
                continue
            dx, dy = light.x - x, light.y - y
            fwd = dx * cos_h + dy * sin_h
            d = math.hypot(dx, dy)
            # the violation fires on |ego-light| crossing 8 m regardless of
            # approach direction, so brake whenever the RED light is ahead of
            # the rear axle and the stop envelope would cross the radius
            if fwd > 0.0 and self.light_radius < d <= (self.light_radius
                                                       + 1.0 + stop_d):
                return 1.0
        return 0.0


class RandomCollectorAgent(CollectorAgent):
    """Random-action collector (reference
    /root/reference/PMoE/autoagents/collector_agents/random_collector.py):
    uniformly random steer/throttle with a full-brake event at probability
    ``1/(num_steers*num_throts+1)`` (:147), each action held for
    ``num_repeat`` ticks (the reference's action-repeat counter :35), the
    first ``num_ignore_first`` frames unrecorded (:144), and a collision
    aborts the episode (:126 raises). Episodes land in the framework's
    ``rgb/mask/measurements`` layout rather than WoR lmdb (no lmdb in this
    environment; ``data/dataset.py`` consumes the layout directly)."""

    def setup(self, config) -> None:
        super().setup(config)
        config = config or {}
        self.num_repeat = int(config.get("num_repeat", 4))
        self.num_ignore_first = int(config.get("num_ignore_first", 10))
        self.max_steers = float(config.get("max_steers", 0.3))
        self.max_throts = float(config.get("max_throts", 0.75))
        num_steers = int(config.get("num_steers", 3))
        num_throts = int(config.get("num_throts", 3))
        self.brake_prob = 1.0 / (num_steers * num_throts + 1)
        self._frames = 0
        self._held: Optional[tuple] = None
        self._held_for = 0

    def run_step(self, input_data: dict, timestamp: float) -> VehicleControl:
        col = input_data.get("COLLISION", (0, False))[1]
        if col:
            raise CollectorCollision("Collector has collided")
        _, gps = input_data["GPS"]
        _, ego = input_data["EGO"]
        if self.waypointer is None:
            # label-only waypointer: eval-threshold commands (see
            # CollectorAgent.run_step — no pursuit controller here)
            self.waypointer = Waypointer(self._global_plan, gps)
        _, _, cmd = self.waypointer.tick(gps)

        if self._held is None or self._held_for >= self.num_repeat:
            if self._rng.random() < self.brake_prob:
                self._held = (0.0, 0.0, 1.0)
            else:
                self._held = (
                    float(self._rng.uniform(-self.max_steers, self.max_steers)),
                    float(self._rng.uniform(0.0, self.max_throts)), 0.0)
            self._held_for = 0
        steer, throttle, brake = self._held
        self._held_for += 1

        if self._frames >= self.num_ignore_first:
            self._record(input_data, cmd, steer, throttle, brake, ego["spd"])
        self._frames += 1
        return VehicleControl(steer=steer, throttle=throttle, brake=brake)


class QCollectorAgent(CollectorAgent):
    """Action-value (Q) collector — semantic rebuild of the reference's
    broken ``q_collector.py`` (it imports the never-vendored World-on-Rails
    ``rails.bellman``/``rails.models``, q_collector.py:17-18, so a faithful
    port is impossible; VERDICT r1 asked for a rebuild-or-document decision
    and this is the rebuild).

    Reference semantics kept (q_collector.py:202-280): Track.MAP (birdview
    label sensor), a discretized action table (num_steers x num_throts +
    brake), action VALUES computed by rolling an ego kinematics model
    against reward maps derived from the map label, action sampled from
    ``Categorical(Q / temperature)``, OU noise on steer, per-tick labels
    recorded for phase-1 training.

    Simplification, by necessity: WoR's ``BellmanUpdater`` runs deep value
    iteration over a learned EgoModel — that lives in the absent ``rails``
    package. Here the action table is scored by a ONE-STEP kinematic
    (bicycle-model) lookahead on the 12-channel birdview: route-channel hits
    reward progress, vehicle/pedestrian/red-light occupancy ahead penalizes
    motion and rewards the brake action. The recorded artifact is the same:
    a per-tick Q table over the action grid (``q_values`` in measurements,
    the lmdb action-value-label analog).
    """

    def setup(self, config) -> None:
        super().setup(config)
        self.track = Track.MAP          # birdview label sensor (q_collector:56)
        config = config or {}
        self.num_repeat = int(config.get("num_repeat", 4))
        self.temperature = float(config.get("temperature", 0.1))
        num_steers = int(config.get("num_steers", 9))
        num_throts = int(config.get("num_throts", 3))
        self.max_steers = float(config.get("max_steers", 1.0))
        self.max_throts = float(config.get("max_throts", 0.75))
        steers = np.linspace(-self.max_steers, self.max_steers, num_steers)
        throts = np.linspace(self.max_throts / num_throts, self.max_throts,
                             num_throts)
        # (A, 3) action table: steer x throttle grid + the brake action
        # (the BellmanUpdater._actions analog)
        grid = [(s, t, 0.0) for s in steers for t in throts] + [(0.0, 0.0, 1.0)]
        self.actions = np.asarray(grid, np.float32)
        from ..utils.noise import OrnsteinUhlenbeckActionNoise

        self.noiser = OrnsteinUhlenbeckActionNoise(
            mu=np.zeros(1), sigma=0.1 * np.ones(1), theta=0.1, dt=1.0 / 20.0)

    #: arc-projected scoring horizon (meters): the action's resulting heading
    #: is extended this far so steering separates route-keeping from veering
    LOOKAHEAD_M = 8.0

    def _action_values(self, birdview: np.ndarray, spd: float) -> np.ndarray:
        """Lookahead Q over the action table on the ego-centric map (ego at
        (0.5W, 0.75H) heading up, ``ppm`` px/m — sim/birdview.py): roll the
        bicycle model for one (repeated) action interval, then project a
        corridor of sample points along the resulting heading; route-channel
        hits reward progress, hazard occupancy anywhere on the corridor
        penalizes motion and rewards the brake action."""
        H, W, _ = birdview.shape
        ppm = 5.0 * (H / 192.0)
        ex, ey = 0.5 * W, 0.75 * H
        dt = (self.num_repeat + 1) / 20.0
        route = birdview[..., 2] > 0
        hazard = (birdview[..., 3] | birdview[..., 4] | birdview[..., 5]) > 0
        hazard[int(ey) - 2:int(ey) + 3, int(ex) - 2:int(ex) + 3] = False  # ego

        def hit(mask, fwd_m, lat_m, r):
            px = min(max(int(round(ex + lat_m * ppm)), 0), W - 1)
            py = min(max(int(round(ey - fwd_m * ppm)), 0), H - 1)
            return bool(mask[max(py - r, 0):py + r + 1,
                             max(px - r, 0):px + r + 1].any())

        q = np.zeros(len(self.actions), np.float32)
        for i, (steer, throt, brake) in enumerate(self.actions):
            accel = 4.0 * throt - 8.0 * brake - 0.1 * spd
            v1 = max(0.0, spd + accel * dt)
            d = 0.5 * (spd + v1) * dt
            dpsi = (0.5 * (spd + v1) / 2.9) * math.tan(steer * 0.5) * dt
            # scoring point: one interval of motion + LOOKAHEAD along the
            # resulting heading (ego frame, heading up)
            L = self.LOOKAHEAD_M
            fwd_s = d * math.cos(0.5 * dpsi) + L * math.cos(dpsi)
            lat_s = d * math.sin(0.5 * dpsi) + L * math.sin(dpsi)
            on_route = float(hit(route, fwd_s, lat_s, 2))
            blocked = any(
                hit(hazard, u * fwd_s, u * lat_s, 3)
                for u in (0.25, 0.5, 0.75, 1.0))
            # small smoothness prior breaks ties among on-route steers
            q[i] = d * 0.2 + (d + 0.3) * on_route - 5.0 * float(blocked) \
                - 0.05 * abs(steer)
            if brake > 0:
                # braking is right when something occupies the path ahead
                ahead = hazard[max(int(ey - 12 * ppm / 5), 0):int(ey),
                               int(ex - 4):int(ex + 5)].any()
                q[i] = 2.0 if ahead else -0.5
        return q

    def run_step(self, input_data: dict, timestamp: float) -> VehicleControl:
        if input_data.get("COLLISION", (0, False))[1]:
            raise CollectorCollision("Q-collector has collided")
        _, gps = input_data["GPS"]
        _, ego = input_data["EGO"]
        _, birdview = input_data["MAP"]
        if self.waypointer is None:
            # label-only waypointer: eval-threshold commands
            self.waypointer = Waypointer(self._global_plan, gps)
        _, _, cmd = self.waypointer.tick(gps)
        spd = float(ego["spd"])
        q = self._action_values(birdview, spd)
        # Categorical(logits = Q / temperature) sampling (q_collector.py:264)
        logits = q / self.temperature
        p = np.exp(logits - logits.max())
        p /= p.sum()
        a = int(self._rng.choice(len(q), p=p))
        steer, throttle, brake = map(float, self.actions[a])
        steer = float(np.clip(steer + float(self.noiser()[0]), -1, 1))
        self._last_q = q
        self._record(input_data, cmd, steer, throttle, brake, spd)
        return VehicleControl(steer=steer, throttle=throttle, brake=brake)

    def _record(self, input_data, cmd, steer, throttle, brake, spd) -> None:
        """Base recording + the per-tick action-value table (phase-1 label)."""
        write = self.idx % self.save_every == 0
        name = f"{self.idx:06d}"
        super()._record(input_data, cmd, steer, throttle, brake, spd)
        if write and getattr(self, "_last_q", None) is not None:
            path = self._ep_dir / "measurements" / f"{name}.json"
            meas = json.loads(path.read_text())
            meas["q_values"] = [round(float(v), 4) for v in self._last_q]
            meas["actions"] = self.actions.round(4).tolist()
            path.write_text(json.dumps(meas))


class CollectorCollision(RuntimeError):
    """The random collector hit something; the episode is aborted
    (reference random_collector.py:126)."""


def collect_episode(backend, out_dir: str, episode: str, start_idx: int = 0,
                    target_idx: int = 5, weather: int = 1,
                    max_ticks: int = 500, noise_std: float = 0.0,
                    seed: int = 0, agent_cls=None, n_vehicles: int = 0,
                    n_pedestrians: int = 0) -> int:
    """Run one collection episode on a backend with seg rendering; returns the
    number of recorded frames. ``agent_cls`` selects the policy
    (CollectorAgent expert follower by default, TrafficAwareExpert for
    traffic-laden collection, RandomCollectorAgent for the reference's
    phase-0 random data). ``n_vehicles``/``n_pedestrians`` spawn background
    traffic (the NoCrash regular/dense tables)."""
    from ..eval.nocrash import build_input_data

    route = backend.trace_route(start_idx, target_idx)
    frame = backend.reset(route, weather=weather, seed=seed,
                          n_vehicles=n_vehicles, n_pedestrians=n_pedestrians)
    agent = (agent_cls or CollectorAgent)(
        {"out_dir": out_dir, "episode": episode,
         "noise_std": noise_std, "seed": seed, "backend": backend})
    agent.set_global_plan(route.gps_plan())
    needs_map = getattr(agent, "track", None) == Track.MAP
    if needs_map:
        from ..sim.birdview import render_birdview
    goal = route.positions[-1]
    for _ in range(max_ticks):
        data = build_input_data(frame)
        data["COMPASS"] = (frame.frame, frame.compass)
        if frame.seg is not None:
            data["SEG"] = (frame.frame, frame.seg)
        if needs_map:
            data["MAP"] = (frame.frame, render_birdview(backend, route))
        try:
            control = agent.run_step(data, frame.timestamp)
        except CollectorCollision:
            break
        frame = backend.tick(control)
        if frame.collision is not None:
            break
        ego = backend.ego_state()
        if float(np.hypot(ego.x - goal[0], ego.y - goal[1])) < 5.0:
            break          # goal reached: past here the scripted pursuit has
                           # no target and would record garbage labels
    n = agent.idx
    agent.destroy()
    return n

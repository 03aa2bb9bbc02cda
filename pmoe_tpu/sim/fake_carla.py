"""Fake CARLA backend: scripted kinematics + synthetic camera.

Fills the reference's biggest testability gap (SURVEY §4: "no fake/mock CARLA
backend anywhere"): a deterministic 20 Hz world with

* a grid-road town (spawn points at block corners, routes traced over the road
  graph with LANEFOLLOW/LEFT/RIGHT/STRAIGHT commands like CARLA's
  GlobalRoutePlanner output),
* a kinematic-bicycle ego (wheelbase 2.9 m, throttle/brake longitudinal model),
* NPC vehicles and pedestrians moving on scripted paths with radius collision
  detection (collision sensor semantics of sensor_interface.py:157-200),
* traffic lights with phase cycling + red-light-crossing detection
  (atomic_criteria.py RunningRedLightTest:1690's functional contract),
* a cheap projected-road RGB camera (800x600 by default) so the full
  vision->control agent loop runs.

Everything is deterministic given the seed.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .interface import (SIM_DT, ActorState, CollisionEvent, DrivingBackend,
                        EgoState, RoadOption, Route, SensorFrame,
                        TrafficLightState, VehicleControl, xy_to_latlon)

__all__ = ["FakeCarlaBackend"]

_BLOCK = 100.0          # meters between intersections
_LANE_OFFSET = 2.0      # right-hand lane offset from road centerline
_WHEELBASE = 2.9
_MAX_ACCEL = 3.5        # m/s^2 at full throttle
_MAX_BRAKE = 8.0
_DRAG = 0.3             # speed damping
_COLLISION_RADIUS = 2.0
_LIGHT_PERIOD = 10.0    # seconds green, then red
#: grid size (intersections per side) per town — the fake analog of the
#: reference's 8-town map set (PMoE/assets/maps/Town01..Town10HD); towns vary
#: by extent so routes and trigger annotations are town-specific
_TOWN_GRID = {"Town01": 4, "Town02": 3, "Town03": 5, "Town04": 6,
              "Town05": 5, "Town06": 6, "Town07": 3, "Town10HD": 4,
              "FullTown01-v1": 4}


class _WeatherSim:
    """srunner WeatherBehavior analog (scenariomanager/weather_sim.py): the
    sun moves with game time, so illumination evolves during an episode
    instead of staying a static preset."""

    #: preset -> (sun altitude deg, precipitation 0..1)
    PRESETS = {1: (75.0, 0.0), 3: (75.0, 0.5), 6: (75.0, 0.9),
               8: (15.0, 0.0), 10: (15.0, 0.5), 14: (15.0, 0.3)}
    SUN_DEG_PER_SEC = 0.08      # ~matches srunner's elapsed-time update

    def __init__(self, preset: int = 1):
        self.altitude0, self.precipitation = self.PRESETS.get(
            preset, (75.0, 0.0))

    def state(self, t: float) -> dict:
        altitude = max(self.altitude0 - self.SUN_DEG_PER_SEC * t, -5.0)
        return {"sun_altitude": altitude,
                "precipitation": self.precipitation}

    def brightness(self, t: float) -> float:
        """0..1 illumination factor from sun altitude + rain."""
        alt = self.state(t)["sun_altitude"]
        sun = float(np.clip(alt / 75.0, 0.15, 1.0))
        return sun * (1.0 - 0.4 * self.precipitation)


class _TrafficLight:
    def __init__(self, x: float, y: float, phase_offset: float):
        self.x, self.y = x, y
        self.phase_offset = phase_offset
        self.forced_green_until = -np.inf   # TrafficLightManipulator support

    def is_red(self, t: float) -> bool:
        if t < self.forced_green_until:
            return False
        return ((t + self.phase_offset) % (2 * _LIGHT_PERIOD)) >= _LIGHT_PERIOD


class _NPC:
    """A point actor oscillating along a segment.

    ``pause`` shifts the actor's effective clock: while yielding to the ego
    (CARLA's TrafficManager collision detection / WalkerAIController obstacle
    avoidance analog — server NPCs do not drive into a stopped ego), the
    backend freezes the actor by accumulating pause time instead of mutating
    the closed-form path."""

    def __init__(self, kind: str, a, b, speed: float, phase: float):
        self.kind = kind
        self.a, self.b = np.asarray(a, float), np.asarray(b, float)
        self.speed = speed
        self.phase = phase
        self.pause = 0.0            # accumulated yield time (s)
        self.paused_for = 0.0       # current consecutive yield streak (s)

    def position(self, t: float) -> np.ndarray:
        seg = self.b - self.a
        length = float(np.linalg.norm(seg)) or 1.0
        # triangle wave in [0, 1] on the pause-shifted clock
        u = (((t - self.pause) * self.speed / length) + self.phase) % 2.0
        u = u if u <= 1.0 else 2.0 - u
        return self.a + u * seg

    def retarget(self, t: float, b=None, speed: Optional[float] = None) -> None:
        """Re-anchor the path at the current position, phase-continuously:
        after a speed or destination change the NPC continues from where it is
        instead of teleporting along the triangle wave."""
        pos = self.position(t)
        seg = self.b - self.a
        self.a = pos
        self.b = np.asarray(b, float) if b is not None else pos + seg
        if speed is not None:
            self.speed = speed
        length = float(np.linalg.norm(self.b - self.a)) or 1.0
        self.phase = (-(t - self.pause) * self.speed / length) % 2.0


class FakeCarlaBackend(DrivingBackend):
    def __init__(self, town: str = "Town01", img_width: int = 800,
                 img_height: int = 600, render: bool = True,
                 render_seg: bool = False):
        self.W, self.H = int(img_width), int(img_height)
        self.render = render
        self.render_seg = render_seg
        self.load_world(town)
        self._rng = np.random.default_rng(0)
        self._route: Optional[Route] = None
        self._npcs: List[_NPC] = []
        self.frame = 0
        self.t = 0.0
        self._ego = EgoState()
        self._weather = 1
        self._weather_sim = _WeatherSim(1)
        self._ran_red = False
        self._was_before_light: dict = {}

    # -- world ------------------------------------------------------------------
    def load_world(self, town: str) -> None:
        """Switch the map (carla.Client.load_world analog): rebuild the
        town-dependent grid state. The leaderboard evaluator calls this when
        a route's town differs from the current one
        (reference leaderboard_evaluator.py:173-201 _load_and_wait_for_world)."""
        self.town = town
        n = _TOWN_GRID.get(town, 4)
        self._grid_n = n
        # spawn points: lane positions near each intersection
        self._spawn: List[Tuple[float, float]] = []
        for i in range(n):
            for j in range(n):
                self._spawn.append((i * _BLOCK + 10.0, j * _BLOCK + _LANE_OFFSET))
        self._lights = [
            _TrafficLight(i * _BLOCK, j * _BLOCK, phase_offset=7.0 * ((i + j) % 3))
            for i in range(n) for j in range(n)
        ]
        # stop signs at a subset of intersections (CARLA towns mix signs and
        # lights), offset toward the lane corner so the 10 m affected zone
        # covers vehicles on the right-hand lanes; violation = leaving the
        # zone without the speed ever dropping below the stop threshold
        self._stop_signs = [np.array([i * _BLOCK + 6.0, j * _BLOCK + 6.0])
                            for i in range(n) for j in range(n)
                            if (i + j) % 3 == 1]
        self._stop_state = {}
        self._ran_stop = False

    def spawn_points(self) -> Sequence[Tuple[float, float]]:
        return list(self._spawn)

    def trace_route(self, start_idx: int, target_idx: int) -> Route:
        """Manhattan route over the grid roads, 1 m hops, with turn commands at
        the corner (mirrors GlobalRoutePlanner.trace_route's dense output)."""
        sx, sy = self._spawn[start_idx % len(self._spawn)]
        tx, ty = self._spawn[target_idx % len(self._spawn)]
        pts: List[Tuple[float, float]] = []
        opts: List[RoadOption] = []

        def walk(from_pt, to_pt, cmd_at_end, cmd_at_start=None):
            """CARLA's GlobalRoutePlanner labels the whole junction arc with
            the turn command, so the turn option covers BOTH the last 10 m of
            the approach leg (cmd_at_end) and the first 10 m of the exit leg
            (cmd_at_start) — the command window spans the actual steering."""
            fx, fy = from_pt
            gx, gy = to_pt
            dist = math.hypot(gx - fx, gy - fy)
            steps = max(int(dist), 1)
            for s in range(steps):
                u = (s + 1) / steps
                pts.append((fx + u * (gx - fx), fy + u * (gy - fy)))
                if cmd_at_end and s >= steps - 10:
                    opts.append(cmd_at_end)
                elif cmd_at_start and s < 10:
                    opts.append(cmd_at_start)
                else:
                    opts.append(RoadOption.LANEFOLLOW)

        corner = (tx, sy)
        turn: Optional[RoadOption] = None
        if abs(tx - sx) > 1.0 and abs(ty - sy) > 1.0:
            # pick LEFT/RIGHT by cross product of the two legs
            leg1 = (tx - sx, 0.0)
            leg2 = (0.0, ty - sy)
            cross = leg1[0] * leg2[1] - leg1[1] * leg2[0]
            turn = RoadOption.LEFT if cross > 0 else RoadOption.RIGHT
        pts.append((sx, sy))
        opts.append(RoadOption.LANEFOLLOW)
        if abs(tx - sx) > 1.0:
            walk((sx, sy), corner, turn)
        if abs(ty - sy) > 1.0:
            walk(corner, (tx, ty), None, cmd_at_start=turn)
        if len(pts) < 2:
            pts.append((sx + 1.0, sy))
            opts.append(RoadOption.LANEFOLLOW)
        return Route(positions=np.asarray(pts, float), options=opts)

    # -- episode ----------------------------------------------------------------
    def reset(self, route: Route, weather: int = 1, n_vehicles: int = 0,
              n_pedestrians: int = 0, seed: int = 0) -> SensorFrame:
        self._route = route
        self._weather = weather
        self._weather_sim = _WeatherSim(weather)
        self._rng = np.random.default_rng(seed)
        self.frame = 0
        self.t = 0.0
        self._ran_red = False
        self._was_before_light = {}
        self._stop_state = {}
        self._ran_stop = False
        x0, y0 = route.positions[0]
        x1, y1 = route.positions[min(5, len(route.positions) - 1)]
        self._ego = EgoState(x=float(x0), y=float(y0),
                             yaw=math.atan2(y1 - y0, x1 - x0), speed=0.0)
        self._npcs = []
        span = self._grid_n * _BLOCK
        for _ in range(n_vehicles):
            a = self._rng.uniform(0, span, 2)
            axis = self._rng.integers(0, 2)
            b = a.copy()
            b[axis] += self._rng.uniform(30, 120)
            self._npcs.append(_NPC("vehicle", a, b,
                                   speed=self._rng.uniform(3, 8),
                                   phase=self._rng.uniform(0, 2)))
        for _ in range(n_pedestrians):
            a = self._rng.uniform(0, span, 2)
            b = a + self._rng.uniform(-15, 15, 2)
            self._npcs.append(_NPC("walker", a, b,
                                   speed=self._rng.uniform(0.5, 2),
                                   phase=self._rng.uniform(0, 2)))
        return self._sensor_frame(collision=None)

    def inject_control_noise(self, duration: float = 1.5,
                             magnitude: float = 0.3) -> None:
        """ControlLoss scenario hook (srunner scenarios/control_loss.py):
        steering noise is added to the ego's controls for ``duration`` s."""
        self._noise_until = self.t + duration
        self._noise_mag = magnitude

    # -- dynamics ----------------------------------------------------------------
    def tick(self, control: VehicleControl) -> SensorFrame:
        e = self._ego
        accel = (_MAX_ACCEL * float(np.clip(control.throttle, 0, 1))
                 - _MAX_BRAKE * float(np.clip(control.brake, 0, 1))
                 - _DRAG * e.speed)
        e.speed = max(0.0, e.speed + accel * SIM_DT)
        steer_in = control.steer
        if self.t < getattr(self, "_noise_until", 0.0):
            steer_in += float(self._rng.normal(0.0, self._noise_mag))
        steer = float(np.clip(steer_in, -1, 1)) * 0.5   # max wheel angle rad
        e.yaw += (e.speed / _WHEELBASE) * math.tan(steer) * SIM_DT
        e.x += e.speed * math.cos(e.yaw) * SIM_DT
        e.y += e.speed * math.sin(e.yaw) * SIM_DT
        self.frame += 1
        self.t += SIM_DT

        self._advance_npcs()
        collision = self._check_collision()
        self._ran_red = self._check_red_light()
        self._ran_stop = self._check_stop_signs()
        return self._sensor_frame(collision)

    #: NPC yield radii (m): server traffic does not drive/walk into the ego
    #: (CARLA TrafficManager collision detection for vehicles,
    #: WalkerAIController obstacle avoidance for pedestrians); the collision
    #: radius itself is 2.0, so yields trigger with ~1 m of margin
    _YIELD_RADIUS = {"vehicle": 3.5, "walker": 2.8}
    #: after this long stuck yielding, an NPC reroutes away from the ego (the
    #: TrafficManager's rerouting / a walker picking a new nav target)
    _YIELD_REROUTE_S = 5.0

    def _npc_positions(self, t: float) -> np.ndarray:
        """(N, 2) positions of every NPC at time ``t`` in ONE vectorized
        pass — bitwise-identical math to ``_NPC.position`` (same elementwise
        expression order), but a dense-traffic tick pays ~5 numpy calls
        instead of ~10 per NPC (the 300-NPC Dense cell was Python-loop
        bound: 16.9 -> ~10 ms/tick with this + the vectorized consumers)."""
        n = len(self._npcs)
        if n == 0:
            return np.zeros((0, 2))
        A = np.array([npc.a for npc in self._npcs])
        B = np.array([npc.b for npc in self._npcs])
        speed = np.array([npc.speed for npc in self._npcs])
        phase = np.array([npc.phase for npc in self._npcs])
        pause = np.array([npc.pause for npc in self._npcs])
        seg = B - A
        length = np.sqrt((seg * seg).sum(-1))
        length[length == 0.0] = 1.0
        u = (((t - pause) * speed / length) + phase) % 2.0
        u = np.where(u <= 1.0, u, 2.0 - u)
        return A + u[:, None] * seg

    def _advance_npcs(self) -> None:
        """Per-tick NPC yield pass: an actor whose next closed-form position
        would close in on the ego inside its yield radius holds position
        (pause-clock shift) instead; one stuck longer than
        ``_YIELD_REROUTE_S`` reroutes away. Ego-caused collisions (driving
        into an actor) still happen exactly as before — this only removes
        the fake-world artifact of blind oscillators ramming a stopped ego,
        which CARLA's server-side traffic never does."""
        if not self._npcs:
            return
        ego_p = np.array([self._ego.x, self._ego.y])
        held_all = self._npc_positions(self.t - SIM_DT)
        nxt_all = self._npc_positions(self.t)
        d_nxt = np.sqrt(((nxt_all - ego_p) ** 2).sum(-1))
        d_held = np.sqrt(((held_all - ego_p) ** 2).sum(-1))
        radius = np.array([self._YIELD_RADIUS.get(npc.kind, 2.8)
                           for npc in self._npcs])
        yielding = (d_nxt < radius) & (d_nxt <= d_held)
        for i in np.flatnonzero(yielding):
            npc = self._npcs[i]
            held = held_all[i]
            npc.pause += SIM_DT
            npc.paused_for += SIM_DT
            if npc.paused_for >= self._YIELD_REROUTE_S:
                away = held - ego_p
                n = float(np.linalg.norm(away)) or 1.0
                seg_len = float(np.linalg.norm(npc.b - npc.a)) or 30.0
                npc.retarget(self.t, b=held + away / n * seg_len)
                npc.paused_for = 0.0
        for i in np.flatnonzero(~yielding):
            self._npcs[i].paused_for = 0.0

    def _check_stop_signs(self) -> bool:
        """srunner RunningStopTest contract (atomic_criteria.py:1877): entering
        a stop-sign's affected zone and leaving it without ever coming to a
        stop is one infraction, flagged on the exit tick."""
        p = np.array([self._ego.x, self._ego.y])
        violated = False
        for si, sign in enumerate(self._stop_signs):
            inside = float(np.linalg.norm(sign - p)) < 10.0
            state = self._stop_state.get(si)
            if inside:
                min_spd = self._ego.speed if state is None else min(
                    state, self._ego.speed)
                self._stop_state[si] = min_spd
            elif state is not None:
                if state > 0.3:             # never stopped inside the zone
                    violated = True
                del self._stop_state[si]
        return violated

    def ran_stop_sign(self) -> bool:
        return self._ran_stop

    def off_lane(self) -> bool:
        """True when the ego is outside every road corridor (roads run along
        the grid lines with 3.5 m half-width)."""
        span = self._grid_n * _BLOCK

        def dist_to_grid_line(c):
            m = c % _BLOCK
            return min(m, _BLOCK - m)

        if not (-3.5 <= self._ego.x <= span + 3.5
                and -3.5 <= self._ego.y <= span + 3.5):
            return True
        return (dist_to_grid_line(self._ego.x) > 3.5
                and dist_to_grid_line(self._ego.y) > 3.5)

    def on_sidewalk(self) -> bool:
        """True when the ego is on the sidewalk strip: the 2.5 m band just
        outside the 3.5 m road corridor (OnSidewalkTest's LaneType.Sidewalk)."""
        span = self._grid_n * _BLOCK
        if not (-6.0 <= self._ego.x <= span + 6.0
                and -6.0 <= self._ego.y <= span + 6.0):
            return False                        # beyond the sidewalk: off-road

        def dist_to_grid_line(c):
            m = c % _BLOCK
            return min(m, _BLOCK - m)

        d = min(dist_to_grid_line(self._ego.x), dist_to_grid_line(self._ego.y))
        return 3.5 < d <= 6.0

    def off_road(self) -> bool:
        """True when the ego is beyond even the sidewalk band — no waypoint of
        any lane type projects to it (OffRoadTest's map.get_waypoint=None)."""
        span = self._grid_n * _BLOCK

        def dist_to_grid_line(c):
            m = c % _BLOCK
            return min(m, _BLOCK - m)

        if not (-6.0 <= self._ego.x <= span + 6.0
                and -6.0 <= self._ego.y <= span + 6.0):
            return True
        return (dist_to_grid_line(self._ego.x) > 6.0
                and dist_to_grid_line(self._ego.y) > 6.0)

    def road_id(self) -> int:
        """OpenDRIVE-style road id of the nearest grid road: vertical roads
        (x = k*_BLOCK) map to 2k, horizontal roads (y = j*_BLOCK) to 2j+1
        (EndofRoadTest reads waypoint.road_id transitions)."""
        kx = round(self._ego.x / _BLOCK)
        jy = round(self._ego.y / _BLOCK)
        dx = abs(self._ego.x - kx * _BLOCK)
        dy = abs(self._ego.y - jy * _BLOCK)
        return int(2 * kx) if dx <= dy else int(2 * jy + 1)

    def lane_direction(self) -> Tuple[float, float]:
        """Unit forward vector of the right-hand-traffic lane under the ego
        (WrongLaneTest compares it against the ego heading). Horizontal road:
        the +2 m lane (y above centerline) heads +x; the vertical analog by
        90-degree rotation: the -2 m lane (x below centerline) heads +y."""
        kx = round(self._ego.x / _BLOCK)
        jy = round(self._ego.y / _BLOCK)
        dx = abs(self._ego.x - kx * _BLOCK)
        dy = abs(self._ego.y - jy * _BLOCK)
        if dy <= dx:                           # horizontal road is closer
            return (1.0, 0.0) if self._ego.y >= jy * _BLOCK else (-1.0, 0.0)
        return (0.0, 1.0) if self._ego.x <= kx * _BLOCK else (0.0, -1.0)

    def _check_collision(self) -> Optional[CollisionEvent]:
        p = np.array([self._ego.x, self._ego.y])
        if self._npcs:
            d = np.sqrt(((self._npc_positions(self.t) - p) ** 2).sum(-1))
            hit = np.flatnonzero(d < _COLLISION_RADIUS)
            if hit.size:
                return CollisionEvent(self.frame, self._npcs[hit[0]].kind,
                                      intensity=max(self._ego.speed, 0.5))
        # leaving the road entirely = hitting something static
        span = self._grid_n * _BLOCK
        if not (-20 <= self._ego.x <= span + 20 and
                -20 <= self._ego.y <= span + 20):
            return CollisionEvent(self.frame, "static")
        return None

    def _check_red_light(self) -> bool:
        """Crossing within 8 m of a red light while moving toward it."""
        p = np.array([self._ego.x, self._ego.y])
        for li, light in enumerate(self._lights):
            d = math.hypot(light.x - p[0], light.y - p[1])
            before = d > 8.0
            was_before = self._was_before_light.get(li, True)
            self._was_before_light[li] = before
            if was_before and not before and light.is_red(self.t):
                # diagnostic detail for the lights-ran analysis (VERDICT r4
                # weak #6): which light, how fast the ego crossed, when
                self._last_red_event = {
                    "light": li, "light_xy": (light.x, light.y),
                    "ego_xy": (float(p[0]), float(p[1])),
                    "speed": float(self._ego.speed), "t": float(self.t)}
                return True
        return False

    def last_red_light_event(self) -> Optional[dict]:
        """Detail record of the most recent red-light infraction."""
        return getattr(self, "_last_red_event", None)

    def ran_red_light(self) -> bool:
        return self._ran_red

    def ego_state(self) -> EgoState:
        return EgoState(self._ego.x, self._ego.y, self._ego.yaw, self._ego.speed)

    def to_opendrive(self) -> str:
        """Minimal OpenDRIVE (.xodr) document of the grid town — one straight
        road with two 3.5 m driving lanes per grid line, plus the geoReference
        header the reference's GPS conversion reads
        (route_manipulation.py:21-44). Backs the ``sensor.opendrive_map``
        pseudo-sensor (reference sensor_interface.py:322-324)."""
        if getattr(self, "_xodr", None) is not None:
            return self._xodr
        span = self._grid_n * _BLOCK
        roads = []
        rid = 0
        for i in range(self._grid_n + 1):
            c = i * _BLOCK
            for name, x, y, hdg in ((f"h{i}", 0.0, c, 0.0),
                                    (f"v{i}", c, 0.0, 1.5707963267948966)):
                rid += 1
                roads.append(
                    f'  <road name="{name}" length="{span:.1f}" id="{rid}" '
                    'junction="-1">\n'
                    '    <planView>\n'
                    f'      <geometry s="0.0" x="{x:.1f}" y="{y:.1f}" '
                    f'hdg="{hdg}" length="{span:.1f}"><line/></geometry>\n'
                    '    </planView>\n'
                    '    <lanes><laneSection s="0.0">\n'
                    '      <left><lane id="1" type="driving" level="false">'
                    '<width sOffset="0.0" a="3.5" b="0" c="0" d="0"/>'
                    '</lane></left>\n'
                    '      <center><lane id="0" type="none" level="false"/>'
                    '</center>\n'
                    '      <right><lane id="-1" type="driving" level="false">'
                    '<width sOffset="0.0" a="3.5" b="0" c="0" d="0"/>'
                    '</lane></right>\n'
                    '    </laneSection></lanes>\n'
                    '  </road>')
        geo = ("+proj=tmerc +lat_0=0 +lon_0=0 +k=1 +x_0=0 +y_0=0 "
               "+datum=WGS84 +units=m +no_defs")
        self._xodr = (
            '<?xml version="1.0" standalone="yes"?>\n<OpenDRIVE>\n'
            f'  <header revMajor="1" revMinor="4" name="{self.town}" '
            'version="1.0" north="{0:.1f}" south="0.0" east="{0:.1f}" '
            'west="0.0">\n'.format(span)
            + f'    <geoReference><![CDATA[{geo}]]></geoReference>\n'
            '  </header>\n' + "\n".join(roads) + "\n</OpenDRIVE>\n")
        return self._xodr

    # -- sensors -----------------------------------------------------------------
    def _sensor_frame(self, collision) -> SensorFrame:
        lat, lon = xy_to_latlon(self._ego.x, self._ego.y)
        rgb, seg = (self._render_camera() if self.render else (None, None))
        return SensorFrame(
            frame=self.frame,
            timestamp=self.t,
            rgb=rgb,
            speed=self._ego.speed,
            gnss=(lat, lon, 0.0),
            collision=collision,
            compass=self._ego.yaw,
            seg=seg,
        )

    def render_stitch(self, yaw_offsets=(-1.0472, 0.0, 1.0472)):
        """3-camera panorama (reference StitchCameraReader,
        sensor_interface.py:53-154): one render per yaw offset, hstacked."""
        views = [self._render_camera(yaw_offset=y)[0] for y in yaw_offsets]
        return np.concatenate(views, axis=1)

    def _render_camera(self, yaw_offset: float = 0.0):
        """Cheap ground-plane projection: sky / grass / road scene.

        Fully vectorized; gives the vision stack real structure (horizon, road
        ahead curving with route geometry) at ~0 cost. With ``render_seg`` a
        matching CARLA-class segmentation mask is produced covering 12 of the
        23 classes (Sky=13, Terrain=22, Road=7, RoadLine=6, SideWalk=8,
        Building=1, Pedestrian=4, Pole=5, TrafficSign=12, TrafficLight=18,
        Static=19, Vehicles=10) so the fake backend can generate stage-0/1
        training data with class diversity.
        """
        W, H = self.W, self.H
        img = np.empty((H, W, 3), np.uint8)
        horizon = H // 2
        # sky and grass
        img[:horizon] = (135, 180, 230) if self._weather in (1, 3, 6) else (210, 140, 90)
        img[horizon:] = (60, 120, 60)
        seg = None
        if self.render_seg:
            seg = np.empty((H, W), np.uint8)
            seg[:horizon] = 13      # Sky
            seg[horizon:] = 22      # Terrain

        # project road points ahead of ego onto the image
        e = self._ego
        cam_yaw = e.yaw + yaw_offset
        cos_y, sin_y = math.cos(-cam_yaw), math.sin(-cam_yaw)
        f = 0.9 * W                                     # focal (pixels)

        def project(world_xy):
            """world (N,2) -> (xf forward, yl left) in the camera frame."""
            rel = np.atleast_2d(world_xy) - np.array([e.x, e.y])
            return (rel[:, 0] * cos_y - rel[:, 1] * sin_y,
                    rel[:, 0] * sin_y + rel[:, 1] * cos_y)

        pts = self._route.positions if self._route is not None else np.zeros((1, 2))
        xf, yl = project(pts)
        ahead = (xf > 1.0) & (xf < 80.0)
        if ahead.any():
            xfa, yla = xf[ahead], yl[ahead]
            idxs = np.nonzero(ahead)[0]
            u = (W / 2 + f * yla / xfa).astype(int)
            v = (horizon + (0.35 * H) / xfa * 12.0).astype(int)  # cam height ~1.3m
            half_w = np.maximum((f * 3.5 / xfa).astype(int), 1)  # road half-width
            side_w = np.maximum((f * 1.5 / xfa).astype(int), 1)  # sidewalk width
            line_w = np.maximum((f * 0.15 / xfa).astype(int), 1)  # lane marking
            v = np.clip(v, horizon, H - 1)
            for ui, vi, hw, sw, lw, ri in zip(u, v, half_w, side_w, line_w,
                                              idxs):
                # sidewalk strips flanking the asphalt (SideWalk=8)
                slo = max(ui - hw - sw, 0)
                shi = min(ui + hw + sw, W)
                if slo < shi:
                    img[vi, slo:shi] = (160, 160, 160)
                    if seg is not None:
                        seg[vi, slo:shi] = 8
                lo, hi = max(ui - hw, 0), min(ui + hw, W)
                if lo < hi:
                    img[vi, lo:hi] = (90, 90, 95)
                    if seg is not None:
                        seg[vi, lo:hi] = 7      # Road
                # dashed center line (RoadLine=6): 2 m dashes on 1 m points
                if (ri % 4) < 2:
                    llo = max(ui - lw, 0)
                    lhi = min(ui + lw, W)
                    if llo < lhi:
                        img[vi, llo:lhi] = (230, 230, 210)
                        if seg is not None:
                            seg[vi, llo:lhi] = 6

        def draw_box(xfi, yli, width_m, height_m, color, seg_cls,
                     base_height_m=0.0):
            """Billboard at camera-frame (xfi, yli): width/height in meters,
            base elevated by base_height_m (traffic-light heads)."""
            if not (1.0 < xfi < 80.0):
                return
            u_c = W / 2 + f * yli / xfi
            v_base = horizon + (0.35 * H) / xfi * 12.0 \
                - (f * base_height_m) / xfi
            h_px = max(int(f * height_m / xfi), 1)
            w_px = max(int(f * width_m / xfi), 1)
            u0, u1 = int(u_c - w_px / 2), int(u_c + w_px / 2) + 1
            v1 = int(np.clip(v_base, 0, H - 1)) + 1
            v0 = max(v1 - h_px, 0)
            u0, u1 = max(u0, 0), min(u1, W)
            if u0 < u1 and v0 < v1:
                img[v0:v1, u0:u1] = color
                if seg is not None:
                    seg[v0:v1, u0:u1] = seg_cls

        # buildings, NPC actors, signs, and traffic lights, far-to-near so
        # near occludes far (CARLA classes: 1 Building, 4 Pedestrian,
        # 10 Vehicles, 12 TrafficSign, 18 TrafficLight, 19 Static)
        # one batched projection for every billboard point (identical float
        # math to the former per-point project() calls — the same
        # elementwise expressions, vectorized)
        points: List[Tuple[float, float]] = []
        specs: List[Tuple[float, float, tuple, int, float]] = []
        for bi in range(self._grid_n - 1):
            for bj in range(self._grid_n - 1):
                points.append(((bi + 0.5) * _BLOCK, (bj + 0.5) * _BLOCK))
                specs.append((34.0, 11.0, (140, 115, 100), 1, 0.0))
        npc_pos = self._npc_positions(self.t)
        for ni, npc in enumerate(self._npcs):
            p = npc_pos[ni]
            points.append((p[0], p[1]))
            if npc.kind == "vehicle":
                specs.append((1.9, 1.6, (30, 30, 160), 10, 0.0))
            elif npc.kind == "walker":
                specs.append((0.5, 1.8, (210, 90, 60), 4, 0.0))
            else:                        # scenario props / debris
                specs.append((1.5, 1.2, (150, 150, 60), 19, 0.0))
        for sign in self._stop_signs:
            points.append((sign[0], sign[1]))
            specs.append((0.2, 2.0, (80, 80, 80), 5, 0.0))
            points.append((sign[0], sign[1]))
            specs.append((0.7, 0.7, (200, 40, 40), 12, 2.0))
        for light in self._lights:
            color = (230, 40, 40) if light.is_red(self.t) else (40, 220, 70)
            points.append((light.x, light.y))
            specs.append((0.25, 4.0, (80, 80, 80), 5, 0.0))
            points.append((light.x, light.y))
            specs.append((0.6, 0.9, color, 18, 4.0))
        xfs, yls = project(np.asarray(points, float))
        drawables = [(xfs[i], yls[i], *specs[i]) for i in range(len(specs))]
        for d in sorted(drawables, key=lambda t: -t[0]):
            draw_box(*d)
        # illumination from the evolving weather simulation (sun altitude
        # decays with game time; rain dims further). Applied through a
        # 256-entry LUT: bitwise-identical to (img * bright).astype(uint8)
        # — each uint8 value maps through the same float64 product — but a
        # single SIMD table lookup instead of a full-frame float multiply
        # (~2.5 ms/tick of the episode engine's budget).
        bright = self._weather_sim.brightness(self.t)
        if bright < 0.999:
            lut = (np.arange(256, dtype=np.float64) * bright).astype(np.uint8)
            img = lut[img]
        return img, seg

    # -- privileged world state --------------------------------------------------
    def actor_states(self) -> List[ActorState]:
        """Non-ego actor snapshot with finite-difference world velocities
        (carla.World.get_actors analog; DrivingBackend.actor_states)."""
        out = []
        p0s = self._npc_positions(self.t)
        p1s = self._npc_positions(self.t + SIM_DT)
        for ni, npc in enumerate(self._npcs):
            p0, p1 = p0s[ni], p1s[ni]
            out.append(ActorState(kind=npc.kind, x=float(p0[0]),
                                  y=float(p0[1]),
                                  vx=float((p1[0] - p0[0]) / SIM_DT),
                                  vy=float((p1[1] - p0[1]) / SIM_DT)))
        return out

    def traffic_light_states(self) -> List[TrafficLightState]:
        """Traffic-light snapshot (carla.TrafficLight.get_state analog)."""
        return [TrafficLightState(x=float(l.x), y=float(l.y),
                                  red=l.is_red(self.t))
                for l in self._lights]

    def road_polylines(self) -> List[Tuple[np.ndarray, float]]:
        """Drivable-road centerlines as (polyline (N,2), half_width) pairs —
        the map-rasterization seam behind the birdview renderer (reference
        map_utils.py draws the same geometry from OpenDRIVE). The grid town's
        roads are its grid lines."""
        span = self._grid_n * _BLOCK
        out = []
        for k in range(self._grid_n):
            out.append((np.array([[k * _BLOCK, -10.0],
                                  [k * _BLOCK, span + 10.0]]), 3.5))
            out.append((np.array([[-10.0, k * _BLOCK],
                                  [span + 10.0, k * _BLOCK]]), 3.5))
        return out

    def stop_sign_positions(self) -> List[Tuple[float, float]]:
        """Stop-sign world positions (traffic.stop actor locations analog)."""
        return [(float(s[0]), float(s[1])) for s in self._stop_signs]

    def weather_state(self) -> dict:
        return self._weather_sim.state(self.t)

    def set_weather(self, preset: int) -> None:
        """Mid-episode weather change (OpenSCENARIO EnvironmentAction /
        carla.World.set_weather analog): restarts the weather simulation at
        the given preset; rendering picks it up on the next tick."""
        self._weather = int(preset)
        self._weather_sim = _WeatherSim(int(preset))

    def close(self) -> None:
        self._route = None
        self._npcs = []

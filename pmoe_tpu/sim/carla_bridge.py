"""Real-CARLA backend behind the :class:`DrivingBackend` seam.

Implements the same contract as the fake backend over a live CARLA server
(0.9.10.x) through the ``carla`` Python wheel: synchronous 20 Hz stepping
(reference nocrash_evaluator.py:69-71,173-201), camera/GNSS/collision sensors
(agent_wrapper.py:90-201), spawn-point routes via CARLA's GlobalRoutePlanner,
and red-light detection against the world's traffic lights.

Import is gated: constructing :class:`CarlaBackend` without the ``carla`` wheel
raises a clear error; the rest of the framework never imports this module
unless ``backend: carla`` is configured.

**Validation status:** this bridge is contract-tested against a MOCKED
``carla`` 0.9.10 API (tests/test_carla_bridge.py — sensor wiring, sync-mode
settings, traffic-light queries, route tracing, teardown), which is the best
available in a simulator-less environment. It has NEVER been run against a
live CARLA server; until someone exercises it against CARLA 0.9.10.1, treat
the real-server seam as untested (the fake backend is the tested path).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .interface import (SIM_DT, ActorState, CollisionEvent, DrivingBackend,
                        EgoState, RoadOption, Route, SensorFrame,
                        TrafficLightState, VehicleControl)

__all__ = ["CarlaBackend"]


class CarlaBackend(DrivingBackend):
    def __init__(self, host: str = "localhost", port: int = 2000,
                 town: str = "Town01", img_width: int = 800,
                 img_height: int = 600, fov: int = 100,
                 camera_x: float = 1.3, camera_z: float = 1.3,
                 timeout: float = 60.0):
        try:
            import carla  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "CarlaBackend requires the 'carla' wheel and a running CARLA "
                "server; use the fake backend (backend: fake) otherwise."
            ) from e
        import carla

        self._carla = carla
        self.town = town
        self.W, self.H, self.fov = img_width, img_height, fov
        self.camera_x, self.camera_z = camera_x, camera_z

        self.client = carla.Client(host, port)
        self.client.set_timeout(timeout)
        self.world = self.client.load_world(town)
        settings = self.world.get_settings()
        settings.synchronous_mode = True
        settings.fixed_delta_seconds = SIM_DT
        self.world.apply_settings(settings)
        self._map = self.world.get_map()
        self._spawn_transforms = self._map.get_spawn_points()

        self.frame = 0
        self.t = 0.0
        self._ego = None
        self._camera = None
        self._collision_sensor = None
        self._gnss = None
        self._actors: List = []
        self._last_rgb: Optional[np.ndarray] = None
        self._last_gnss = (0.0, 0.0, 0.0)
        self._last_collision: Optional[CollisionEvent] = None
        self._ran_red = False
        self._was_before_light: dict = {}
        # CarlaDataProvider analog: per-tick cached actor state + registry
        # (reference srunner/scenariomanager/carla_data_provider.py:32-808)
        from .data_provider import WorldStateProvider

        self.provider = WorldStateProvider()
        self.provider.set_spawn_points(self._spawn_transforms)

    # -- world --------------------------------------------------------------------
    def spawn_points(self) -> Sequence[Tuple[float, float]]:
        return [(t.location.x, t.location.y) for t in self._spawn_transforms]

    def to_opendrive(self) -> str:
        """The town's OpenDRIVE document (sensor.opendrive_map payload,
        reference sensor_interface.py:322-324)."""
        return self._map.to_opendrive()

    def trace_route(self, start_idx: int, target_idx: int) -> Route:
        from agents.navigation.global_route_planner import GlobalRoutePlanner
        try:
            from agents.navigation.global_route_planner_dao import (
                GlobalRoutePlannerDAO)
            grp = GlobalRoutePlanner(GlobalRoutePlannerDAO(self._map, 1.0))
            grp.setup()
        except ImportError:      # newer carla API
            grp = GlobalRoutePlanner(self._map, 1.0)
        start = self._spawn_transforms[start_idx].location
        target = self._spawn_transforms[target_idx].location
        route = grp.trace_route(start, target)
        positions = np.array([[w.transform.location.x, w.transform.location.y]
                              for w, _ in route])
        options = [RoadOption(int(c.value) if hasattr(c, "value") else int(c))
                   for _, c in route]
        return Route(positions=positions, options=options)

    def set_weather(self, preset: int) -> None:
        """Apply a NoCrash weather preset id (also mid-episode — the
        OpenSCENARIO EnvironmentAction surface; reference
        openscenario_parser.py get_weather_from_env_action)."""
        carla = self._carla
        weather_map = {
            1: carla.WeatherParameters.ClearNoon,
            3: carla.WeatherParameters.WetNoon,
            6: carla.WeatherParameters.HardRainNoon,
            8: carla.WeatherParameters.ClearSunset,
            10: carla.WeatherParameters.WetSunset,
            14: carla.WeatherParameters.SoftRainSunset,
        }
        self.world.set_weather(weather_map.get(int(preset),
                                               carla.WeatherParameters.ClearNoon))

    # -- episode ------------------------------------------------------------------
    def reset(self, route: Route, weather: int = 1, n_vehicles: int = 0,
              n_pedestrians: int = 0, seed: int = 0) -> SensorFrame:
        carla = self._carla
        self._cleanup()
        self.frame, self.t = 0, 0.0
        self._ran_red = False
        self._was_before_light = {}

        self.set_weather(weather)

        bp_lib = self.world.get_blueprint_library()
        x0, y0 = route.positions[0]
        x1, y1 = route.positions[min(5, len(route.positions) - 1)]
        yaw = math.degrees(math.atan2(y1 - y0, x1 - x0))
        ego_tf = carla.Transform(carla.Location(x=float(x0), y=float(y0), z=0.3),
                                 carla.Rotation(yaw=yaw))
        ego_bp = bp_lib.find("vehicle.lincoln.mkz2017")
        self._ego = self.world.spawn_actor(ego_bp, ego_tf)
        self.provider.clear()
        self.provider.register_actor(self._ego, role="hero")
        self.provider.set_ego_route(route)

        cam_bp = bp_lib.find("sensor.camera.rgb")
        cam_bp.set_attribute("image_size_x", str(self.W))
        cam_bp.set_attribute("image_size_y", str(self.H))
        cam_bp.set_attribute("fov", str(self.fov))
        cam_tf = carla.Transform(carla.Location(x=self.camera_x,
                                                z=self.camera_z))
        self._camera = self.world.spawn_actor(cam_bp, cam_tf,
                                              attach_to=self._ego)
        self._camera.listen(self._on_image)

        col_bp = bp_lib.find("sensor.other.collision")
        self._collision_sensor = self.world.spawn_actor(
            col_bp, carla.Transform(), attach_to=self._ego)
        self._collision_sensor.listen(self._on_collision)

        gnss_bp = bp_lib.find("sensor.other.gnss")
        self._gnss = self.world.spawn_actor(
            gnss_bp, carla.Transform(carla.Location(z=self.camera_z)),
            attach_to=self._ego)
        self._gnss.listen(self._on_gnss)

        rng = np.random.default_rng(seed)
        vehicle_bps = list(bp_lib.filter("vehicle.*"))
        spawn_pts = list(self._spawn_transforms)
        rng.shuffle(spawn_pts)
        for tf in spawn_pts[:n_vehicles]:
            bp = vehicle_bps[int(rng.integers(len(vehicle_bps)))]
            actor = self.world.try_spawn_actor(bp, tf)
            if actor is not None:
                actor.set_autopilot(True)
                self._actors.append(actor)
                self.provider.register_actor(actor)

        self.world.tick()
        return self._sensor_frame()

    def _on_image(self, image) -> None:
        arr = np.frombuffer(image.raw_data, dtype=np.uint8).reshape(
            image.height, image.width, 4)
        self._last_rgb = arr[..., :3][..., ::-1].copy()   # BGRA -> RGB

    def _on_collision(self, event) -> None:
        other = event.other_actor.type_id
        kind = ("walker" if "walker" in other
                else "vehicle" if "vehicle" in other else "static")
        self._last_collision = CollisionEvent(self.frame, kind)

    def _on_gnss(self, data) -> None:
        self._last_gnss = (data.latitude, data.longitude, data.altitude)

    # -- stepping -----------------------------------------------------------------
    def tick(self, control: VehicleControl) -> SensorFrame:
        carla = self._carla
        self._last_collision = None
        self._ego.apply_control(carla.VehicleControl(
            steer=float(control.steer), throttle=float(control.throttle),
            brake=float(control.brake)))
        self.world.tick()
        self.frame += 1
        self.t += SIM_DT
        self.provider.on_tick(self.frame)   # invalidate per-tick state cache
        self._ran_red = self._detect_red_light()
        return self._sensor_frame()

    def _detect_red_light(self) -> bool:
        tl = self._ego.get_traffic_light() if self._ego else None
        if tl is None:
            return False
        state = tl.get_state()
        if state != self._carla.TrafficLightState.Red:
            return False
        loc = self.provider.get_location(self._ego)
        d = loc.distance(tl.get_location())
        key = tl.id
        was_before = self._was_before_light.get(key, True)
        before = d > 8.0
        self._was_before_light[key] = before
        return was_before and not before

    def ran_red_light(self) -> bool:
        return self._ran_red

    # -- privileged world state ---------------------------------------------------
    def actor_states(self) -> List[ActorState]:
        """Non-ego vehicle/walker snapshot via world.get_actors (the same
        privileged state the reference experts read through
        CarlaDataProvider; DrivingBackend.actor_states)."""
        out = []
        ego_id = self._ego.id if self._ego is not None else None
        for pattern, kind in (("vehicle.*", "vehicle"), ("walker.*", "walker")):
            for actor in self.world.get_actors().filter(pattern):
                if ego_id is not None and actor.id == ego_id:
                    continue
                loc = actor.get_location()
                vel = actor.get_velocity()
                out.append(ActorState(kind=kind, x=float(loc.x),
                                      y=float(loc.y), vx=float(vel.x),
                                      vy=float(vel.y)))
        return out

    def traffic_light_states(self) -> List[TrafficLightState]:
        """All traffic lights with their red/non-red state."""
        red = self._carla.TrafficLightState.Red
        out = []
        for tl in self.world.get_actors().filter("traffic.traffic_light*"):
            loc = tl.get_location()
            out.append(TrafficLightState(x=float(loc.x), y=float(loc.y),
                                         red=tl.get_state() == red))
        return out

    def road_polylines(self, precision: float = 2.0):
        """Drivable-lane centerlines rasterized from the waypoint API
        (map.generate_waypoints) — the birdview seam for ANY OpenDRIVE town,
        the role of the reference's 1728-LoC pygame renderer
        (leaderboard/envs/map_utils.py) without pygame: waypoints are grouped
        per (road_id, lane_id), ordered by s, and returned as
        (polyline (N,2), half_width) pairs. Cached per town."""
        if getattr(self, "_road_polylines_cache", None) is not None:
            return self._road_polylines_cache
        lanes: dict = {}
        for wp in self._map.generate_waypoints(precision):
            key = (wp.road_id, wp.lane_id)
            loc = wp.transform.location
            lanes.setdefault(key, []).append(
                (float(wp.s), float(loc.x), float(loc.y),
                 float(wp.lane_width)))
        out = []
        for pts in lanes.values():
            pts.sort(key=lambda p: p[0])
            poly = np.array([[x, y] for _, x, y, _ in pts])
            if len(poly) >= 2:
                half_w = 0.5 * float(np.mean([w for *_, w in pts]))
                out.append((poly, half_w))
        self._road_polylines_cache = out
        return out

    def stop_sign_positions(self) -> List[Tuple[float, float]]:
        """World positions of the server's traffic.stop actors."""
        out = []
        for actor in self.world.get_actors().filter("traffic.stop*"):
            loc = actor.get_location()
            out.append((float(loc.x), float(loc.y)))
        return out

    def ran_stop_sign(self) -> bool:
        """Stop-sign zone tracking over the server's `traffic.stop` actors —
        same exit-without-stopping contract as the fake backend (srunner
        RunningStopTest:1877)."""
        if self._ego is None:
            return False
        if not hasattr(self, "_stop_actors"):
            self._stop_actors = list(
                self.world.get_actors().filter("traffic.stop*"))
            self._stop_state = {}
        loc = self.provider.get_location(self._ego)
        spd = self.ego_state().speed
        violated = False
        for actor in self._stop_actors:
            inside = loc.distance(actor.get_location()) < 10.0
            state = self._stop_state.get(actor.id)
            if inside:
                self._stop_state[actor.id] = (spd if state is None
                                              else min(state, spd))
            elif state is not None:
                if state > 0.3:
                    violated = True
                del self._stop_state[actor.id]
        return violated

    def off_lane(self) -> bool:
        """Outside every driving lane: no projectable driving-lane waypoint
        within lane half-width of the ego."""
        if self._ego is None:
            return False
        ego_loc = self.provider.get_location(self._ego)
        wp = self._map.get_waypoint(
            ego_loc, project_to_road=True,
            lane_type=self._carla.LaneType.Driving)
        if wp is None:
            return True
        d = ego_loc.distance(wp.transform.location)
        return d > max(wp.lane_width * 0.5 + 1.3, 3.0)

    def ego_state(self) -> EgoState:
        tf = self.provider.get_transform(self._ego)
        vel = self.provider.get_velocity(self._ego)
        yaw = math.radians(tf.rotation.yaw)
        fwd = vel.x * math.cos(yaw) + vel.y * math.sin(yaw)
        return EgoState(tf.location.x, tf.location.y, yaw, max(fwd, 0.0))

    def _sensor_frame(self) -> SensorFrame:
        return SensorFrame(frame=self.frame, timestamp=self.t,
                           rgb=self._last_rgb, speed=self.ego_state().speed,
                           gnss=self._last_gnss,
                           collision=self._last_collision,
                           compass=self.ego_state().yaw)

    def _cleanup(self) -> None:
        for actor in [self._camera, self._collision_sensor, self._gnss,
                      self._ego, *self._actors]:
            if actor is not None:
                try:
                    actor.destroy()
                except Exception:
                    pass
        self._camera = self._collision_sensor = self._gnss = self._ego = None
        self._actors = []

    def close(self) -> None:
        self._cleanup()
        settings = self.world.get_settings()
        settings.synchronous_mode = False
        self.world.apply_settings(settings)

"""CarlaBackend contract tests against a mocked ``carla`` module.

The real-CARLA bridge (pmoe_tpu/sim/carla_bridge.py) is the most
failure-prone seam of the framework (reference
leaderboard/autoagents/agent_wrapper.py:90-201 sensor spawn + sync tick).
These tests install a behavioral fake of the ``carla`` wheel into
``sys.modules`` and drive the bridge through its full lifecycle:
construction (sync mode), reset (ego + camera/collision/GNSS spawn, weather,
NPC traffic), tick (control application, sensor callbacks, frame assembly),
red-light/stop-sign/off-lane detection, route tracing, and cleanup.
"""

import math
import sys
import types

import numpy as np
import pytest

from pmoe_tpu.sim.interface import (RoadOption, Route, SIM_DT, VehicleControl)


# ---------------------------------------------------------------------------
# behavioral fake of the `carla` wheel
# ---------------------------------------------------------------------------

class FLocation:
    def __init__(self, x=0.0, y=0.0, z=0.0):
        self.x, self.y, self.z = float(x), float(y), float(z)

    def distance(self, other):
        return math.sqrt((self.x - other.x) ** 2 + (self.y - other.y) ** 2
                         + (self.z - other.z) ** 2)


class FRotation:
    def __init__(self, pitch=0.0, yaw=0.0, roll=0.0):
        self.pitch, self.yaw, self.roll = pitch, yaw, roll


class FTransform:
    def __init__(self, location=None, rotation=None):
        self.location = location or FLocation()
        self.rotation = rotation or FRotation()


class FVector3D:
    def __init__(self, x=0.0, y=0.0, z=0.0):
        self.x, self.y, self.z = x, y, z


class FVehicleControl:
    def __init__(self, steer=0.0, throttle=0.0, brake=0.0):
        self.steer, self.throttle, self.brake = steer, throttle, brake


class FBlueprint:
    def __init__(self, type_id):
        self.type_id = type_id
        self.attrs = {}

    def set_attribute(self, k, v):
        self.attrs[k] = v


class FBlueprintLibrary:
    def find(self, name):
        return FBlueprint(name)

    def filter(self, pattern):
        base = pattern.rstrip("*").rstrip(".")
        return [FBlueprint(f"{base}.model{i}") for i in range(3)]


class FActor:
    _next_id = [1]

    def __init__(self, blueprint, transform, world, attach_to=None):
        self.type_id = blueprint.type_id
        self.blueprint = blueprint
        self.transform = transform
        self.world = world
        self.parent = attach_to
        self.id = FActor._next_id[0]
        FActor._next_id[0] += 1
        self.alive = True
        self.autopilot = False
        self._callback = None
        self._control = FVehicleControl()
        self._speed = 0.0
        self._traffic_light = None

    # vehicle surface
    def apply_control(self, control):
        self._control = control

    def set_autopilot(self, on):
        self.autopilot = on

    def get_transform(self):
        return self.transform

    def get_location(self):
        return self.transform.location

    def get_velocity(self):
        yaw = math.radians(self.transform.rotation.yaw)
        return FVector3D(self._speed * math.cos(yaw),
                         self._speed * math.sin(yaw), 0.0)

    def get_traffic_light(self):
        return self._traffic_light

    # sensor surface
    def listen(self, callback):
        self._callback = callback

    def destroy(self):
        if not self.alive:
            raise RuntimeError("double destroy")
        self.alive = False


class FTrafficLight(FActor):
    def __init__(self, world, state, location):
        super().__init__(FBlueprint("traffic.traffic_light"),
                         FTransform(location), world)
        self._state = state

    def get_state(self):
        return self._state


class FImage:
    def __init__(self, width, height):
        self.width, self.height = width, height
        # BGRA with a recognizable blue channel
        arr = np.zeros((height, width, 4), np.uint8)
        arr[..., 0] = 200                       # B
        arr[..., 3] = 255
        self.raw_data = arr.tobytes()


class FGnss:
    latitude, longitude, altitude = 1.0, 2.0, 3.0


class FWaypoint:
    def __init__(self, location, lane_width=3.5, road_id=0, lane_id=-1,
                 s=0.0):
        self.transform = FTransform(location)
        self.lane_width = lane_width
        self.road_id = road_id
        self.lane_id = lane_id
        self.s = s


class FMap:
    def __init__(self):
        self.spawns = [FTransform(FLocation(10.0 + 50.0 * i, 2.0))
                       for i in range(4)]
        self.waypoint_distance = 0.0    # test hook: ego->lane distance

    def get_spawn_points(self):
        return list(self.spawns)

    def get_waypoint(self, location, project_to_road=True, lane_type=None):
        loc = FLocation(location.x, location.y - self.waypoint_distance,
                        location.z)
        return FWaypoint(loc)

    def generate_waypoints(self, precision):
        """Two straight roads (one 2-lane, one 1-lane), shuffled order — the
        bridge must regroup by (road_id, lane_id) and re-sort by s."""
        wps = []
        for road_id, lane_ids, y0 in ((1, (-1, 1), 2.0), (2, (-1,), 60.0)):
            for lane_id in lane_ids:
                for i in range(0, 100, int(precision)):
                    wps.append(FWaypoint(
                        FLocation(float(i), y0 + 3.5 * (lane_id + 1)),
                        road_id=road_id, lane_id=lane_id, s=float(i)))
        import random

        random.Random(0).shuffle(wps)
        return wps

    def to_opendrive(self):
        return "<OpenDRIVE/>"


class FSettings:
    synchronous_mode = False
    fixed_delta_seconds = None


class FActorList(list):
    def filter(self, pattern):
        base = pattern.rstrip("*")
        return [a for a in self if a.type_id.startswith(base)]


class FWorld:
    def __init__(self):
        self.settings = FSettings()
        self.map = FMap()
        self.weather = None
        self.actors = FActorList()
        self.ticks = 0
        self.fail_spawn = False         # test hook

    def get_settings(self):
        return self.settings

    def apply_settings(self, settings):
        self.settings = settings

    def get_blueprint_library(self):
        return FBlueprintLibrary()

    def get_map(self):
        return self.map

    def set_weather(self, weather):
        self.weather = weather

    def spawn_actor(self, blueprint, transform, attach_to=None):
        a = FActor(blueprint, transform, self, attach_to)
        self.actors.append(a)
        return a

    def try_spawn_actor(self, blueprint, transform, attach_to=None):
        if self.fail_spawn:
            return None
        return self.spawn_actor(blueprint, transform, attach_to)

    def get_actors(self):
        return FActorList(a for a in self.actors if a.alive)

    def tick(self):
        """Synchronous step: integrate ego-ish vehicles and fire sensor
        callbacks exactly once (the sync-mode contract)."""
        self.ticks += 1
        for a in self.actors:
            if not a.alive or not a.type_id.startswith("vehicle"):
                continue
            accel = 4.0 * a._control.throttle - 8.0 * a._control.brake \
                - 0.1 * a._speed
            a._speed = max(0.0, a._speed + accel * SIM_DT)
            yaw = math.radians(a.transform.rotation.yaw)
            a.transform.location.x += a._speed * math.cos(yaw) * SIM_DT
            a.transform.location.y += a._speed * math.sin(yaw) * SIM_DT
        for a in self.actors:
            if not a.alive or a._callback is None:
                continue
            if a.type_id == "sensor.camera.rgb":
                a._callback(FImage(int(a.blueprint.attrs["image_size_x"]),
                                   int(a.blueprint.attrs["image_size_y"])))
            elif a.type_id == "sensor.other.gnss":
                a._callback(FGnss())


class FClient:
    def __init__(self, host, port):
        self.host, self.port = host, port
        self.world = FWorld()

    def set_timeout(self, t):
        self.timeout = t

    def load_world(self, town):
        self.world.town = town
        return self.world


def _make_carla_module():
    m = types.ModuleType("carla")
    m.Client = FClient
    m.Location = FLocation
    m.Rotation = FRotation
    m.Transform = FTransform
    m.VehicleControl = FVehicleControl
    m.WeatherParameters = types.SimpleNamespace(
        ClearNoon="ClearNoon", WetNoon="WetNoon", HardRainNoon="HardRainNoon",
        ClearSunset="ClearSunset", WetSunset="WetSunset",
        SoftRainSunset="SoftRainSunset")
    m.TrafficLightState = types.SimpleNamespace(Red="Red", Green="Green")
    m.LaneType = types.SimpleNamespace(Driving="Driving", Parking="Parking",
                                       Any="Any")
    return m


@pytest.fixture
def bridge(monkeypatch):
    """A CarlaBackend over the mocked wheel, plus the underlying fake world."""
    monkeypatch.setitem(sys.modules, "carla", _make_carla_module())
    from pmoe_tpu.sim.carla_bridge import CarlaBackend

    backend = CarlaBackend(town="Town03")
    return backend, backend.world


def _straight_route():
    xs = np.arange(10.0, 110.0, 1.0)
    positions = np.stack([xs, np.full_like(xs, 2.0)], axis=1)
    return Route(positions=positions,
                 options=[RoadOption.LANEFOLLOW] * len(xs))


def test_setup_enables_sync_mode(bridge):
    backend, world = bridge
    assert world.settings.synchronous_mode is True
    assert world.settings.fixed_delta_seconds == SIM_DT
    assert world.town == "Town03"
    assert len(backend.spawn_points()) == 4
    assert backend.to_opendrive() == "<OpenDRIVE/>"


def test_reset_spawns_ego_and_sensor_suite(bridge):
    """agent_wrapper.py:90-201 semantics: ego + camera/collision/GNSS
    attached to it, weather applied, first frame carries camera data."""
    backend, world = bridge
    frame = backend.reset(_straight_route(), weather=6, n_vehicles=2, seed=0)
    types_spawned = sorted(a.type_id for a in world.actors if a.alive)
    assert "vehicle.lincoln.mkz2017" in types_spawned
    assert "sensor.camera.rgb" in types_spawned
    assert "sensor.other.collision" in types_spawned
    assert "sensor.other.gnss" in types_spawned
    sensors = [a for a in world.actors if a.type_id.startswith("sensor")]
    assert all(s.parent is backend._ego for s in sensors)
    assert world.weather == "HardRainNoon"
    npcs = [a for a in world.actors
            if a.autopilot and a is not backend._ego]
    assert len(npcs) == 2                       # traffic spawned + autopilot
    # ego placed at the route start, heading along it
    assert backend._ego.transform.location.x == 10.0
    assert abs(backend._ego.transform.rotation.yaw) < 1e-6
    # camera callback delivered a frame (BGRA -> RGB: blue plane moved to ch 2)
    assert frame.rgb is not None and frame.rgb.shape == (600, 800, 3)
    assert frame.rgb[0, 0, 2] == 200 and frame.rgb[0, 0, 0] == 0
    assert frame.gnss == (1.0, 2.0, 3.0)


def test_tick_applies_control_and_moves_ego(bridge):
    backend, world = bridge
    backend.reset(_straight_route())
    x0 = backend._ego.transform.location.x
    for _ in range(10):
        frame = backend.tick(VehicleControl(steer=0.0, throttle=1.0,
                                            brake=0.0))
    assert backend._ego._control.throttle == 1.0
    assert backend._ego.transform.location.x > x0
    assert frame.speed > 0.0
    assert frame.frame == 10 and world.ticks >= 11
    st = backend.ego_state()
    assert st.x == backend._ego.transform.location.x
    assert st.speed == pytest.approx(frame.speed)


def test_collision_callback_surfaces_one_frame(bridge):
    backend, world = bridge
    backend.reset(_straight_route())
    other = types.SimpleNamespace(type_id="vehicle.audi.tt")
    backend._collision_sensor._callback(
        types.SimpleNamespace(other_actor=other))
    frame = backend.tick(VehicleControl())
    # NB: tick clears the event BEFORE stepping, so the injected event lands
    # in the frame only if re-fired during the tick; fire it via the world
    backend._on_collision(types.SimpleNamespace(other_actor=other))
    frame = backend._sensor_frame()
    assert frame.collision is not None and \
        frame.collision.other_type == "vehicle"
    frame2 = backend.tick(VehicleControl())
    assert frame2.collision is None             # one-frame event


def test_red_light_crossing_detected_once(bridge):
    backend, world = bridge
    backend.reset(_straight_route())
    light = FTrafficLight(world, "Red", FLocation(30.0, 2.0))
    backend._ego._traffic_light = light
    backend._ego.transform.location.x = 20.0    # 10 m before the light
    backend.tick(VehicleControl())
    assert not backend.ran_red_light()
    backend._ego.transform.location.x = 25.0    # crossed the 8 m line
    backend.tick(VehicleControl())
    assert backend.ran_red_light()
    backend.tick(VehicleControl())
    assert not backend.ran_red_light()          # edge-triggered


def test_stop_sign_exit_without_stopping(bridge):
    backend, world = bridge
    backend.reset(_straight_route())
    stop = FActor(FBlueprint("traffic.stop"), FTransform(FLocation(30.0, 2.0)),
                  world)
    world.actors.append(stop)
    backend._ego._speed = 5.0
    backend._ego.transform.location.x = 28.0    # inside the 10 m zone
    backend.tick(VehicleControl(throttle=0.5))  # provider caches per tick
    assert backend.ran_stop_sign() is False
    backend._ego.transform.location.x = 80.0    # left without stopping
    backend.tick(VehicleControl(throttle=0.5))
    assert backend.ran_stop_sign() is True


def test_off_lane_threshold(bridge):
    backend, world = bridge
    backend.reset(_straight_route())
    world.map.waypoint_distance = 0.0
    assert backend.off_lane() is False
    world.map.waypoint_distance = 5.0           # 5 m from lane center
    assert backend.off_lane() is True


def test_trace_route_via_global_planner(bridge, monkeypatch):
    """trace_route drives CARLA's GlobalRoutePlanner import surface."""
    backend, world = bridge

    class FGRP:
        def __init__(self, map_or_dao, resolution=None):
            pass

        def setup(self):
            pass

        def trace_route(self, start, target):
            wps = []
            for i in range(5):
                u = i / 4.0
                loc = FLocation(start.x + u * (target.x - start.x),
                                start.y + u * (target.y - start.y))
                wps.append((FWaypoint(loc), RoadOption.LANEFOLLOW))
            return wps

    grp_mod = types.ModuleType("agents.navigation.global_route_planner")
    grp_mod.GlobalRoutePlanner = FGRP
    nav = types.ModuleType("agents.navigation")
    agents = types.ModuleType("agents")
    monkeypatch.setitem(sys.modules, "agents", agents)
    monkeypatch.setitem(sys.modules, "agents.navigation", nav)
    monkeypatch.setitem(sys.modules,
                        "agents.navigation.global_route_planner", grp_mod)
    route = backend.trace_route(0, 2)
    assert route.positions.shape == (5, 2)
    assert route.positions[0][0] == 10.0 and route.positions[-1][0] == 110.0


def test_cleanup_destroys_actors_and_restores_async(bridge):
    backend, world = bridge
    backend.reset(_straight_route(), n_vehicles=1)
    spawned = [a for a in world.actors if a.alive]
    assert len(spawned) >= 5                    # ego + 3 sensors + 1 npc
    backend.close()
    assert all(not a.alive for a in spawned)
    assert world.settings.synchronous_mode is False
    # reset after close re-spawns cleanly (per-episode agent lifecycle)
    backend.world.settings.synchronous_mode = True
    frame = backend.reset(_straight_route())
    assert frame is not None and backend._ego.alive


def test_road_polylines_from_waypoint_api(bridge):
    """road_polylines regroups generate_waypoints by (road_id, lane_id) and
    re-sorts by s — the OpenDRIVE rasterization seam for the birdview
    (reference map_utils.py role)."""
    backend, world = bridge
    polys = backend.road_polylines(precision=2.0)
    assert len(polys) == 3                       # 2 lanes + 1 lane
    for poly, half_w in polys:
        assert half_w == pytest.approx(1.75)
        # s-sorted: x strictly increasing despite the shuffled input
        assert np.all(np.diff(poly[:, 0]) > 0)
    # cached per town
    assert backend.road_polylines() is polys


def test_birdview_renders_on_real_bridge(bridge):
    """The sensor.map renderer works over the CARLA bridge's public seam
    (VERDICT r3 item 8: no more fake-backend duck-typing)."""
    from pmoe_tpu.sim.birdview import render_birdview

    backend, world = bridge
    route = _straight_route()
    backend.reset(route, n_vehicles=2)
    bev = render_birdview(backend, route)
    assert bev.shape == (192, 192, 12)
    assert bev[..., 0].sum() > 0                 # road plane
    assert bev[..., 1].sum() > 0                 # lane edges
    assert bev[..., 2].sum() > 0                 # route plan
    assert bev[..., 3].sum() > 0                 # npc vehicles
    assert bev[..., 9].sum() > 0                 # ego marker


def test_birdview_capability_gate():
    """A backend without the map seam gets a clear error, not empty roads."""
    from pmoe_tpu.sim.birdview import render_birdview

    class NoMapBackend:
        def ego_state(self):
            raise AssertionError("should gate before touching ego state")

    with pytest.raises(NotImplementedError, match="road_polylines"):
        render_birdview(NoMapBackend())

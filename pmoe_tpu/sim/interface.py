"""Driving-simulator abstraction.

The reference talks to a live CARLA server over TCP through the vendored
leaderboard stack (SURVEY §1.7-1.8) and is untestable without the UE4 binary
(SURVEY §4). This interface is the seam: the evaluation harness, the
stage-3 RL environment, and the agents all program against
:class:`DrivingBackend`, implemented by

* :class:`pmoe_tpu.sim.fake_carla.FakeCarlaBackend` — scripted kinematics +
  synthetic camera, runs anywhere (tests, CI, TPU pods);
* a real-CARLA bridge (``pmoe_tpu.sim.carla_bridge``) when the ``carla`` wheel
  and a server are available.

Conventions: 20 Hz synchronous stepping (reference nocrash_evaluator.py:71),
positions in meters, controls = (steer in [-1,1], throttle [0,1], brake [0,1]).
"""

from __future__ import annotations

import enum
import math
from dataclasses import dataclass, field
from typing import List, Optional, Protocol, Sequence, Tuple

import numpy as np

__all__ = ["RoadOption", "VehicleControl", "EgoState", "CollisionEvent",
           "ActorState", "TrafficLightState",
           "SensorFrame", "Route", "DrivingBackend", "latlon_to_xy",
           "xy_to_latlon", "SIM_DT"]

SIM_DT = 0.05       # 20 Hz synchronous tick
EARTH_RADIUS = 6371e3


class RoadOption(enum.IntEnum):
    """High-level navigation commands (CARLA agents.navigation values)."""

    VOID = -1
    LEFT = 1
    RIGHT = 2
    STRAIGHT = 3
    LANEFOLLOW = 4
    CHANGELANELEFT = 5
    CHANGELANERIGHT = 6


@dataclass
class VehicleControl:
    steer: float = 0.0
    throttle: float = 0.0
    brake: float = 0.0


@dataclass
class EgoState:
    x: float = 0.0
    y: float = 0.0
    yaw: float = 0.0            # radians
    speed: float = 0.0          # m/s (forward)


@dataclass
class CollisionEvent:
    frame: int
    other_type: str             # 'vehicle' | 'walker' | 'static'
    intensity: float = 1.0


@dataclass
class ActorState:
    """Privileged world state for one non-ego actor (carla.World.get_actors
    analog — the reference's scripted experts read the same privileged state
    through CarlaDataProvider, e.g. autoagents/collector_agents use actor
    transforms/velocities)."""

    kind: str                   # 'vehicle' | 'walker' | 'static'
    x: float
    y: float
    vx: float = 0.0             # world-frame velocity (m/s)
    vy: float = 0.0


@dataclass
class TrafficLightState:
    """Privileged traffic-light state (carla.TrafficLight.get_state analog)."""

    x: float
    y: float
    red: bool


@dataclass
class SensorFrame:
    """One synchronous tick worth of sensor data (the reference's
    SensorInterface.get_data result, sensor_interface.py:424-440)."""

    frame: int
    timestamp: float
    rgb: Optional[np.ndarray] = None            # (H, W, 3) uint8
    speed: float = 0.0                          # speedometer (m/s)
    gnss: Tuple[float, float, float] = (0.0, 0.0, 0.0)   # lat, lon, alt
    collision: Optional[CollisionEvent] = None
    compass: float = 0.0
    seg: Optional[np.ndarray] = None            # (H, W) uint8 class ids


@dataclass
class Route:
    """Dense route: positions every ~1 m with RoadOption per node plus the GPS
    form consumed by the agent's waypointer."""

    positions: np.ndarray                       # (N, 2) xy
    options: List[RoadOption] = field(default_factory=list)

    @property
    def length(self) -> float:
        d = np.diff(self.positions, axis=0)
        return float(np.sqrt((d ** 2).sum(-1)).sum())

    def gps_plan(self, lat_ref: float = 0.0, lon_ref: float = 0.0):
        """[( {'lat','lon','z'}, RoadOption ), ...] like the leaderboard's
        location_route_to_gps (route_manipulation.py:21-44)."""
        plan = []
        for (x, y), cmd in zip(self.positions, self.options):
            lat, lon = xy_to_latlon(x, y, lat_ref, lon_ref)
            plan.append(({"lat": lat, "lon": lon, "z": 0.0}, cmd))
        return plan


def latlon_to_xy(lat: float, lon: float, lat_ref: float = 0.0,
                 lon_ref: float = 0.0) -> Tuple[float, float]:
    """Equirectangular projection (reference waypointer.py:62-67 family)."""
    x = EARTH_RADIUS * math.radians(lat - lat_ref)
    y = EARTH_RADIUS * math.radians(lon - lon_ref) * math.cos(math.radians(lat_ref))
    return x, y


def xy_to_latlon(x: float, y: float, lat_ref: float = 0.0,
                 lon_ref: float = 0.0) -> Tuple[float, float]:
    lat = lat_ref + math.degrees(x / EARTH_RADIUS)
    lon = lon_ref + math.degrees(
        y / (EARTH_RADIUS * max(math.cos(math.radians(lat_ref)), 1e-9)))
    return lat, lon


class DrivingBackend(Protocol):
    """What the evaluators / RL env need from a simulator."""

    town: str

    def spawn_points(self) -> Sequence[Tuple[float, float]]: ...

    def trace_route(self, start_idx: int, target_idx: int) -> Route: ...

    def reset(self, route: Route, weather: int = 1, n_vehicles: int = 0,
              n_pedestrians: int = 0, seed: int = 0) -> SensorFrame: ...

    def tick(self, control: VehicleControl) -> SensorFrame: ...

    def ego_state(self) -> EgoState: ...

    def ran_red_light(self) -> bool:
        """True exactly on ticks where the ego crossed a red light."""
        ...

    def actor_states(self) -> List["ActorState"]:
        """Privileged non-ego actor snapshot (positions + velocities). The
        scripted experts use this for hazard braking, exactly like the
        reference's privileged collectors read CARLA actor transforms."""
        ...

    def traffic_light_states(self) -> List["TrafficLightState"]:
        """Privileged traffic-light snapshot (position + red/green)."""
        ...

    def close(self) -> None: ...

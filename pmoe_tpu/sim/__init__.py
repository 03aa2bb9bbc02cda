from .interface import (RoadOption, VehicleControl, EgoState, CollisionEvent,
                        SensorFrame, Route, DrivingBackend, SIM_DT)
from .fake_carla import FakeCarlaBackend

__all__ = [
    "RoadOption", "VehicleControl", "EgoState", "CollisionEvent",
    "SensorFrame", "Route", "DrivingBackend", "SIM_DT", "FakeCarlaBackend",
]

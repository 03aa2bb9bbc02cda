from .interface import (RoadOption, VehicleControl, EgoState, CollisionEvent,
                        SensorFrame, Route, DrivingBackend, SIM_DT)
from .fake_carla import FakeCarlaBackend
from .sensor_interface import (SensorInterface, SensorHub, PseudoSensorReader,
                               SensorReceivedNoData, AgentError,
                               SensorConfigurationInvalid, validate_sensors)
from .birdview import render_birdview, BIRDVIEW_CHANNELS
from .data_provider import WorldStateProvider
from .env import DrivingGym, postprocess_action

__all__ = [
    "RoadOption", "VehicleControl", "EgoState", "CollisionEvent",
    "SensorFrame", "Route", "DrivingBackend", "SIM_DT", "FakeCarlaBackend",
    "SensorInterface", "SensorHub", "PseudoSensorReader",
    "SensorReceivedNoData", "AgentError", "SensorConfigurationInvalid",
    "validate_sensors", "render_birdview", "BIRDVIEW_CHANNELS",
    "WorldStateProvider", "DrivingGym", "postprocess_action",
]

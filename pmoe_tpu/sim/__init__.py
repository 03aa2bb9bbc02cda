from .interface import (RoadOption, VehicleControl, EgoState, CollisionEvent,
                        SensorFrame, Route, DrivingBackend, SIM_DT)
from .fake_carla import FakeCarlaBackend
from .sensor_interface import (SensorInterface, SensorHub, PseudoSensorReader,
                               SensorReceivedNoData, AgentError,
                               SensorConfigurationInvalid, validate_sensors)
from .birdview import render_birdview, BIRDVIEW_CHANNELS
from .data_provider import WorldStateProvider


def __getattr__(name):
    # lazy: env imports eval.criteria, which imports sim.interface — an eager
    # import here would make `import pmoe_tpu.eval` circular
    if name in ("DrivingGym", "postprocess_action"):
        from . import env

        return getattr(env, name)
    raise AttributeError(name)

__all__ = [
    "RoadOption", "VehicleControl", "EgoState", "CollisionEvent",
    "SensorFrame", "Route", "DrivingBackend", "SIM_DT", "FakeCarlaBackend",
    "SensorInterface", "SensorHub", "PseudoSensorReader",
    "SensorReceivedNoData", "AgentError", "SensorConfigurationInvalid",
    "validate_sensors", "render_birdview", "BIRDVIEW_CHANNELS",
    "WorldStateProvider", "DrivingGym", "postprocess_action",
]

"""User-defined metric classes over episode recordings
(srunner/metrics/examples analog). Run with
``python -m pmoe_tpu.eval.metrics_manager``."""

from .basic_metric import BasicMetric
from .criteria_filter import CriteriaFilter
from .distance_between_vehicles import DistanceBetweenVehicles
from .distance_to_route import DistanceToRoute

__all__ = ["BasicMetric", "CriteriaFilter", "DistanceBetweenVehicles",
           "DistanceToRoute"]

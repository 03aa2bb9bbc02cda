from .criteria import (Criterion, CollisionTest, RouteCompletionTest,
                       RunningRedLightTest, RunningStopTest,
                       OutsideRouteLanesTest, InRouteTest, BlockedTest,
                       TimeoutTest, MaxVelocityTest, DrivenDistanceTest,
                       AverageVelocityTest, KeepLaneTest, ReachedRegionTest,
                       OffRoadTest, EndofRoadTest, OnSidewalkTest,
                       WrongLaneTest, InRadiusRegionTest, CriteriaTree)
from .statistics import (NoCrashStatisticsManager, StatisticsManager,
                         RouteRecord, PENALTY_VALUES)
from .manager import run_episode, EpisodeResult
from .nocrash import NoCrashEvaluator, WEATHERS, TRAFFIC_TABLES
from .leaderboard import LeaderboardEvaluator
from .route_indexer import RouteIndexer, RouteConfig
from .route_parser import parse_routes_file, interpolate_route, downsample_route
from .scenarios import ScenarioInjector, ScenarioTrigger
from .parallel_runner import ParallelEvalRunner, EvalTask
from .watchdog import Watchdog, GameTime
from .behaviors import (BasicScenario, FollowLeadingVehicle,
                        DynamicObjectCrossing, ControlLoss,
                        SCENARIO_CLASSES)
from .openscenario import (OpenScenario, OpenScenarioConfiguration,
                           UnsupportedOpenScenarioFeature, load_xosc)
from .recorder import EpisodeRecorder, MetricsLog
from .view_results import view_results
from ..sim.sensor_interface import AgentError, SensorReceivedNoData

__all__ = [
    "Criterion", "CollisionTest", "RouteCompletionTest", "RunningRedLightTest",
    "InRouteTest", "BlockedTest", "TimeoutTest", "CriteriaTree",
    "RunningStopTest", "OutsideRouteLanesTest", "MaxVelocityTest",
    "DrivenDistanceTest", "AverageVelocityTest", "KeepLaneTest",
    "ReachedRegionTest", "OffRoadTest", "EndofRoadTest", "OnSidewalkTest",
    "WrongLaneTest", "InRadiusRegionTest",
    "NoCrashStatisticsManager", "StatisticsManager", "RouteRecord",
    "PENALTY_VALUES", "NoCrashEvaluator", "WEATHERS", "TRAFFIC_TABLES",
    "LeaderboardEvaluator", "RouteIndexer", "RouteConfig", "view_results",
    "run_episode", "EpisodeResult", "parse_routes_file", "interpolate_route",
    "downsample_route", "ScenarioInjector", "ScenarioTrigger",
    "ParallelEvalRunner", "EvalTask", "Watchdog", "GameTime",
    "AgentError", "SensorReceivedNoData",
    "BasicScenario", "FollowLeadingVehicle", "DynamicObjectCrossing",
    "ControlLoss", "SCENARIO_CLASSES",
    "OpenScenario", "OpenScenarioConfiguration",
    "UnsupportedOpenScenarioFeature", "load_xosc",
    "EpisodeRecorder", "MetricsLog",
]

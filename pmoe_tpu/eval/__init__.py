from .criteria import (Criterion, CollisionTest, RouteCompletionTest,
                       RunningRedLightTest, InRouteTest, BlockedTest,
                       TimeoutTest, CriteriaTree)
from .statistics import (NoCrashStatisticsManager, StatisticsManager,
                         RouteRecord, PENALTY_VALUES)
from .nocrash import NoCrashEvaluator, WEATHERS, TRAFFIC_TABLES
from .leaderboard import LeaderboardEvaluator
from .route_indexer import RouteIndexer, RouteConfig
from .view_results import view_results

__all__ = [
    "Criterion", "CollisionTest", "RouteCompletionTest", "RunningRedLightTest",
    "InRouteTest", "BlockedTest", "TimeoutTest", "CriteriaTree",
    "NoCrashStatisticsManager", "StatisticsManager", "RouteRecord",
    "PENALTY_VALUES", "NoCrashEvaluator", "WEATHERS", "TRAFFIC_TABLES",
    "LeaderboardEvaluator", "RouteIndexer", "RouteConfig", "view_results",
]

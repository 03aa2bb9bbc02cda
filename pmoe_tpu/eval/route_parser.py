"""Leaderboard route XML parsing + GPS conversion + downsampling.

Functional rebuild of the reference's route tooling
(leaderboard/utils/route_parser.py:23-265 and route_manipulation.py:21-132):

* ``parse_routes_file`` — read ``<routes><route id town><waypoint x y z/>``
  XML into route configurations;
* ``interpolate_route`` — densify sparse waypoints to ~1 m hops with
  LANEFOLLOW/turn commands inferred from heading changes (the map-free
  equivalent of GlobalRoutePlanner tracing);
* ``downsample_route`` — the ~50x downsampled plan handed to agents
  (route_manipulation.py:106-132).
"""

from __future__ import annotations

import math
import xml.etree.ElementTree as ET
from pathlib import Path
from typing import List, Tuple

import numpy as np

from ..sim.interface import RoadOption, Route

__all__ = ["parse_routes_file", "interpolate_route", "downsample_route",
           "RouteDescription"]


class RouteDescription:
    def __init__(self, route_id: str, town: str,
                 waypoints: List[Tuple[float, float]]):
        self.route_id = route_id
        self.town = town
        self.waypoints = waypoints


def parse_routes_file(path: str | Path,
                      single_route: str | None = None) -> List[RouteDescription]:
    """reference route_parser.py:23-58."""
    routes = []
    tree = ET.parse(str(path))
    for route in tree.iter("route"):
        route_id = route.attrib.get("id", "")
        if single_route is not None and route_id != single_route:
            continue
        town = route.attrib.get("town", "Town01")
        wps = [(float(w.attrib["x"]), float(w.attrib["y"]))
               for w in route.iter("waypoint")]
        routes.append(RouteDescription(route_id, town, wps))
    return routes


def _turn_command(yaw_change: float) -> RoadOption:
    deg = math.degrees(yaw_change)
    if deg > 25:          # counterclockwise heading change
        return RoadOption.LEFT
    if deg < -25:
        return RoadOption.RIGHT
    return RoadOption.LANEFOLLOW


def interpolate_route(waypoints: List[Tuple[float, float]],
                      hop_resolution: float = 1.0) -> Route:
    """Densify to ~hop_resolution meters; infer turn commands near corners."""
    pts: List[Tuple[float, float]] = []
    opts: List[RoadOption] = []
    for i in range(len(waypoints) - 1):
        x0, y0 = waypoints[i]
        x1, y1 = waypoints[i + 1]
        dist = math.hypot(x1 - x0, y1 - y0)
        steps = max(int(dist / hop_resolution), 1)
        # heading change at the upcoming corner
        cmd = RoadOption.LANEFOLLOW
        if i + 2 < len(waypoints):
            x2, y2 = waypoints[i + 2]
            yaw1 = math.atan2(y1 - y0, x1 - x0)
            yaw2 = math.atan2(y2 - y1, x2 - x1)
            dyaw = (yaw2 - yaw1 + math.pi) % (2 * math.pi) - math.pi
            cmd = _turn_command(dyaw)
        for s in range(steps):
            u = s / steps
            pts.append((x0 + u * (x1 - x0), y0 + u * (y1 - y0)))
            near_corner = s >= steps - 10 and cmd != RoadOption.LANEFOLLOW
            opts.append(cmd if near_corner else RoadOption.LANEFOLLOW)
    pts.append(tuple(waypoints[-1]))
    opts.append(RoadOption.LANEFOLLOW)
    return Route(positions=np.asarray(pts, float), options=opts)


def downsample_route(route: Route, sample_factor: int = 50) -> Route:
    """Keep every Nth node plus every command-change node
    (reference route_manipulation.py:106-132 semantics)."""
    keep = []
    prev_cmd = None
    for i, cmd in enumerate(route.options):
        if i % sample_factor == 0 or cmd != prev_cmd or \
                i == len(route.options) - 1:
            keep.append(i)
        prev_cmd = cmd
    return Route(positions=route.positions[keep],
                 options=[route.options[i] for i in keep])

"""Leaderboard route XML parsing + GPS conversion + downsampling + the
per-town trigger-JSON scenario-annotation machinery.

Functional rebuild of the reference's route tooling
(leaderboard/utils/route_parser.py:23-330 and route_manipulation.py:21-132):

* ``parse_routes_file`` — read ``<routes><route id town><waypoint x y z/>``
  XML into route configurations;
* ``interpolate_route`` — densify sparse waypoints to ~1 m hops with
  LANEFOLLOW/turn commands inferred from heading changes (the map-free
  equivalent of GlobalRoutePlanner tracing);
* ``downsample_route`` — the ~50x downsampled plan handed to agents
  (route_manipulation.py:106-132);
* ``parse_annotations_file`` / ``scan_route_for_scenarios`` /
  ``scenario_sampling`` — the ``all_towns_traffic_scenarios.json`` trigger
  schema: per-town scenario annotations are position+heading-matched against
  the dense route (2 m / 10 deg thresholds, route_parser.py:19-20,125-265),
  deduplicated per trigger position, subtyped by the upcoming turn command
  (Scenario4/7/8/9), and one scenario is sampled per trigger with
  highest-number priority (route_scenario.py:307-360).
"""

from __future__ import annotations

import json
import math
import xml.etree.ElementTree as ET
from collections import OrderedDict
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..sim.interface import RoadOption, Route

__all__ = ["parse_routes_file", "interpolate_route", "downsample_route",
           "RouteDescription", "parse_annotations_file",
           "scan_route_for_scenarios", "scenario_sampling",
           "TRIGGER_THRESHOLD", "TRIGGER_ANGLE_THRESHOLD"]

#: reference route_parser.py:19-20
TRIGGER_THRESHOLD = 2.0          # meters: same-trigger / route-match distance
TRIGGER_ANGLE_THRESHOLD = 10.0   # degrees: heading agreement for a match


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


# ---------------------------------------------------------------------------
# trigger-JSON scenario annotations (all_towns_traffic_scenarios.json schema)
# ---------------------------------------------------------------------------

def parse_annotations_file(path: str | Path) -> "OrderedDict[str, list]":
    """``{"available_scenarios": [{"Town01": [...]}, ...]}`` -> town->scenarios
    (reference route_parser.py:30-45)."""
    with open(str(path)) as f:
        annotation_dict = json.load(f, object_pairs_hook=OrderedDict)
    final: "OrderedDict[str, list]" = OrderedDict()
    for town_dict in annotation_dict["available_scenarios"]:
        final.update(town_dict)
    return final


def _route_yaws(route: Route) -> np.ndarray:
    """Per-waypoint heading (degrees) of the dense route polyline."""
    d = np.diff(route.positions, axis=0)
    d = np.concatenate([d, d[-1:]], axis=0)
    return np.degrees(np.arctan2(d[:, 1], d[:, 0]))


def _match_world_location_to_route(waypoint: dict, route: Route,
                                   yaws: np.ndarray) -> Optional[int]:
    """First dense-route index within TRIGGER_THRESHOLD meters AND
    TRIGGER_ANGLE_THRESHOLD degrees of the annotated transform
    (reference route_parser.py:144-170)."""
    wx, wy = float(waypoint["x"]), float(waypoint["y"])
    wyaw = float(waypoint.get("yaw", 0.0))
    d = np.sqrt(((route.positions - (wx, wy)) ** 2).sum(-1))
    dyaw = (wyaw - yaws) % 360.0
    ok = (d < TRIGGER_THRESHOLD) & ((dyaw < TRIGGER_ANGLE_THRESHOLD)
                                    | (dyaw > 360.0 - TRIGGER_ANGLE_THRESHOLD))
    hits = np.where(ok)[0]
    return int(hits[0]) if hits.size else None


def _get_scenario_subtype(scenario: str, match_position: int,
                          route: Route) -> Optional[str]:
    """Turn-dependent subtype (reference route_parser.py:196-263): scan the
    route ahead of the trigger for the first turn command; Scenario4/7/8/9
    are only viable for specific upcoming turns."""
    turn_needs = {
        "Scenario4": {RoadOption.LEFT: "S4left", RoadOption.RIGHT: "S4right"},
        "Scenario7": {RoadOption.LEFT: "S7left", RoadOption.RIGHT: "S7right",
                      RoadOption.STRAIGHT: "S7opposite"},
        "Scenario8": {RoadOption.LEFT: "S8left"},
        "Scenario9": {RoadOption.RIGHT: "S9right"},
    }
    if scenario not in turn_needs:
        return "valid"
    for opt in route.options[match_position:]:
        if opt in (RoadOption.LANEFOLLOW, RoadOption.CHANGELANELEFT,
                   RoadOption.CHANGELANERIGHT):
            continue
        return turn_needs[scenario].get(opt)
    return None


def scan_route_for_scenarios(town: str, route: Route,
                             annotations: Dict[str, list]
                             ) -> "OrderedDict[int, list]":
    """Match every annotated trigger of ``town`` against the route; returns
    ``{trigger_id: [scenario_definition, ...]}`` where a definition is
    ``{name, other_actors, trigger_position, scenario_type, match_position}``
    (reference route_parser.py:265-326)."""
    yaws = _route_yaws(route)
    existent_triggers: "OrderedDict[int, dict]" = OrderedDict()
    possible: "OrderedDict[int, list]" = OrderedDict()
    latest_id = 0
    for scenario in annotations.get(town, []):
        name = scenario["scenario_type"]
        for event in scenario.get("available_event_configurations", []):
            waypoint = {k: float(v) for k, v in event["transform"].items()}
            pos = _match_world_location_to_route(waypoint, route, yaws)
            if pos is None:
                continue
            subtype = _get_scenario_subtype(name, pos, route)
            if subtype is None:
                continue
            definition = {
                "name": name,
                "other_actors": event.get("other_actors"),
                "trigger_position": waypoint,
                "scenario_type": subtype,
                "match_position": pos,
            }
            # same-position trigger dedup (route_parser.py:125-142)
            trig_id = None
            for tid, trig in existent_triggers.items():
                dd = math.hypot(trig["x"] - waypoint["x"],
                                trig["y"] - waypoint["y"])
                dyaw = (trig.get("yaw", 0.0) - waypoint.get("yaw", 0.0)) % 360
                if dd < TRIGGER_THRESHOLD \
                        and (dyaw < TRIGGER_ANGLE_THRESHOLD
                             or dyaw > 360 - TRIGGER_ANGLE_THRESHOLD):
                    trig_id = tid
                    break
            if trig_id is None:
                existent_triggers[latest_id] = waypoint
                possible[latest_id] = []
                trig_id = latest_id
                latest_id += 1
            possible[trig_id].append(definition)
    return possible


def scenario_sampling(possible: "OrderedDict[int, list]",
                      seed: int = 0) -> List[dict]:
    """One scenario per trigger, highest Scenario-number first, no two
    scenarios at the same position (reference route_scenario.py:307-360)."""
    rng = np.random.default_rng(seed)

    def number(defn):
        try:
            return int(defn["name"].split("Scenario")[1])
        except (IndexError, ValueError):
            return -1

    def same_position(a, b):
        ta, tb = a["trigger_position"], b["trigger_position"]
        return (math.hypot(ta["x"] - tb["x"], ta["y"] - tb["y"])
                < TRIGGER_THRESHOLD)

    sampled: List[dict] = []
    for trigger in possible:
        candidates = list(possible[trigger])
        choice = max(candidates, key=number)
        candidates.remove(choice)
        while any(same_position(choice, s) for s in sampled):
            if not candidates:
                choice = None
                break
            choice = candidates[int(rng.integers(len(candidates)))]
            candidates.remove(choice)
        if choice is not None:
            sampled.append(choice)
    return sampled

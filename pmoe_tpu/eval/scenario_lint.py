"""Scenario-annotation validation CLI
(reference /root/reference/PMoE/leaderboard/scripts/set_new_scenarios.py).

The reference script exists to sanity-check new entries in
``all_towns_traffic_scenarios.json``: it draws every trigger point into a
live CARLA world, color-coded by scenario type, and flags triggers that sit
closer than the route matcher's thresholds (``apart_enough``,
set_new_scenarios.py:23-38 — the same 4 m / 10 deg gate
``route_parser.py:125-265`` uses at runtime). Without a display, the useful
part is the *validation*: this CLI loads a trigger-annotation JSON and a
route library and reports, per town —

* trigger counts by scenario type;
* intra-type trigger pairs closer than the match thresholds (they would
  alias to the same route position at injection time);
* per route: which triggers the runtime matcher (`scan_route_for_scenarios`)
  would attach, and how many triggers match NO shipped route.
"""

from __future__ import annotations

import argparse
import sys
from collections import Counter
from pathlib import Path

import numpy as np

from .route_parser import (interpolate_route, parse_annotations_file,
                           parse_routes_file, scan_route_for_scenarios)

__all__ = ["lint", "main"]

TRIGGER_THRESHOLD = 4.0        # metres (set_new_scenarios.py:29)
TRIGGER_ANGLE_THRESHOLD = 10.0  # degrees (set_new_scenarios.py:30)


def _close_pairs(triggers):
    """Intra-type trigger pairs under the distance+angle gate."""
    pairs = []
    for i in range(len(triggers)):
        for j in range(i + 1, len(triggers)):
            a, b = triggers[i], triggers[j]
            d = float(np.hypot(float(a["x"]) - float(b["x"]),
                               float(a["y"]) - float(b["y"])))
            dyaw = abs((float(a.get("yaw", 0.0)) - float(b.get("yaw", 0.0))
                        + 180.0) % 360.0 - 180.0)
            if d < TRIGGER_THRESHOLD and dyaw < TRIGGER_ANGLE_THRESHOLD:
                pairs.append((i, j, d))
    return pairs


def lint(annotations_path: str, routes_path: str | None = None) -> str:
    towns = parse_annotations_file(annotations_path)
    out = []
    routes = []
    if routes_path:
        for route in parse_routes_file(routes_path):
            route.route = interpolate_route(route.waypoints)
            routes.append(route)

    matched_ids = set()
    for town, scenarios in towns.items():
        counts = Counter()
        dup_report = []
        for entry in scenarios:
            stype = entry.get("scenario_type", "?")
            triggers = [ev["transform"] if "transform" in ev else ev
                        for ev in entry.get("available_event_configurations",
                                            [])]
            counts[stype] += len(triggers)
            for i, j, d in _close_pairs(triggers):
                dup_report.append(
                    f"  DUP {stype}: triggers #{i} and #{j} are {d:.1f} m "
                    f"apart (< {TRIGGER_THRESHOLD} m, same heading) — they "
                    f"alias at injection time")
        out.append(f"== {town}: {sum(counts.values())} triggers ==")
        for stype, n in sorted(counts.items()):
            out.append(f"  {stype}: {n}")
        out.extend(dup_report)

        for route in routes:
            if route.town != town:
                continue
            found = scan_route_for_scenarios(town, route.route,
                                             {town: scenarios})
            n_defs = sum(len(v) for v in found.values())
            for defs in found.values():
                for d in defs:
                    t = d.get("trigger_position", {})
                    matched_ids.add((town, round(float(t.get("x", 0)), 1),
                                     round(float(t.get("y", 0)), 1)))
            out.append(f"  route {route.route_id}: {n_defs} triggers matched "
                       f"at {len(found)} route positions")

    if routes:
        all_ids = set()
        for town, scenarios in towns.items():
            for entry in scenarios:
                for ev in entry.get("available_event_configurations", []):
                    t = ev.get("transform", ev)
                    all_ids.add((town, round(float(t.get("x", 0)), 1),
                                 round(float(t.get("y", 0)), 1)))
        unmatched = len(all_ids - matched_ids)
        out.append(f"== coverage: {len(all_ids) - unmatched}/{len(all_ids)} "
                   f"trigger positions reachable from the shipped routes ==")
    text = "\n".join(out) if out else "(no annotations found)"
    return text


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Validate a scenario trigger-annotation JSON against the "
                    "route library (reference set_new_scenarios.py, minus "
                    "the live-world debug drawing).")
    parser.add_argument("-f", "--file", required=True,
                        help="trigger annotations JSON "
                             "(all_towns_traffic_scenarios schema)")
    parser.add_argument("-r", "--routes",
                        help="routes XML to check matcher coverage against")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    if not Path(args.file).exists():
        print(f"[Error] no such file: {args.file}")
        return 1
    print(lint(args.file, args.routes))
    return 0


if __name__ == "__main__":
    sys.exit(main())

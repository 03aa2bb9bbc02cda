"""NoCrash benchmark results printer
(reference /root/reference/PMoE/eval/view_benchmark_results.py).

Reads the episode CSVs and prints Success Rate (% episodes with
route_completion == 100), Route Completion, or Lights-Ran-per-hour per
town x traffic x weather-set (view_benchmark_results.py:39-62).
"""

from __future__ import annotations

import csv
import sys
from itertools import product
from pathlib import Path

import numpy as np

__all__ = ["view_results", "main"]

TOWNS = ["Town01", "Town02"]
TRAFFICS = ["Empty", "Regular", "Dense"]
WEATHERS = {1: "train", 3: "train", 6: "train", 8: "train",
            10: "test", 14: "test"}
METRICS = ["Success Rate", "Route Completion", "Lights Ran"]


def _load_runs(log_dir: str):
    finished = {}
    for p in Path(log_dir).glob("*.csv"):
        with open(p) as f:
            for row in csv.DictReader(f):
                weather_set = WEATHERS.get(int(row["weather"]), "train")
                key = (row["town"], int(row["traffic"]), weather_set)
                finished.setdefault(key, []).append((
                    float(row["route_completion"]), int(row["lights_ran"]),
                    float(row["duration"])))
    return finished


def _fmt_table(rows) -> str:
    widths = [max(len(str(r[i])) for r in rows) for i in range(len(rows[0]))]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep]
    for r in rows:
        out.append("| " + " | ".join(str(c).ljust(w)
                                     for c, w in zip(r, widths)) + " |")
        out.append(sep)
    return "\n".join(out)


def view_results(log_dir: str, metric: str = "Success Rate",
                 echo: bool = True, routes_per_town: int = 25) -> str:
    """Render the per-town tables; ``echo=False`` suppresses the print so
    programmatic callers (tools/nocrash_benchmark.py incremental renders)
    don't spam stdout once per render.

    Completeness gate (ADVICE r3): a cell averages whatever episode rows
    exist, and the ordered task queue biases partial samples toward earlier
    routes — so every cell shows its episode count against the expected
    ``routes_per_town x weathers-in-group`` product and a partially-run cell
    is marked ``(partial)`` rather than silently rendering as finished."""
    finished = _load_runs(log_dir)
    output = []
    for town, weather_set in product(TOWNS, ("train", "test")):
        expected = routes_per_town * (4 if weather_set == "train" else 2)
        rows = [["Traffic", *TRAFFICS], [metric] + ["N/A"] * 3,
                ["Episodes"] + ["0/%d" % expected] * 3,
                ["Duration"] + ["N/A"] * 3]
        any_data = False
        for ti, traffic in enumerate(TRAFFICS):
            runs = finished.get((town, ti, weather_set), [])
            rows[2][ti + 1] = f"{len(runs)}/{expected}"
            if not runs:
                continue
            any_data = True
            partial = " (partial)" if len(runs) < expected else ""
            rc, lights, dur = map(np.array, zip(*runs))
            per_hour = lights / np.maximum(dur, 1e-9) * 3600
            if metric == "Success Rate":
                rows[1][ti + 1] = f"{100 * round(np.mean(rc == 100), 2)}%"
            elif metric == "Route Completion":
                rows[1][ti + 1] = f"{round(float(np.mean(rc)), 2)}%"
            elif metric == "Lights Ran":
                rows[1][ti + 1] = f"{round(float(np.mean(per_hour)), 2)} per hour"
            rows[1][ti + 1] += partial
            rows[3][ti + 1] = f"{round(float(np.mean(dur)), 2)}s"
        if any_data:
            output.append(f"========= Results of {town}, "
                          f"weather {weather_set} =========")
            output.append(_fmt_table(rows))
    text = "\n".join(output) if output else "(no results found)"
    if echo:
        print(text)
    return text


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("log_dir", nargs="?", default="benchmark_results")
    parser.add_argument("--metric", default="Success Rate", choices=METRICS)
    args = parser.parse_args(argv)
    view_results(args.log_dir, args.metric)


if __name__ == "__main__":
    main()

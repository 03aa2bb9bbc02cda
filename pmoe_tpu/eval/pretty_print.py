"""Human-readable printer for leaderboard result JSONs
(reference /root/reference/PMoE/leaderboard/scripts/pretty_print_json.py).

Reads the ``_checkpoint`` JSON written by :class:`StatisticsManager.save`
(and by ``evaluate.py`` / ``parallel_runner``) and prints:

* route progress (``finished_routes / total_routes``);
* global average metrics (score_composed / score_route / score_penalty);
* total infraction counts;
* a per-route analysis table — scores, infractions with per-km rates
  (reference pretty_print_json.py:63-66), durations, distance driven.

The reference script depends on ``dictor`` + ``tabulate``; this one is
dependency-free (same simple grid the NoCrash printer uses).
"""

from __future__ import annotations

import json
import sys

__all__ = ["prettify", "main"]


def _grid(rows) -> str:
    rows = [[("" if c is None else str(c)) for c in r] for r in rows]
    ncol = max(len(r) for r in rows)
    rows = [r + [""] * (ncol - len(r)) for r in rows]
    widths = [max(len(r[i]) for r in rows) for i in range(ncol)]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep]
    for r in rows:
        out.append("| " + " | ".join(c.ljust(w) for c, w in zip(r, widths))
                   + " |")
        out.append(sep)
    return "\n".join(out)


def prettify(path: str) -> str:
    data = json.load(open(path))
    ckpt = data.get("_checkpoint", {})
    records = ckpt.get("records", [])
    glob = ckpt.get("global_record", {})
    out = []

    total = glob.get("total_routes")
    finished = glob.get("finished_routes")
    if finished is not None and total:
        out.append(f"* {100.0 * finished / total:.1f}% "
                   f"({finished}/{total}) routes completed\n")
    sensors = data.get("sensors")
    if sensors:
        out.append("* The agent used the following sensors: "
                   + ", ".join(sensors) + "\n")

    scores = glob.get("scores", {})
    if scores:
        out.append("=== Global average metrics: ===")
        out.append(_grid([[k, f"{v:.3f}"] for k, v in scores.items()]))
        out.append("")
    infractions = glob.get("infractions", {})
    if infractions:
        out.append("=== Total infractions: ===")
        out.append(_grid([[k, v] for k, v in infractions.items()]))
        out.append("")

    if records:
        rows = [["metric", "value", "additional information"]]
        tot_game = tot_sys = tot_km = 0.0
        for r in records:
            meta = r.get("meta", {})
            r_scores = r.get("scores", {})
            km = (0.01 * r_scores.get("score_route", 0.0)
                  * meta.get("route_length", 0.0) / 1000.0)
            rows.append([str(r.get("route_id", r.get("index", "?"))), "", ""])
            rows += [[k, f"{v:.3f}", ""] for k, v in r_scores.items()]
            for kind, events in r.get("infractions", {}).items():
                rate = len(events) / km if km > 0 else float(len(events))
                rows.append([kind, f"{rate:.3f} ({len(events)} occurrences)",
                             "; ".join(str(e) for e in events[:3])])
            game = float(meta.get("duration_game", 0.0))
            system = float(meta.get("duration_system", 0.0))
            rows.append(["duration game", f"{game:.3f}", "seconds"])
            if system:
                rows.append(["duration system", f"{system:.3f}", "seconds"])
            rows.append(["distance driven", f"{km:.3f}", "Km"])
            rows.append(["", "", ""])
            tot_game += game
            tot_sys += system
            tot_km += km
        rows.append(["total duration_game", f"{tot_game:.3f}", "seconds"])
        if tot_sys:
            rows.append(["total duration_system", f"{tot_sys:.3f}", "seconds"])
        rows.append(["total distance driven", f"{tot_km:.3f}", "Km"])
        out.append("==== Per-route analysis: ===")
        out.append(_grid(rows))

    text = "\n".join(out) if out else "(empty results file)"
    return text


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="Create a human readable version of the scores provided "
                    "by the leaderboard.")
    parser.add_argument("-f", "--file", required=True,
                        help="JSON file containing the leaderboard results")
    parser.add_argument("-o", "--output",
                        help="Output file to print the results into")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    text = prettify(args.file)
    if args.output:
        with open(args.output, "w") as fd:
            fd.write(text)
    else:
        print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())

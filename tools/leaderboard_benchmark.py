"""Publish the leaderboard-protocol benchmark artifact (VERDICT r2 item 2).

Runs `./run.sh benchmark` semantics (pmoe_tpu.eval.evaluate) over the shipped
route library (all 21 routes across the 8-town grid set, trigger-JSON
scenario injection on) with a trained agent checkpoint, then renders the
global + per-route composed scores (route_completion x penalties —
reference statistics_manager.py:122-207,253-331) through the pretty_print
CLI into LEADERBOARD_RESULTS.md, next to the raw checkpoint JSON.

Usage: python tools/leaderboard_benchmark.py
         [--conf logs/nocrash_r3/benchmark_agent.yaml]
         [--out LEADERBOARD_RESULTS.md] [--max-ticks 4000] [--routes N]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/pmoe_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", default="logs/nocrash_r3/benchmark_agent.yaml")
    ap.add_argument("--out", default="LEADERBOARD_RESULTS.md")
    ap.add_argument("--checkpoint-json",
                    default="logs/leaderboard_r3/simulation_results.json")
    ap.add_argument("--max-ticks", type=int, default=4000)
    ap.add_argument("--routes", type=int, default=None)
    args = ap.parse_args()

    import yaml

    from pmoe_tpu.eval import evaluate

    ck = Path(args.checkpoint_json)
    ck.parent.mkdir(parents=True, exist_ok=True)

    # point env.checkpoint at our artifact path via a derived conf
    conf = yaml.safe_load(Path(args.conf).read_text())
    conf.setdefault("env", {})["checkpoint"] = str(ck)
    conf["env"]["resume"] = ck.exists()
    run_conf = ck.parent / "leaderboard_agent.yaml"
    run_conf.write_text(yaml.safe_dump(conf))

    argv = ["--config", str(run_conf), "--backend", "fake",
            "--max-ticks", str(args.max_ticks), "--resume"]
    if args.routes:
        argv += ["--routes", str(args.routes)]
    t0 = time.perf_counter()
    evaluate.main(argv)
    wall = time.perf_counter() - t0

    # render through the pretty_print CLI (scripts/pretty_print_json parity)
    from pmoe_tpu.eval import pretty_print

    buf = io.StringIO()
    with redirect_stdout(buf):
        pretty_print.main(["-f", str(ck)])
    tables = buf.getvalue()

    records = json.loads(ck.read_text())
    glob = records.get("_checkpoint", {}).get("global_record", {})
    n_routes = len(records.get("_checkpoint", {}).get("records", []))
    scores = glob.get("scores", {})
    model_dir = conf["model"]["actor"].get("model_dir", "")

    Path(args.out).write_text(f"""# Leaderboard benchmark results

Produced by `python tools/leaderboard_benchmark.py` — the CARLA-leaderboard
protocol (`./run.sh benchmark`): the shipped {n_routes}-route / 8-town route
library (`pmoe_tpu/assets/routes/routes_all.xml`) with trigger-JSON
adversarial scenario injection
(`pmoe_tpu/assets/scenarios/all_towns_traffic_scenarios.json`), driven by the
stage-2 behavior-cloned agent (`{model_dir}`) on the fake backend, scored by
the leaderboard's composed metric (route completion x multiplicative
infraction penalties; reference statistics_manager.py:122-207). Raw records:
`{ck}`. Wall time {wall:.0f}s.

## Global scores

| metric | value |
|---|---|
| score_composed | {scores.get('score_composed', float('nan')):.3f} |
| score_route | {scores.get('score_route', float('nan')):.3f} |
| score_penalty | {scores.get('score_penalty', float('nan')):.3f} |

## Per-route tables (pretty_print)

```
{tables}
```
""")
    print(f"[leaderboard] wrote {args.out} "
          f"(global composed {scores.get('score_composed')})")


if __name__ == "__main__":
    main()

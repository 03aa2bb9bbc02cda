"""NoCrash grid for the PMoE flagship checkpoint (VERDICT r4 item 2).

Runs the same fleet protocol as tools/nocrash_benchmark.py (traffic x route
x weather x town product, CSV-resumable, cell-robin ordering) but with the
pmoe agent conf produced by tools/pmoe_chain.py, writing per-cell CSVs to a
separate results dir and rendering the three tables into RESULTS_PMOE.md —
the benchmark columns for the model the framework is named for
(reference conf/stage_2_pmoe.yaml, model/moe.py:326-363).

Usage: python tools/pmoe_grid.py [--conf logs/pmoe_r5/pmoe_agent.yaml]
         [--workdir logs/pmoe_r5] [--fleet 10] [--routes N]
         [--out RESULTS_PMOE.md]
"""

from __future__ import annotations

import argparse
import importlib.util
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/pmoe_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

spec = importlib.util.spec_from_file_location(
    "nb", Path(__file__).resolve().parent / "nocrash_benchmark.py")
nb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(nb)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", default="logs/pmoe_r5/pmoe_agent.yaml")
    ap.add_argument("--workdir", default="logs/pmoe_r5")
    ap.add_argument("--towns", nargs="+", default=["Town01", "Town02"])
    ap.add_argument("--weathers", nargs="+", default=["train", "test"])
    ap.add_argument("--routes", type=int, default=None)
    ap.add_argument("--fleet", type=int, default=10)
    ap.add_argument("--max-ticks", type=int, default=4000)
    ap.add_argument("--traffic-order", default="0,1,2")
    ap.add_argument("--cell-robin", action="store_true", default=True)
    ap.add_argument("--arch", default="resnet18")
    ap.add_argument("--max-episodes", type=int, default=None)
    ap.add_argument("--label", default=None,
                    help="table caption (default: the pmoe wording); lets "
                         "this standalone fleet-protocol runner serve any "
                         "agent conf, e.g. the moe benchmark checkpoint")
    ap.add_argument("--out", default="RESULTS_PMOE.md")
    args = ap.parse_args()

    conf = Path(args.conf)
    assert conf.exists(), f"no pmoe agent conf at {conf} (run pmoe_chain)"
    results_dir = Path(args.workdir) / "results"
    results_dir.mkdir(parents=True, exist_ok=True)
    nb.run_fleet_protocol(args, conf, results_dir)
    nb.render(results_dir,
              args.label or f"pmoe ({args.arch} MoE + PU-Net expert)",
              args.out, routes=args.routes, echo=True)


if __name__ == "__main__":
    main()

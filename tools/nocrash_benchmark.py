"""Full NoCrash benchmark protocol: train a checkpoint, run the official
evaluator across towns x weathers x traffic, render the reference's tables.

The reference computes its NoCrash headline numbers at run time from the
episode CSVs (/root/reference/PMoE/eval/view_benchmark_results.py:39-62;
CSV schema runners/nocrash_runner.py:34-43) — it publishes none. This tool
produces the same artifact end-to-end on THIS framework: expert data
collection -> stage-2 behavior cloning -> the NoCrash protocol
(traffic {empty,regular,dense} x suite routes x weather group, per town)
through the official CLI path (pmoe_tpu.eval.evaluate_nocrash) -> the
Success Rate / Route Completion / Lights Ran tables, written to RESULTS.md.

Training data comes from Town01 only; Town02 and the test weathers are
held out — the same train/test split the NoCrash benchmark defines.

Usage:
  python tools/nocrash_benchmark.py --workdir logs/nocrash_bench \
      [--towns Town01 Town02] [--weathers train test] [--routes N]
      [--episodes 8] [--epochs 10] [--arch resnet18] [--max-ticks 1500]
      [--out RESULTS.md]

Resumable: collection, training, and finished episodes (CSV resume) are all
skipped when their artifacts already exist in --workdir.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/pmoe_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import yaml


def model_cfg(arch: str, n_experts: int = 2):
    mlp = lambda dims, act="relu", l_act=False: {
        "dims": dims, "act": act, "l_act": l_act, "bn": False, "dropout": 0.0}
    return {
        "type": "moe", "n_experts": n_experts, "loss_coefs": [0.7, 0.3],
        "speed_encoder": mlp([1, 128, 512]),
        "command_encoder": mlp([6, 128, 512]),
        "speed_prediction": mlp([1536, 128, 1]),
        "action_head": mlp([1536, 128, 512], "elu", True),
        "backbone": {"type": "rgb", "n_frames": 4,
                     "rgb": {"arch": arch, "pretrained": False,
                             "gamma": 2, "b": 1}},
    }


def _training_routes(backend, episodes: int):
    """Diverse Town01 training spawn pairs: every valid ordered pair >= 80 m,
    EXCLUDING the benchmark suite's 25 pairs (the protocol only demands
    same-town/train-weather data; holding the eval routes out keeps the
    benchmark honest), shuffled deterministically, cycled to ``episodes``."""
    from pmoe_tpu.eval.nocrash import default_suite_path, load_suite

    suite = set(load_suite(default_suite_path(backend.town)) or [])
    spawn = backend.spawn_points()
    pairs = []
    for a in range(len(spawn)):
        for b in range(len(spawn)):
            if a == b or (a, b) in suite:
                continue
            (ax, ay), (bx, by) = spawn[a], spawn[b]
            if abs(bx - ax) + abs(by - ay) >= 80.0:
                pairs.append((a, b))
    rng = np.random.default_rng(7)
    rng.shuffle(pairs)
    return [pairs[i % len(pairs)] for i in range(episodes)]


def collect(data_dir: Path, episodes: int, ticks: int,
            traffic_mix=None) -> int:
    """Collect expert episodes. ``traffic_mix`` is a list of
    (n_vehicles, n_pedestrians) cycled across episodes; when given, the
    privileged :class:`TrafficAwareExpert` drives (brakes for NPCs and red
    lights) so brake labels appear in the data — the round-3 root-cause gap
    (reference datasets carry brake labels, model/data_loader.py:216-243).
    With the default ``None`` the legacy traffic-blind follower collects
    empty-road data (round-3 recipe, kept for artifact reproducibility)."""
    from pmoe_tpu.agents.collector_agent import (TrafficAwareExpert,
                                                 collect_episode)
    from pmoe_tpu.sim.fake_carla import FakeCarlaBackend

    if data_dir.exists() and any(data_dir.iterdir()):
        print(f"[bench] reusing collected data in {data_dir}")
        return -1
    backend = FakeCarlaBackend(img_width=800, img_height=600, render_seg=True)
    routes = _training_routes(backend, episodes)
    # noise curriculum: clean passes anchor the policy, noisy passes add the
    # recovery states behavior cloning otherwise never sees (the reference's
    # noisy-expert collection idea, random_collector.py)
    noise = [0.0, 0.03, 0.08, 0.12]
    agent_cls = TrafficAwareExpert if traffic_mix is not None else None
    total = 0
    for ep, (start, target) in enumerate(routes):
        cars, peds = traffic_mix[ep % len(traffic_mix)] if traffic_mix \
            else (0, 0)
        total += collect_episode(
            backend, str(data_dir), f"episode_{ep:03d}",
            start_idx=start, target_idx=target,
            weather=[1, 3, 6, 8][ep % 4],   # train weathers only
            max_ticks=ticks, noise_std=noise[ep % len(noise)], seed=ep,
            agent_cls=agent_cls, n_vehicles=cars, n_pedestrians=peds)
        print(f"[bench] ep{ep:03d} {start}->{target} cars={cars} peds={peds} "
              f"-> {total} frames total", flush=True)
    print(f"[bench] collected {total} frames over {episodes} episodes")
    return total


def train(data_dir: Path, ckpt_dir: Path, arch: str, epochs: int,
          batch: int, load: str = "") -> Path:
    ckpt = ckpt_dir / "moe-best.ckpt"
    if ckpt.exists():
        print(f"[bench] reusing checkpoint {ckpt}")
        return ckpt
    from pmoe_tpu.trainer.train_2 import Learner
    from pmoe_tpu.utils import Config

    ds = {"root": str(data_dir), "crop": [125, 90], "resize": [224, 224],
          "seed": 0, "aug_type": "medium", "batch_size": batch,
          "boost": 1, "n_commands": 6, "speed_factor": 10,
          "past_frames": 4, "future_frames": 1,
          "boost_turns": 4,      # turn windows are ~3% of a route: replicate
                                 # them so the loss learns the hard control
          "thin_stopped": 12,    # waiting out a red light records ~200
                                 # near-identical stopped windows per cycle:
                                 # keep 1 in 12 (brake ONSETS never thinned)
                                 # — fixes both pedal-loss imbalance and the
                                 # device pool's ~6 GB HBM ceiling
          "device_pool": True,   # dataset-in-HBM: frames upload once,
                                 # batches carry int32 ids (the streaming
                                 # path re-uploads ~38 MB/step — measured
                                 # 1.1 s/step through the tunneled link)
          "pool_budget_gib": 8.6}
                                 # THIS step's measured HLO temp is 6.08 G
                                 # at b64 (r5 session-2 compile OOM:
                                 # 11.76 G pool args + 6.08 G temp + 0.26 G
                                 # reserved > 15.75 G) — the generic 11.5
                                 # default assumes the ~3 G temp of lighter
                                 # steps
    cfg = {
        "train_params": {"epochs": epochs, "optimizer": "adam",
                         "save_every": max(epochs, 1), "swa_start": 10**9,
                         "grad_clipping": 1.0, "start_saving_best": 0},
        "logger": {"disabled": True},
        "dataloader": {"batch_size": batch, "shuffle": True},
        "directory": {"model_name": "moe", "save": str(ckpt_dir),
                      # warm start: restore_from grafts model+batch_stats+
                      # opt state and resumes the epoch counter, so epochs
                      # must exceed the loaded ckpt's epoch to train
                      "load": str(load)},
        "adam": {"lr": 3e-4, "betas": [0.9, 0.999], "eps": 1e-8,
                 "weight_decay": 0, "amsgrad": False},
        "SWA": {"swa_lr": 5e-4},
        # val at stride 8: the L1 metric stabilizes with ~1/8 of the
        # windows, and a full-size val epoch doubled wall time per epoch
        "dataset": ds, "val_dataset": dict(ds, stride=8),
        "model": model_cfg(arch),
    }
    learner = Learner(Config(cfg))
    t0 = time.perf_counter()
    learner.train()
    assert ckpt.exists(), "training produced no best checkpoint"
    print(f"[bench] trained {learner.iteration} steps "
          f"in {time.perf_counter() - t0:.0f}s -> {ckpt}")
    return ckpt


def write_agent_conf(path: Path, ckpt: Path, arch: str) -> Path:
    conf = {
        "sensors": {"img_width": 800, "img_height": 600},
        "logger": {"disabled": True},
        "model": {"actor": dict(model_cfg(arch), n_commands=6,
                                model_dir=str(ckpt))},
    }
    path.write_text(yaml.safe_dump(conf))
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="logs/nocrash_bench")
    ap.add_argument("--towns", nargs="+", default=["Town01", "Town02"])
    ap.add_argument("--weathers", nargs="+", default=["train", "test"])
    ap.add_argument("--routes", type=int, default=None,
                    help="limit suite routes per town")
    ap.add_argument("--episodes", type=int, default=48)
    ap.add_argument("--traffic-data", action="store_true",
                    help="collect with the privileged TrafficAwareExpert "
                         "over a traffic curriculum (empty/regular/dense "
                         "NPC counts cycled) instead of the traffic-blind "
                         "follower on empty roads")
    ap.add_argument("--ticks", type=int, default=2500)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--arch", default="resnet18")
    ap.add_argument("--max-ticks", type=int, default=4000)
    ap.add_argument("--fleet", type=int, default=0,
                    help="run the protocol through the batched fleet runner "
                         "with N lockstep slots (eval/fleet.py)")
    ap.add_argument("--traffic-order", default="0,1,2",
                    help="fleet task ordering by traffic level (e.g. 1,2,0 "
                         "runs Regular and Dense cells before Empty — "
                         "partial-run insurance for the newest cells)")
    ap.add_argument("--cell-robin", action="store_true",
                    help="order tasks route-major across ALL cells (after k "
                         "routes every town x weather x traffic cell has k "
                         "routes of data) — an interrupted run leaves every "
                         "cell populated and marked partial instead of "
                         "whole cells N/A")
    ap.add_argument("--max-episodes", type=int, default=None,
                    help="time-budget cap on pending fleet episodes "
                         "(pairs with --cell-robin: every cell stays "
                         "populated, marked partial)")
    ap.add_argument("--out", default=None, help="write the tables here")
    args = ap.parse_args()

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    results_dir = work / "results"

    # traffic curriculum: half empty (red-light discipline still applies —
    # the privileged expert stops at reds even with no NPCs), the rest split
    # regular/dense (Town01 NoCrash tables, eval/nocrash.py TRAFFIC_TABLES)
    mix = ([(0, 0), (20, 50), (0, 0), (100, 200), (20, 50), (0, 0)]
           if args.traffic_data else None)
    collect(work / "data", args.episodes, args.ticks, traffic_mix=mix)
    ckpt = train(work / "data", work / "ckpt", args.arch, args.epochs,
                 args.batch)
    conf = write_agent_conf(work / "benchmark_agent.yaml", ckpt, args.arch)

    if args.fleet:
        run_fleet_protocol(args, conf, results_dir)
    else:
        from pmoe_tpu.eval import evaluate_nocrash

        for town in args.towns:
            for weather in args.weathers:
                print(f"[bench] === {town} / {weather} weathers ===")
                t0 = time.perf_counter()
                argv = ["--town", town, "--weather", weather,
                        "--config", str(conf), "--backend", "fake",
                        "--log-dir", str(results_dir), "--resume",
                        "--max-ticks", str(args.max_ticks)]
                if args.routes is not None:
                    argv += ["--routes", str(args.routes)]
                evaluate_nocrash.main(argv)
                print(f"[bench] {town}/{weather} done "
                      f"in {time.perf_counter() - t0:.0f}s")
                # incremental render: an interrupted run still leaves
                # tables for everything finished so far (CSV resume)
                render(results_dir, args.arch, args.out, routes=args.routes)

    render(results_dir, args.arch, args.out, routes=args.routes, echo=True)


class _StatsRouter:
    """Route fleet episode rows to the correct (town, weather-group) CSV —
    one combined lockstep run covers the whole protocol, one compile."""

    def __init__(self, managers):
        self.managers = managers          # (town, group) -> stats manager

    @staticmethod
    def group(weather: int) -> str:
        return "train" if weather in (1, 3, 6, 8) else "test"

    def log(self, town, traffic, weather, s, t, rc, lights, dur) -> None:
        self.managers[(town, self.group(weather))].log(
            town, traffic, weather, s, t, rc, lights, dur)

    def close(self) -> None:
        for m in self.managers.values():
            m.close()


def run_fleet_protocol(args, conf, results_dir) -> None:
    """The full traffic x route x weather x town product through ONE fleet
    run (eval/fleet.py): every episode slot shares the single jitted batched
    sample; empty-traffic cells order first (build_tasks traffic ordering)."""
    from pmoe_tpu.eval.fleet import FleetNoCrashRunner, build_tasks
    from pmoe_tpu.eval.nocrash import (TRAIN_WEATHERS, TEST_WEATHERS,
                                       default_suite_path, load_suite)
    from pmoe_tpu.eval.statistics import NoCrashStatisticsManager
    from pmoe_tpu.utils import get_conf

    managers = {}
    tasks = []
    for town in args.towns:
        routes = load_suite(default_suite_path(town))
        if args.routes is not None:
            routes = routes[:args.routes]
        for group in args.weathers:
            weathers = TRAIN_WEATHERS if group == "train" else TEST_WEATHERS
            stats = NoCrashStatisticsManager(str(results_dir), town, group,
                                             resume=True)
            managers[(town, group)] = stats
            tasks.extend(build_tasks(town, routes, weathers, stats))
    # traffic-major order globally, sequence set by --traffic-order;
    # --cell-robin instead interleaves routes across every cell
    order = {int(t): i for i, t in
             enumerate(args.traffic_order.split(","))}
    route_rank = {}
    for town in args.towns:
        suite = load_suite(default_suite_path(town)) or []
        for r, pair in enumerate(suite):
            route_rank[(town, pair[0], pair[1])] = r
    if args.cell_robin:
        tasks.sort(key=lambda t: (
            route_rank.get((t.town, t.start_idx, t.target_idx), 99),
            order.get(t.traffic_idx, t.traffic_idx), t.town, t.weather))
    else:
        tasks.sort(key=lambda t: order.get(t.traffic_idx, t.traffic_idx))
    router = _StatsRouter(managers)
    cap = getattr(args, "max_episodes", None)
    if cap and len(tasks) > int(cap):
        # time-budgeted slice: with --cell-robin ordering the first N tasks
        # cover every town x weather x traffic cell route-major, so a capped
        # run leaves all cells populated (marked partial by the
        # completeness gate) instead of whole cells N/A
        print(f"[bench] time-budget cap: running first {cap} of "
              f"{len(tasks)} pending episodes")
        tasks = tasks[: int(cap)]
    print(f"[bench] fleet protocol: {len(tasks)} episodes pending, "
          f"{args.fleet} slots")
    runner = FleetNoCrashRunner(get_conf(str(conf)), n_slots=args.fleet,
                                max_ticks=args.max_ticks)
    t0 = time.perf_counter()
    try:
        runner.run(tasks, router)
    finally:
        router.close()
    print(f"[bench] fleet protocol done in {time.perf_counter() - t0:.0f}s")


def render(results_dir: Path, arch: str, out: str | None,
           routes: int | None = None, echo: bool = False) -> None:
    from pmoe_tpu.eval.view_results import view_results

    sections = []
    for metric in ("Success Rate", "Route Completion", "Lights Ran"):
        table = view_results(str(results_dir), metric, echo=False)
        sections.append(f"## {metric}\n\n```\n{table}\n```")
        if echo:
            print(f"\n=== {metric} ===\n{table}")
    scope = ("the full suite route set" if routes is None
             else f"the first {routes} suite route(s) per town")
    if out:
        Path(out).write_text(
            "# NoCrash benchmark results\n\n"
            "Produced by `python tools/nocrash_benchmark.py` — the NoCrash "
            "protocol (traffic {empty,regular,dense} x 25 suite routes x "
            f"weather group per town, over {scope}) on the fake backend "
            "through the parity-tested fleet runner (eval/fleet.py; parity "
            "pinned for empty AND Regular-traffic episodes), with a "
            f"stage-2 behavior-cloned checkpoint ({arch}; recipe + sha256 "
            "in checkpoints/README.md — Town01 train-weather data only, "
            "non-suite routes, collected by the privileged braking expert "
            "over a traffic curriculum (empty/regular/dense NPC counts, "
            "stop-at-red + time-headway brake labels, stopped-window "
            "thinning); Town02 and the test weathers are held out). "
            "Success Rate = mean(route_completion == 100) with "
            "terminal collisions failing the episode (reference "
            "view_benchmark_results.py:39-57 scoring). Cells not yet "
            "covered by the committed CSVs render N/A; the run is "
            "CSV-resumable (`--resume`).\n\n"
            + "\n\n".join(sections) + "\n")
        print(f"[bench] wrote {out}")


if __name__ == "__main__":
    main()

"""End-to-end framework demo: collect -> train stage-2 -> closed-loop eval.

Proves the whole pipeline learns, with no external simulator or data:
1. the scripted noisy expert collects episodes on the fake backend (the
   framework's dataset layout);
2. stage-2 trains a MoE action model on them (behavior cloning);
3. the NoCrash evaluator drives the TRAINED ImageAgent and an UNTRAINED one
   on held-out routes; the trained agent must achieve higher route completion.

Exercises: collector, datasets + native ingest, augmentation, jitted train
step, checkpointing, ImageAgent restore, waypointer, sensor hub, criteria,
statistics. Runs on CPU (tiny) or the TPU (full-size).

Usage: python tools/e2e_pipeline.py [--epochs 12] [--episodes 6] [--arch tiny]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/pmoe_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--episodes", type=int, default=6)
    ap.add_argument("--ticks", type=int, default=400)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--arch", default="tiny",
                    help="backbone arch (tiny for CPU, resnet18 on TPU)")
    ap.add_argument("--eval-ticks", type=int, default=1200)
    args = ap.parse_args()

    work = Path(args.workdir or tempfile.mkdtemp(prefix="pmoe_e2e_"))
    data_dir = work / "data"
    ckpt_dir = work / "ckpt"
    print(f"[e2e] workdir {work}")

    # -- 1. collect expert episodes ------------------------------------------
    from pmoe_tpu.agents.collector_agent import collect_episode
    from pmoe_tpu.sim.fake_carla import FakeCarlaBackend

    backend = FakeCarlaBackend(img_width=800, img_height=600, render_seg=True)
    n_spawn = len(backend.spawn_points())
    total = 0
    for ep in range(args.episodes):
        total += collect_episode(
            backend, str(data_dir), f"episode_{ep:03d}",
            start_idx=(3 * ep) % n_spawn, target_idx=(3 * ep + 4) % n_spawn,
            weather=[1, 3, 6, 8][ep % 4], max_ticks=args.ticks,
            noise_std=0.03, seed=ep)
    print(f"[e2e] collected {total} frames over {args.episodes} episodes")

    # -- 2. train a stage-2 MoE on the expert data ---------------------------
    from pmoe_tpu.trainer.train_2 import Learner
    from pmoe_tpu.utils import Config

    mlp = lambda dims, act="relu", l_act=False: {
        "dims": dims, "act": act, "l_act": l_act, "bn": False, "dropout": 0.0}
    model_cfg = {
        "type": "moe", "n_experts": 2, "loss_coefs": [0.7, 0.3],
        "speed_encoder": mlp([1, 128, 512]),
        "command_encoder": mlp([6, 128, 512]),
        "speed_prediction": mlp([1536, 128, 1]),
        "action_head": mlp([1536, 128, 512], "elu", True),
        "backbone": {"type": "rgb", "n_frames": 4,
                     "rgb": {"arch": args.arch, "pretrained": False,
                             "gamma": 2, "b": 1}},
    }
    ds = {"root": str(data_dir), "crop": [125, 90], "resize": [224, 224],
          "seed": 0, "aug_type": "medium", "batch_size": args.batch,
          "boost": 1, "n_commands": 6, "speed_factor": 10,
          "past_frames": 4, "future_frames": 1}
    cfg = {
        "train_params": {"epochs": args.epochs, "optimizer": "adam",
                         "save_every": max(args.epochs, 1), "swa_start": 10**9,
                         "grad_clipping": 1.0, "start_saving_best": 0},
        "logger": {"disabled": True},
        "dataloader": {"batch_size": args.batch, "shuffle": True},
        "directory": {"model_name": "moe", "save": str(ckpt_dir), "load": ""},
        "adam": {"lr": 5e-4, "betas": [0.9, 0.999], "eps": 1e-8,
                 "weight_decay": 0, "amsgrad": False},
        "SWA": {"swa_lr": 5e-4},
        "dataset": ds, "val_dataset": dict(ds),
        "model": model_cfg,
    }
    learner = Learner(Config(cfg))
    learner.train()
    ckpt = ckpt_dir / "moe-best.ckpt"
    assert ckpt.exists(), "training produced no best checkpoint"
    print(f"[e2e] trained {learner.iteration} steps; checkpoint {ckpt}")

    # -- 3. closed-loop eval: trained vs untrained ---------------------------
    from pmoe_tpu.agents.image_agent import ImageAgent
    from pmoe_tpu.eval import NoCrashEvaluator
    from pmoe_tpu.eval.evaluate_nocrash import _CollectingStats

    def run_eval(model_dir: str, tag: str) -> float:
        agent_cfg = Config({
            "sensors": {"img_width": 800, "img_height": 600},
            "logger": {"disabled": True},
            "model": {"actor": dict(model_cfg, n_commands=6,
                                    model_dir=model_dir)},
        })
        stats = _CollectingStats()
        ev = NoCrashEvaluator(backend, stats, routes=[(1, 6), (5, 10)],
                              max_ticks=args.eval_ticks, verbose=False)
        ev.weathers = [1]
        for traffic, route in ((0, (1, 6)), (0, (5, 10))):
            ev._run_episode(lambda: ImageAgent(agent_cfg), "Town01", traffic,
                            1, route, {"cars": [0, 0, 0], "peds": [0, 0, 0]})
        rcs = [row[5] for row in stats.rows]
        print(f"[e2e] {tag}: route completion {rcs}")
        return float(np.mean(rcs))

    rc_untrained = run_eval("", "untrained")
    rc_trained = run_eval(str(ckpt), "trained")
    print(f"[e2e] mean RC untrained={rc_untrained:.1f}% "
          f"trained={rc_trained:.1f}%")
    assert rc_trained > rc_untrained, (
        "behavior cloning produced no closed-loop improvement")
    print("[e2e] OK — the trained agent outperforms the untrained one")


if __name__ == "__main__":
    main()

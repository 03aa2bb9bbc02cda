"""Production PMoE training chain: stage-0 U-Net -> stage-1 PU-Net ->
stage-2 PU-Net expert -> stage-2 PMoE fusion, on the collected dataset.

This produces the model the framework is NAMED for (reference
model/moe.py:326-363, conf/stage_2_pmoe.yaml): a frozen MoE (the NoCrash
benchmark lineage checkpoint) fused with a predictive-U-Net expert through
two per-axis Linear(2->1) mixers. Every stage follows the reference's
grafting semantics (punet.py:40-50, moe.py:331-343) through the real
trainer Learners; each phase is resumable (skipped when its -best
checkpoint already exists).

Usage:
  python tools/pmoe_chain.py --workdir logs/pmoe_r5 \
      --data logs/nocrash_r5/data --moe-ckpt logs/nocrash_r5/ckpt/moe-best.ckpt
"""

from __future__ import annotations

import argparse
import json
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

N_COMMANDS = 6


def mlp(dims, act="relu", l_act=False):
    return {"dims": dims, "act": act, "l_act": l_act, "bn": False,
            "dropout": 0.0}


def dataset_cfg(data: str, batch: int, geom: dict, **over):
    ds = {"root": data, "crop": list(geom["crop"]),
          "resize": list(geom["resize"]), "seed": 0,
          "aug_type": "medium", "batch_size": batch, "boost": 1,
          "n_commands": N_COMMANDS, "speed_factor": 10, "past_frames": 4,
          "future_frames": 1}
    ds.update(over)
    return ds


def base_cfg(name: str, ckpt_dir: Path, epochs: int, batch: int, lr: float,
             ds: dict, grad_clip: float = 1.0, dtype: str = "float32"):
    return {
        "train_params": {"epochs": epochs, "optimizer": "adam",
                         "save_every": max(epochs, 1), "swa_start": 10 ** 9,
                         "grad_clipping": grad_clip, "start_saving_best": 0,
                         "dtype": dtype},
        "logger": {"disabled": True},
        "dataloader": {"batch_size": batch, "shuffle": True},
        "directory": {"model_name": name, "save": str(ckpt_dir), "load": ""},
        "adam": {"lr": lr, "betas": [0.9, 0.999], "eps": 1e-8,
                 "weight_decay": 0, "amsgrad": False},
        "SWA": {"swa_lr": 5e-4},
        "dataset": ds,
        "val_dataset": dict(ds, stride=max(8, int(ds.get("stride", 1)) * 4)),
    }


def run_stage(learner_mod: str, cfg: dict, best: Path, tag: str):
    if best.exists():
        print(f"[chain] reusing {best}")
        return best
    import importlib

    from pmoe_tpu.utils import Config

    Learner = importlib.import_module(learner_mod).Learner
    t0 = time.perf_counter()
    learner = Learner(Config(cfg))
    learner.train()
    assert best.exists(), f"{tag} produced no best checkpoint at {best}"
    print(f"[chain] {tag}: {learner.iteration} steps in "
          f"{time.perf_counter() - t0:.0f}s -> {best}", flush=True)
    return best


def punet_expert_model_cfg(model_type: str, punet_ckpt: Path, arch: str,
                           future_frames: int = 6, feat: int = 512):
    """Shared model dict for punet / pmoe stages (reference
    conf/stage_2_punet.yaml + conf/stage_2_pmoe.yaml)."""
    f3 = 3 * feat
    return {
        "type": model_type, "n_experts": 2, "loss_coefs": [0.7, 0.3],
        "verbose": True,
        "punet_path": str(punet_ckpt),
        "speed_encoder": mlp([1, 128, feat]),
        "command_encoder": mlp([N_COMMANDS, 128, feat]),
        "speed_prediction": mlp([f3, 128, 1]),
        "action_head": mlp([f3, 128, feat], "elu", True),
        "backbone": {"type": "rgb", "n_frames": 4,
                     "rgb": {"arch": arch, "pretrained": False,
                             "gamma": 2, "b": 1}},
        "punet": {"past_frames": 4, "future_frames": future_frames,
                  "in_features": 3, "num_classes": 23, "gamma": 2, "b": 1,
                  "unet_inter_repr": False, "model_name": "punet"},
    }


def write_pmoe_agent_conf(path: Path, pmoe_ckpt: Path, punet_ckpt: Path,
                          arch: str, future_frames: int = 6,
                          feat: int = 512) -> Path:
    actor = punet_expert_model_cfg("pmoe+pretrained", punet_ckpt, arch,
                                   future_frames, feat)
    actor.update({
        "n_commands": N_COMMANDS, "model_dir": str(pmoe_ckpt),
        # dirs only gate the factory assert; weights come from model_dir
        "pmoe": {"moe_dir": str(pmoe_ckpt), "punet_dir": str(pmoe_ckpt)},
    })
    conf = {"sensors": {"img_width": 800, "img_height": 600},
            "logger": {"disabled": True},
            "model": {"actor": actor}}
    path.write_text(yaml.safe_dump(conf))
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="logs/pmoe_r5")
    ap.add_argument("--data", default="logs/nocrash_r5/data")
    ap.add_argument("--moe-ckpt", default="logs/nocrash_r5/ckpt/moe-best.ckpt",
                    help="frozen MoE for the fusion (the NoCrash benchmark "
                         "lineage checkpoint)")
    ap.add_argument("--arch", default="resnet18")
    ap.add_argument("--epochs0", type=int, default=4)
    ap.add_argument("--epochs1", type=int, default=2)
    ap.add_argument("--epochs-punet", type=int, default=2)
    ap.add_argument("--epochs-pmoe", type=int, default=1)
    ap.add_argument("--batch0", type=int, default=64)
    ap.add_argument("--batch1", type=int, default=16)
    ap.add_argument("--batch-punet", type=int, default=16)
    ap.add_argument("--batch-pmoe", type=int, default=32)
    ap.add_argument("--stride1", type=int, default=4)
    ap.add_argument("--stride2", type=int, default=3)
    ap.add_argument("--dtype1", default="bfloat16",
                    help="stage-1 compute dtype; the rollout is dominated by "
                         "frozen seg U-Net convs where bf16 halves HBM "
                         "traffic (fp32 params/loss either way)")
    ap.add_argument("--spot-routes", type=int, default=6)
    ap.add_argument("--slots", type=int, default=6)
    ap.add_argument("--skip-spot", action="store_true")
    ap.add_argument("--crop", type=int, nargs=2, default=[125, 90])
    ap.add_argument("--resize", type=int, nargs=2, default=[224, 224])
    ap.add_argument("--future-frames", type=int, default=6)
    ap.add_argument("--feat", type=int, default=512,
                    help="encoder/backbone feature width (512 = reference; "
                         "smaller for the CPU smoke test)")
    args = ap.parse_args()
    geom = {"crop": args.crop, "resize": args.resize}
    FF = args.future_frames

    work = Path(args.workdir)
    ckpt_dir = work / "ckpt"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    moe_ckpt = Path(args.moe_ckpt)
    assert moe_ckpt.exists(), f"no MoE checkpoint at {moe_ckpt}"

    # ---- stage 0: segmentation U-Net (reference trainer/train_0.py) --------
    unet_ckpt = ckpt_dir / "unet-best.ckpt"
    ds0 = dataset_cfg(args.data, args.batch0, geom, aug_type="segmentation")
    cfg0 = base_cfg("unet", ckpt_dir, args.epochs0, args.batch0, 3e-4, ds0)
    cfg0["model"] = {"in_features": 3, "out_features": 23, "gamma": 2, "b": 1,
                     "dropout": 0.1}
    run_stage("pmoe_tpu.trainer.train_0", cfg0, unet_ckpt, "stage-0 unet")

    # ---- stage 1: predictive U-Net (reference trainer/train_1.py) ----------
    punet_ckpt = ckpt_dir / "punet-best.ckpt"
    ds1 = dataset_cfg(args.data, args.batch1, geom, aug_type="segmentation",
                      future_frames=FF, stride=args.stride1)
    cfg1 = base_cfg("punet", ckpt_dir, args.epochs1, args.batch1, 3e-4, ds1,
                    dtype=args.dtype1)
    cfg1["model"] = {"past_frames": 4, "future_frames": FF, "in_features": 3,
                     "num_classes": 23, "gamma": 2, "b": 1,
                     "model_path": str(unet_ckpt), "model_name": "unet",
                     "loss_type": "tversky"}
    run_stage("pmoe_tpu.trainer.train_1", cfg1, punet_ckpt, "stage-1 punet")

    # ---- stage 2a: PU-Net action expert (reference conf stage_2_punet) -----
    # Trained in NON-inter form (type 'punet': RGB backbone over the rolled-
    # out future masks) so its tree matches the expert PMoE instantiates.
    # The reference's stage_2_pmoe.yaml points punet_dir at the punet_INTER
    # checkpoint while PMoE builds the non-inter expert (moe.py:282-292 with
    # type 'pmoe'); its strict=False load then leaves that backbone at
    # random init — a reference bug this chain does not reproduce.
    pexp_ckpt = ckpt_dir / "PUNet_Action-best.ckpt"
    # streaming, not device_pool: the punet stages' per-step compute
    # (4 frozen U-Net + T' rollout passes) dwarfs the host link, so the
    # prefetcher hides the upload — and skipping the pool saves its ~10 min
    # build + 11 GB HBM next to the rollout activations
    ds2 = dataset_cfg(args.data, args.batch_punet, geom, thin_stopped=12,
                      boost_turns=4, stride=args.stride2)
    cfg2 = base_cfg("PUNet_Action", ckpt_dir, args.epochs_punet,
                    args.batch_punet, 3e-4, ds2)
    cfg2["model"] = punet_expert_model_cfg("punet", punet_ckpt, args.arch,
                                           FF, args.feat)
    run_stage("pmoe_tpu.trainer.train_2", cfg2, pexp_ckpt,
              "stage-2 punet expert")

    # ---- stage 2b: PMoE fusion — mixers only (reference stage_2_pmoe) ------
    pmoe_ckpt = ckpt_dir / "PMoE-best.ckpt"
    ds3 = dataset_cfg(args.data, args.batch_pmoe, geom, thin_stopped=12,
                      boost_turns=4, stride=args.stride2)
    cfg3 = base_cfg("PMoE", ckpt_dir, args.epochs_pmoe, args.batch_pmoe,
                    2e-4, ds3)
    cfg3["model"] = punet_expert_model_cfg("pmoe+pretrained", punet_ckpt,
                                           args.arch, FF, args.feat)
    cfg3["model"]["pmoe"] = {"moe_dir": str(moe_ckpt),
                             "punet_dir": str(pexp_ckpt)}
    run_stage("pmoe_tpu.trainer.train_2", cfg3, pmoe_ckpt, "stage-2 pmoe")

    conf = write_pmoe_agent_conf(work / "pmoe_agent.yaml", pmoe_ckpt,
                                 punet_ckpt, args.arch, FF, args.feat)
    print(f"[chain] agent conf -> {conf}")

    manifest = {p.name: __import__("hashlib").sha256(
        p.read_bytes()).hexdigest() for p in sorted(ckpt_dir.glob("*.ckpt"))}
    (work / "chain_manifest.json").write_text(json.dumps(manifest, indent=1))

    if not args.skip_spot:
        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from train_and_spot import spot_eval

        for town in ("Town01", "Town02"):
            spot_eval(conf, town, args.spot_routes, args.slots)


if __name__ == "__main__":
    main()

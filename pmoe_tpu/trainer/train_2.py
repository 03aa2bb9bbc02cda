"""Stage 2 — action-prediction training (MoE / PU-Net expert / PMoE).

Reference: /root/reference/PMoE/trainer/train_2.py. Model from the config
factory (train_2.py:55); criterion by model type (train_2.py:78-85);
validation metric L1(sample().clamp(-1,1), control) (train_2.py:269-271);
config path via argv (train_2.py:373-379).

Cross-stage grafting (reference moe.py:281-283,331-343 + punet.py:40-50):
* punet / punet_inter: the inner PredictiveUNet restores from the stage-1
  checkpoint at ``model.punet_path`` and is frozen.
* pmoe: the MoE restores from ``model.pmoe.moe_dir`` and freezes (minus
  ``exclude_freeze``); the PU-Net expert restores from ``model.pmoe.punet_dir``
  when given (pmoe+pretrained) and freezes; the lat/long mixers train.

Usage: ``python -m pmoe_tpu.trainer.train_2 <conf>``
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp

from ..data.dataset import CarlaSegPred
from ..models.moe import get_model
from ..ops.augment import augment
from ..ops.distributions import MixtureOfGaussians
from ..utils import load_checkpoint, graft
from ..utils.nn import check_grad_norm, jit_init
from .learner import BaseLearner
from .losses import get_criterion
from .optim import TrainState, make_lr_schedule, make_optimizer

__all__ = ["Learner"]


def _load_model_tree(path: str):
    ck = load_checkpoint(path)
    return ck.get("model", ck), ck.get("batch_stats", None)


class _PoolBatches:
    """Loader wrapper attaching the device frame pool to every batch, so the
    pool reaches the jitted step as an ARGUMENT (zero per-call transfer for a
    committed jax.Array; a closure capture would bake it into the module as
    a multi-GB constant)."""

    def __init__(self, loader, pool):
        self.loader = loader
        self.pool = pool

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        for batch in self.loader:
            yield {"data": batch, "pool": self.pool}


class Learner(BaseLearner):
    stage = "stage2"

    def build_data(self):
        ds = self.cfg.get("dataset", {})
        vds = self.cfg.get("val_dataset", ds)

        def make(dcfg, mode):
            return CarlaSegPred(
                root=dcfg.get("root", "data/train"),
                past_frames=int(dcfg.get("past_frames", 4)),
                future_frames=int(dcfg.get("future_frames", 6)),
                aug_type=dcfg.get("aug_type", "super_hard"),
                mode=mode, seed=int(dcfg.get("seed", 0)),
                load_measurements=True,
                batch_size=int(dcfg.get("batch_size", 32)),
                boost=int(dcfg.get("boost", 1)),
                crop=tuple(dcfg.get("crop", (125, 90))),
                resize=tuple(dcfg.get("resize", (224, 224))),
                speed_factor=float(dcfg.get("speed_factor", 10)),
                n_commands=int(dcfg.get("n_commands", 4)),
                cache=bool(dcfg.get("cache", False)),
                boost_turns=int(dcfg.get("boost_turns", 1)) if mode == "train"
                else 1,
                thin_stopped=int(dcfg.get("thin_stopped", 1)),
                stride=int(dcfg.get("stride", 1)),
            )

        self.train_set = make(ds, "train")
        self.val_set = make(vds, "val")
        self._pool = None
        if bool(ds.get("device_pool", False)):
            # dataset-in-HBM mode: all unique frames upload once, batches
            # carry int32 frame ids, windows gather on device in the jitted
            # step (see data/device_pool.py for the why). The pool travels
            # as an ARGUMENT of every step (a jit-closure capture would
            # embed 6+ GB of constants into the lowered module).
            if self.mesh is not None:
                raise ValueError(
                    "dataset.device_pool is single-device for now (a mesh "
                    "run would shard the pool's leading dim over 'data'); "
                    "multi-chip hosts have full PCIe and stream fine")
            from ..data.device_pool import (DeviceFramePool, IndexedSegPred,
                                            thin_to_frame_budget,
                                            unique_window_paths)

            # HBM ceiling: pool + ~3 GiB stage-2 HLO temp + reserved must
            # fit 15.75 GiB (v5e) — measured OOM at a 13.9 GiB pool, round
            # 5. Over budget, contiguous unprotected frame segments are
            # dropped (turns/brake onsets pinned) and the drop is LOGGED —
            # never a silent cap.
            H, W = tuple(ds.get("resize", (224, 224)))
            budget = int(float(ds.get("pool_budget_gib", 11.5)) * 2**30
                         // (H * W * 3))
            n_before = (len(self.train_set), len(self.val_set))
            n_drop = thin_to_frame_budget(self.train_set, self.val_set,
                                          budget,
                                          seed=int(ds.get("seed", 0)))
            if n_drop:
                print(f"[frame-pool] budget {budget} frames: dropped "
                      f"{n_drop} frames in unprotected segments -> windows "
                      f"train {n_before[0]}->{len(self.train_set)}, "
                      f"val {n_before[1]}->{len(self.val_set)}", flush=True)
            # only frames of windows actually reachable through .indices:
            # thinned windows (dataset thin_stopped) must not inflate the
            # pool's HBM footprint with their duplicate stopped frames
            paths = unique_window_paths(self.train_set, self.val_set)
            pool = DeviceFramePool(paths, crop=tuple(ds.get("crop",
                                                            (125, 90))),
                                   resize=tuple(ds.get("resize",
                                                       (224, 224))))
            self._pool = pool.array
            self.train_set = IndexedSegPred(self.train_set, pool)
            self.val_set = IndexedSegPred(self.val_set, pool)
        self.train_loader = self.make_loader(self.train_set)
        self.val_loader = self.make_loader(self.val_set, shuffle=False)
        if self._pool is not None:
            self.train_loader = _PoolBatches(self.train_loader, self._pool)
            self.val_loader = _PoolBatches(self.val_loader, self._pool)
        self.aug_type = ds.get("aug_type", "super_hard")
        self.boost = int(ds.get("boost", 1))
        self.n_commands = int(ds.get("n_commands", 4))
        self.past_frames = int(ds.get("past_frames", 4))
        self.batch_size = int(self.cfg.get("dataloader", {}).get("batch_size", 32))

    def build_model(self):
        mcfg = self.cfg.get("model", {})
        self.model_type = mcfg.get("type")
        self.model = get_model(mcfg, dtype=self.compute_dtype)
        self.criterion = get_criterion(self.model_type)
        self.loss_coefs = tuple(mcfg.get("loss_coefs", (0.7, 0.3)))

        ds = self.cfg.get("dataset", {})
        resize = tuple(ds.get("resize", (224, 224)))
        dummy_img = jnp.zeros((2, self.past_frames, *resize, 3))
        dummy_spd = jnp.zeros((2, 1))
        dummy_cmd = jnp.zeros((2, self.n_commands))
        variables = jit_init(
            self.model, {"params": self.next_rng(), "sample": self.next_rng()},
            dummy_img, dummy_spd, dummy_cmd)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        params, batch_stats, exclude, freeze = self._graft_and_freeze(
            mcfg, params, batch_stats)
        params, batch_stats = self._maybe_load_pretrained(
            mcfg, params, batch_stats)

        steps = max(1, len(self.train_loader))
        tp = self.cfg.get("train_params", {})
        lr0 = float(self.cfg.get("adam", {}).get("lr", 2e-4))
        schedule = make_lr_schedule(lr0, self.epochs, steps,
                                    swa_start=self.swa_start,
                                    swa_lr=float(self.cfg.get("SWA", {})
                                                 .get("swa_lr", lr0)))
        if self.mesh is not None:
            # EP: stacked-expert leading axes over the 'expert' mesh axis,
            # everything else replicated; the optimizer state inherits the
            # placement from tx.init over the sharded params
            from ..parallel.mesh import replicated, shard_params

            params = shard_params(self.mesh, params)
            batch_stats = jax.device_put(batch_stats, replicated(self.mesh))
        tx = make_optimizer(self.cfg, schedule,
                            grad_clipping=tp.get("grad_clipping", 1.0),
                            params=params, exclude_freeze=exclude,
                            freeze_all_except=freeze)
        # same mask the optimizer uses, applied as stop_gradient inside the
        # loss so XLA prunes the frozen subtrees' backward (memory + compute)
        from ..utils.nn import make_freeze_mask

        self.trainable_mask = (make_freeze_mask(params, exclude)
                               if freeze else None)
        self.state = TrainState.create(self.model.apply, params, batch_stats, tx)

    def _maybe_load_pretrained(self, mcfg, params, batch_stats):
        """ImageNet backbone initialization (reference backbone.py:49-75,
        ``pretrained=params.pretrained``): graft an exported torchvision
        state_dict into every backbone subtree, broadcasting across the
        stacked-expert axis. Weights come from ``backbone.rgb.weights_path``
        (a ``torch.save(model.state_dict(), ...)`` .pth or an .npz of the same
        arrays, exported offline) — there is no download path on TPU hosts."""
        rgb = mcfg.get("backbone", {}).get("rgb", {})
        if not bool(rgb.get("pretrained", False)):
            return params, batch_stats
        arch = str(rgb.get("arch", "resnet18")).lower()
        path = str(rgb.get("weights_path",
                           f"checkpoint/imagenet/{arch}.pth"))
        if not Path(path).exists():
            print(f"[stage2] pretrained: True but no weight export at {path} "
                  f"— training the backbone from scratch "
                  f"(export torchvision weights offline to enable)")
            return params, batch_stats
        from ..utils.torch_compat import load_pretrained_backbone

        params, batch_stats, n = load_pretrained_backbone(
            params, batch_stats, arch, path)
        if n == 0:
            print(f"[stage2] WARNING: {path} matched no backbone leaves")
        return params, batch_stats

    def _graft_and_freeze(self, mcfg, params, batch_stats):
        """Stage-to-stage weight transfer + freeze rules per model type."""
        exclude, freeze = None, False

        def graft_sub(tree, key, src):
            if src is None or key not in tree:
                return tree
            tree = dict(tree)
            tree[key] = graft(tree[key], src, verbose=True)
            return tree

        punet_path = str(mcfg.get("punet_path", ""))
        if self.model_type in ("punet", "punet_inter"):
            if punet_path and Path(punet_path).exists():
                src_p, src_bs = _load_model_tree(punet_path)
                params = graft_sub(params, "punet", src_p)
                batch_stats = graft_sub(batch_stats, "punet", src_bs)
            # train everything except the frozen PredictiveUNet
            exclude, freeze = ["speed_encoder", "command_encoder", "backbone",
                               "action_head", "action_out", "speed_pred"], True
        elif self.model_type in ("pmoe", "pmoe+pretrained"):
            pmoe_cfg = mcfg.get("pmoe", {})
            moe_dir = str(pmoe_cfg.get("moe_dir", ""))
            punet_dir = str(pmoe_cfg.get("punet_dir", ""))
            if moe_dir and Path(moe_dir).exists():
                src_p, src_bs = _load_model_tree(moe_dir)
                params = graft_sub(params, "moe", src_p)
                batch_stats = graft_sub(batch_stats, "moe", src_bs)
            if punet_dir and Path(punet_dir).exists():
                src_p, src_bs = _load_model_tree(punet_dir)
                params = graft_sub(params, "punet", src_p)
                batch_stats = graft_sub(batch_stats, "punet", src_bs)
            if punet_path and Path(punet_path).exists():
                # inner PredictiveUNet of the PU-Net expert
                src_p, src_bs = _load_model_tree(punet_path)
                if "punet" in params and "punet" in params["punet"]:
                    params = dict(params)
                    params["punet"] = graft_sub(params["punet"], "punet", src_p)
                    if "punet" in batch_stats:
                        batch_stats = dict(batch_stats)
                        batch_stats["punet"] = graft_sub(
                            batch_stats["punet"], "punet", src_bs)
            exclude = ["lat_weights", "long_weights"]
            exclude += [str(e) for e in mcfg.get("exclude_freeze", [])]
            if not punet_dir:
                # pmoe (not +pretrained): the PU-Net expert trains jointly
                # (reference moe.py:340-343 only freezes it when dir given)
                exclude.append("punet")
            freeze = True
        return params, batch_stats, exclude, freeze

    def _split_batch(self, batch):
        pool = None
        if isinstance(batch, dict) and "pool" in batch:
            pool, batch = batch["pool"], batch["data"]
        imgs, meas = batch
        if imgs.ndim == 2:                 # (B, T) frame ids -> HBM gather
            # the pool is a FLATTENED (F, H*W*3) u8 array: a 2-D row gather
            # keeps its default layout (a 4-D pool operand makes XLA copy
            # the whole pool into a padded tiled layout — device_pool.py)
            B, T = imgs.shape
            rows = jnp.take(pool, imgs.reshape(-1), axis=0)
            H = int(self.cfg.get("dataset", {}).get("resize", (224, 224))[0])
            W = int(self.cfg.get("dataset", {}).get("resize", (224, 224))[1])
            imgs = rows.reshape(B, T, H, W, 3)
        speed = meas["speed"].reshape(-1, 1).astype(jnp.float32)
        control = meas["control"].astype(jnp.float32)
        command = meas["command"].astype(jnp.float32)
        return imgs, speed, control, command

    def train_step(self, state: TrainState, batch, rng, iteration):
        imgs, speed, control, command = self._split_batch(batch)
        k_aug, k_drop, k_sample = jax.random.split(rng, 3)
        x = imgs.astype(jnp.float32) / 255.0
        x = augment(k_aug, x, iteration * self.batch_size * self.boost,
                    self.aug_type, self.batch_size)

        def loss_fn(params):
            if self.trainable_mask is not None:
                from ..utils.nn import stop_gradient_frozen

                params = stop_gradient_frozen(params, self.trainable_mask)
            out, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                x, speed, command, True, mutable=["batch_stats"],
                rngs={"dropout": k_drop, "sample": k_sample})
            pred, speed_pred = out
            loss = self.criterion(pred, speed_pred, control, speed,
                                  self.loss_coefs)
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads).replace(
            batch_stats=updates["batch_stats"])
        return state, {"loss": loss, "grad_norm": check_grad_norm(grads)}

    def eval_step(self, state: TrainState, batch, rng):
        imgs, speed, control, command = self._split_batch(batch)
        x = imgs.astype(jnp.float32) / 255.0
        actions = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, speed, command, False, method="sample", rngs={"sample": rng})
        actions = jnp.clip(actions, -1.0, 1.0)
        return jnp.mean(jnp.abs(actions - control))

    def collect_batch_stats(self, params, batch, rng):
        imgs, speed, _, command = self._split_batch(batch)
        x = imgs.astype(jnp.float32) / 255.0
        k1, k2 = jax.random.split(rng)
        _, updates = self.model.apply(
            {"params": params, "batch_stats": self.state.batch_stats},
            x, speed, command, True, mutable=["batch_stats"],
            rngs={"dropout": k1, "sample": k2})
        return updates["batch_stats"]

    def eval_example_args(self, batch):
        return (batch, jax.random.PRNGKey(0))

    def validate(self) -> dict:
        if not hasattr(self, "_eval_fn"):
            self._eval_fn = jax.jit(self.eval_step)
        vals = []
        for batch in self.val_loader:
            batch = self.put(batch)
            # device scalars, ONE fetch at the end (a float() per batch is a
            # tunnel round-trip that serializes the async dispatch chain)
            vals.append(self._eval_fn(self.state, batch, self.next_rng()))
            if len(vals) == 1:
                self._log_action_overlay(batch)
        return {"val_loss": float(jnp.mean(jnp.stack(vals)))
                if vals else float("nan")}

    def _log_action_overlay(self, batch) -> None:
        """Predicted (red) vs ground-truth (green) control overlays on the
        last input frame (reference train_2.py:276-285)."""
        if self.logger.disabled:
            return
        import numpy as np

        from ..utils.vision import draw_on_image

        imgs, speed, control, command = self._split_batch(batch)
        if not hasattr(self, "_sample_fn"):
            self._sample_fn = jax.jit(
                lambda state, x, s, c, rng: state.apply_fn(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    x, s, c, False, method="sample", rngs={"sample": rng}))
        actions = self._sample_fn(self.state,
                                  imgs.astype(jnp.float32) / 255.0,
                                  speed, command, self.next_rng())
        for i in range(min(2, imgs.shape[0])):
            frame = np.asarray(imgs[i, -1], np.float32) / 255.0   # (H, W, 3)
            meas = {"command": np.asarray(command[i]),
                    "control": np.asarray(control[i]),
                    "speed": float(np.asarray(speed[i]).reshape(-1)[0])}
            overlay = draw_on_image(frame.transpose(2, 0, 1), meas,
                                    np.asarray(actions[i]))
            self.logger.log_image(overlay, name=f"val_overlay_{i}",
                                  step=self.iteration)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        raise SystemExit("usage: python -m pmoe_tpu.trainer.train_2 <conf>")
    Learner(argv[0]).train()


if __name__ == "__main__":
    main()

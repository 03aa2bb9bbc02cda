"""Stage 1 — Predictive U-Net (future segmentation) training.

Reference: /root/reference/PMoE/trainer/train_1.py. Criterion:
AutoregressiveCriterion summing per-future-frame losses (train_1.py:75,
loss.py:86-118); grad clipping (train_1.py:140-141); only non-frozen params are
trained — the pretrained segmentation U-Net stays frozen (train_1.py:59-62).

The frozen U-Net is grafted from the stage-0 checkpoint before training
(reference punet.py:40-50's load_state_dict(strict=False)); freezing is an
optimizer mask over the 'unet/' subtree (its outputs also carry stop_gradient
inside the model).

Usage: ``python -m pmoe_tpu.trainer.train_1 [conf/stage_1]``
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp

from ..data.dataset import CarlaSegPred
from ..models.punet import PredictiveUNet
from ..ops.augment import augment
from ..utils import load_checkpoint, graft
from ..utils.nn import check_grad_norm, jit_init
from .learner import BaseLearner
from .losses import autoregressive_loss
from .optim import TrainState, make_lr_schedule, make_optimizer

__all__ = ["Learner"]


class Learner(BaseLearner):
    stage = "stage1"

    def build_data(self):
        ds = self.cfg.get("dataset", {})
        vds = self.cfg.get("val_dataset", ds)

        def make(dcfg, mode):
            return CarlaSegPred(
                root=dcfg.get("root", "data/train"),
                past_frames=int(dcfg.get("past_frames", 4)),
                future_frames=int(dcfg.get("future_frames", 4)),
                aug_type=dcfg.get("aug_type", "segmentation"),
                mode=mode, seed=int(dcfg.get("seed", 0)),
                load_measurements=False,
                batch_size=int(dcfg.get("batch_size", 32)),
                boost=int(dcfg.get("boost", 1)),
                crop=tuple(dcfg.get("crop", (125, 90))),
                resize=tuple(dcfg.get("resize", (224, 224))),
                stride=int(dcfg.get("stride", 1)),
            )

        self.train_set = make(ds, "train")
        self.val_set = make(vds, "val")
        self.train_loader = self.make_loader(self.train_set)
        self.val_loader = self.make_loader(self.val_set, shuffle=False)
        self.aug_type = ds.get("aug_type", "segmentation")
        self.boost = int(ds.get("boost", 1))
        self.batch_size = int(self.cfg.get("dataloader", {}).get("batch_size", 32))

    def build_model(self):
        mcfg = dict(self.cfg.get("model", {}))
        self.loss_type = str(self.cfg.get("train_params", {})
                             .get("loss_type", mcfg.pop("loss_type", "tversky")))
        self.model = PredictiveUNet(
            past_frames=int(mcfg.get("past_frames", 4)),
            future_frames=int(mcfg.get("future_frames", 4)),
            in_features=int(mcfg.get("in_features", 3)),
            num_classes=int(mcfg.get("num_classes", 23)),
            gamma=int(mcfg.get("gamma", 2)),
            b=int(mcfg.get("b", 1)),
            inter_repr=bool(mcfg.get("inter_repr", False)),
            unet_inter_repr=bool(mcfg.get("unet_inter_repr", False)),
            dtype=self.compute_dtype,
        )
        ds = self.cfg.get("dataset", {})
        resize = tuple(ds.get("resize", (224, 224)))
        dummy = jnp.zeros((1, self.model.past_frames, *resize, 3))
        variables = jit_init(self.model, {"params": self.next_rng()}, dummy)
        params, batch_stats = variables["params"], variables.get("batch_stats", {})

        # graft the pretrained segmentation U-Net (stage-0 checkpoint)
        model_path = mcfg.get("model_path", "")
        if model_path and Path(str(model_path)).exists():
            ck = load_checkpoint(model_path)
            src = ck.get(mcfg.get("model_name", "unet"), ck.get("model", ck))
            params = dict(params)
            params["unet"] = graft(params["unet"], src, verbose=True)
            if "batch_stats" in ck and "unet" in batch_stats:
                batch_stats = dict(batch_stats)
                batch_stats["unet"] = graft(batch_stats["unet"],
                                            ck["batch_stats"])

        steps = max(1, len(self.train_loader))
        tp = self.cfg.get("train_params", {})
        lr0 = float(self.cfg.get("adam", {}).get("lr", 2e-4))
        schedule = make_lr_schedule(lr0, self.epochs, steps,
                                    swa_start=self.swa_start,
                                    swa_lr=float(self.cfg.get("SWA", {})
                                                 .get("swa_lr", lr0)))
        # train only entry_block + pred_unet (rollout/), freeze unet/
        tx = make_optimizer(self.cfg, schedule,
                            grad_clipping=tp.get("grad_clipping", 1.0),
                            params=params,
                            exclude_freeze=["rollout"],
                            freeze_all_except=True)
        self.state = TrainState.create(self.model.apply, params, batch_stats, tx)

    def train_step(self, state: TrainState, batch, rng, iteration):
        imgs, masks = batch                     # (B,T,H,W,3) uint8, (B,T',H,W) int
        k_aug, k_drop = jax.random.split(rng)
        x = imgs.astype(jnp.float32) / 255.0
        x = augment(k_aug, x, iteration * self.batch_size * self.boost,
                    self.aug_type, self.batch_size)

        def loss_fn(params):
            preds, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                x, True, mutable=["batch_stats"], rngs={"dropout": k_drop})
            return autoregressive_loss(preds, masks, self.loss_type), updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads).replace(
            batch_stats=updates["batch_stats"])
        return state, {"loss": loss, "grad_norm": check_grad_norm(grads)}

    def eval_step(self, state: TrainState, batch):
        imgs, masks = batch
        x = imgs.astype(jnp.float32) / 255.0
        preds = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats}, x, False)
        return autoregressive_loss(preds, masks, self.loss_type)

    def collect_batch_stats(self, params, batch, rng):
        imgs, _ = batch
        x = imgs.astype(jnp.float32) / 255.0
        _, updates = self.model.apply(
            {"params": params, "batch_stats": self.state.batch_stats},
            x, True, mutable=["batch_stats"], rngs={"dropout": rng})
        return updates["batch_stats"]

    def validate(self) -> dict:
        if not hasattr(self, "_eval_fn"):
            self._eval_fn = jax.jit(self.eval_step)
        vals = []
        for batch in self.val_loader:
            batch = self.put(batch)
            vals.append(self._eval_fn(self.state, batch))  # async; fetch once
            if len(vals) == 1:
                self._log_mask_strip(batch)
        return {"val_loss": float(jnp.mean(jnp.stack(vals)))
                if vals else float("nan")}

    def _log_mask_strip(self, batch) -> None:
        """Decoded future-mask strips: predicted row over ground-truth row
        (reference train_1.py:253-267 logs exactly this to comet)."""
        if self.logger.disabled:
            return
        import numpy as np

        from ..utils.vision import decode_mask

        imgs, masks = batch
        if not hasattr(self, "_pred_fn"):
            self._pred_fn = jax.jit(
                lambda state, x: state.apply_fn(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    x, False))
        preds = self._pred_fn(self.state, imgs[:1].astype(jnp.float32) / 255.0)
        pred_cls = np.asarray(jnp.argmax(preds[0], axis=-1))    # (T', H, W)
        gt_cls = np.asarray(masks[0])
        pred_row = np.concatenate([decode_mask(m) for m in pred_cls], axis=1)
        gt_row = np.concatenate([decode_mask(m) for m in gt_cls], axis=1)
        self.logger.log_image(np.concatenate([pred_row, gt_row], axis=0),
                              name="future_masks", step=self.iteration)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg_path = argv[0] if argv else "pmoe_tpu/conf/stage_1"
    Learner(cfg_path).train()


if __name__ == "__main__":
    main()

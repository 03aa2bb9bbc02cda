"""Stage 0 — semantic-segmentation U-Net training.

Reference: /root/reference/PMoE/trainer/train_0.py (Learner:33, train:106).
Criterion: 0.5*CE(class-dice-weighted) + 0.5*tversky (train_0.py:68).
Validation: loss + per-class dice (train_0.py:210-257). SWA + BN recalibration
(train_0.py:103-104,147-155,196-203).

TPU rebuild: the whole step — uint8 normalize, curriculum augmentation, U-Net
fwd/bwd, optimizer — is ONE jitted XLA program; grad-norm is a fused on-device
reduction.

Usage: ``python -m pmoe_tpu.trainer.train_0 [conf/stage_0]``
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from ..data.dataset import CarlaSeg
from ..nn.unet import UNet
from ..ops.augment import augment
from ..utils.nn import check_grad_norm, get_initializer, jit_init
from ..utils.utility import class_labels
from .learner import BaseLearner
from .losses import cross_entropy_tversky_weighted_loss, dice_score
from .optim import TrainState, make_lr_schedule, make_optimizer

__all__ = ["Learner"]


class Learner(BaseLearner):
    stage = "stage0"

    def build_data(self):
        ds = self.cfg.get("dataset", {})
        vds = self.cfg.get("val_dataset", ds)
        common = dict(crop=tuple(ds.get("crop", (125, 90))),
                      resize=tuple(ds.get("resize", (224, 224))))
        self.train_set = CarlaSeg(root=ds.get("root", "data/train"),
                                  aug_type=ds.get("aug_type", "segmentation"),
                                  mode="train", seed=int(ds.get("seed", 0)),
                                  **common)
        self.val_set = CarlaSeg(root=vds.get("root", ds.get("root", "data/train")),
                                mode="val", seed=int(vds.get("seed", 0)), **common)
        self.train_loader = self.make_loader(self.train_set)
        self.val_loader = self.make_loader(self.val_set, shuffle=False)
        self.aug_type = ds.get("aug_type", "segmentation")
        self.batch_size = int(self.cfg.get("dataloader", {}).get("batch_size", 32))

    def build_model(self):
        mcfg = self.cfg.get("model", {})
        self.model = UNet(
            in_features=int(mcfg.get("in_features", 3)),
            out_features=int(mcfg.get("out_features", 23)),
            gamma=int(mcfg.get("gamma", 2)),
            b=int(mcfg.get("b", 1)),
            dropout=float(mcfg.get("dropout", 0.0)),
            dtype=self.compute_dtype,
        )
        self.num_classes = int(mcfg.get("out_features", 23))
        resize = tuple(self.cfg.get("dataset", {}).get("resize", (224, 224)))
        dummy = jnp.zeros((1, *resize, int(mcfg.get("in_features", 3))))
        variables = jit_init(self.model, {"params": self.next_rng()}, dummy)
        # kaiming init menu (reference train_0.py:52-55 applies init_weights)
        init_cfg = self.cfg.get("init_model", None)
        params = variables["params"]
        if init_cfg:
            params = _reinit_kernels(params, self.next_rng(), dict(init_cfg))

        steps = max(1, len(self.train_loader))
        tp = self.cfg.get("train_params", {})
        lr0 = float(self.cfg.get("adam", {}).get("lr", 2e-4))
        schedule = make_lr_schedule(lr0, self.epochs, steps,
                                    swa_start=self.swa_start,
                                    swa_lr=float(self.cfg.get("SWA", {})
                                                 .get("swa_lr", lr0)))
        tx = make_optimizer(self.cfg, schedule,
                            grad_clipping=tp.get("grad_clipping"))
        self.state = TrainState.create(self.model.apply, params,
                                       variables.get("batch_stats", {}), tx)

    # -- jitted steps ------------------------------------------------------------
    def train_step(self, state: TrainState, batch, rng, iteration):
        imgs, masks = batch
        k_aug, k_drop = jax.random.split(rng)
        x = imgs.astype(jnp.float32) / 255.0
        x = augment(k_aug, x, iteration * self.batch_size, self.aug_type,
                    self.batch_size)

        def loss_fn(params):
            logits, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                x, True, mutable=["batch_stats"], rngs={"dropout": k_drop})
            return cross_entropy_tversky_weighted_loss(logits, masks), updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads).replace(
            batch_stats=updates["batch_stats"])
        return state, {"loss": loss, "grad_norm": check_grad_norm(grads)}

    def eval_step(self, state: TrainState, batch):
        imgs, masks = batch
        x = imgs.astype(jnp.float32) / 255.0
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats}, x, False)
        return (cross_entropy_tversky_weighted_loss(logits, masks),
                dice_score(logits, masks))

    def collect_batch_stats(self, params, batch, rng):
        imgs, _ = batch
        x = imgs.astype(jnp.float32) / 255.0
        _, updates = self.model.apply(
            {"params": params, "batch_stats": self.state.batch_stats},
            x, True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        return updates["batch_stats"]

    def validate(self) -> dict:
        eval_fn = jax.jit(self.eval_step)
        losses, dices, n = [], [], 0
        for batch in self.val_loader:
            loss, dice = eval_fn(self.state, self.put(batch))
            losses.append(loss)          # async device scalars; fetch once
            dices.append(dice)
            n += 1
        if n == 0:
            return {"val_loss": float("nan")}
        mean_dice = jax.device_get(jnp.mean(jnp.stack(dices), axis=0))
        labels = class_labels()
        out = {"val_loss": float(jnp.mean(jnp.stack(losses))),
               "dice_mean": float(mean_dice.mean())}
        out.update({f"dice_{labels[i]}": float(mean_dice[i])
                    for i in range(len(mean_dice))})
        return out


def _reinit_kernels(params, rng, init_cfg):
    """Apply the reference init menu to every conv/dense kernel."""
    init_fn = get_initializer(**init_cfg)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    keys = jax.random.split(rng, len(flat))
    leaves = []
    for (path, leaf), k in zip(flat, keys):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        if name == "kernel" and leaf.ndim >= 2:
            leaves.append(init_fn(k, leaf.shape, leaf.dtype))
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg_path = argv[0] if argv else "pmoe_tpu/conf/stage_0"
    learner = Learner(cfg_path)
    learner.train()


if __name__ == "__main__":
    main()

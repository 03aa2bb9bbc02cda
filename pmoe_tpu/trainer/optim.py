"""Optimizer / LR-schedule / SWA machinery for all training stages.

Reference semantics being reproduced (on optax):
* Adam with amsgrad + betas/eps/weight_decay from the ``adam:`` YAML block,
  RMSprop from ``rmsprop:`` (reference train_2.py:87-121, conf/stage_2.yaml).
* ``CosineAnnealingLR`` stepped per epoch (train_0.py:101).
* Gradient clipping by global norm (train_2.py:157-165, ``grad_clipping``).
* Name-substring freezing -> ``optax.masked`` zeroing (utils/nn.py:22-58).
* SWA: running equal-weight parameter average after ``swa_start`` epochs with a
  constant ``swa_lr`` (train_0.py:103-104,147-155) + BatchNorm recalibration
  (train_0.py:197-203) implemented as cumulative averaging of per-batch stats.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..utils.nn import make_freeze_mask

__all__ = ["TrainState", "make_optimizer", "make_lr_schedule", "swa_update",
           "average_batch_stats"]


class TrainState(struct.PyTreeNode):
    """Carries everything a jitted train step mutates."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # SWA running average (None until first swa_update)
    swa_params: Any = None
    swa_n: jnp.ndarray | None = None

    apply_fn: Callable = struct.field(pytree_node=False, default=None)
    tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   apply_fn=apply_fn, tx=tx)


def make_lr_schedule(base_lr: float, epochs: int, steps_per_epoch: int,
                     swa_start: int | None = None,
                     swa_lr: float | None = None) -> Callable:
    """Cosine annealing over the full run (torch CosineAnnealingLR, eta_min=0),
    switching to the constant ``swa_lr`` once SWA begins."""
    cosine = optax.cosine_decay_schedule(
        init_value=base_lr, decay_steps=max(1, epochs * steps_per_epoch), alpha=0.0)
    if swa_start is None or swa_lr is None or swa_start >= epochs:
        return cosine
    boundary = swa_start * steps_per_epoch

    def schedule(step):
        return jnp.where(step < boundary, cosine(step), swa_lr)

    return schedule


def _zap_nonfinite() -> optax.GradientTransformation:
    """Replace non-finite gradient entries (NaN AND inf) with zeros."""

    def update_fn(updates, state, params=None):
        updates = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)),
            updates)
        return updates, state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update_fn)


def make_optimizer(cfg: Mapping, lr: float | Callable,
                   grad_clipping: float | None = None,
                   params: Any = None,
                   exclude_freeze=None,
                   freeze_all_except: bool = False) -> optax.GradientTransformation:
    """Build the optax chain from the stage config.

    cfg is the full stage config (with ``train_params.optimizer``, ``adam:``,
    ``rmsprop:`` blocks). If ``freeze_all_except`` is set, parameters NOT
    matching ``exclude_freeze`` substrings get zero updates.
    """
    opt_name = cfg.get("train_params", {}).get("optimizer", "adam").lower()
    if opt_name == "adam":
        a = cfg.get("adam", {})
        betas = a.get("betas", [0.9, 0.999])
        kw = dict(learning_rate=lr, b1=float(betas[0]), b2=float(betas[1]),
                  eps=float(a.get("eps", 1e-8)))
        if bool(a.get("amsgrad", False)):
            opt = optax.amsgrad(**kw)
        else:
            opt = optax.adam(**kw)
        wd = float(a.get("weight_decay", 0.0))
        if wd > 0:
            opt = optax.chain(optax.add_decayed_weights(wd), opt)
    elif opt_name == "rmsprop":
        r = cfg.get("rmsprop", {})
        opt = optax.rmsprop(
            learning_rate=lr,
            decay=float(r.get("alpha", 0.99)),
            eps=float(r.get("eps", 1e-8)),
            centered=bool(r.get("centered", False)),
            momentum=float(r.get("momentum", 0.0)) or None,
        )
    else:
        raise ValueError(f"Unknown optimizer {opt_name!r}")

    parts = []
    # a single non-finite gradient (fp32 overflow in a loss tail) must not
    # poison the optimizer state: clip_by_global_norm(inf) scales the whole
    # update to NaN and every parameter is dead from then on. Zeroing
    # non-finite entries BEFORE the clip turns the poisoned batch into a
    # (partial) no-op step instead of a divergence. (optax.zero_nans only
    # handles NaN; inf must be zapped too or the clip still NaNs.)
    parts.append(_zap_nonfinite())
    if grad_clipping:
        parts.append(optax.clip_by_global_norm(float(grad_clipping)))
    if freeze_all_except:
        # Run the optimizer ONLY on trainable leaves: frozen leaves carry no
        # Adam moments (no state buffers, no decay math) and their updates
        # pass through unchanged — exact zeros, since every freezing train
        # step prunes the frozen backward with stop_gradient (torch
        # requires_grad=False parity). An outer masked(set_to_zero) would
        # keep full-size mu/nu for params that never train.
        trainable = make_freeze_mask(params, exclude_freeze)
        parts.append(optax.masked(opt, trainable))
    else:
        parts.append(opt)
    return optax.chain(*parts)


def swa_update(state: TrainState) -> TrainState:
    """Equal-weight running average: avg += (p - avg) / n (torch AveragedModel)."""
    if state.swa_params is None:
        return state.replace(
            swa_params=jax.tree_util.tree_map(jnp.array, state.params),
            swa_n=jnp.ones((), jnp.int32))
    n = state.swa_n + 1
    new_avg = jax.tree_util.tree_map(
        lambda avg, p: avg + (p - avg) / n.astype(avg.dtype),
        state.swa_params, state.params)
    return state.replace(swa_params=new_avg, swa_n=n)


def average_batch_stats(stats_list):
    """Equal-weight average of per-batch BatchNorm statistics — the
    recalibration pass run after SWA (torch ``update_bn`` semantics)."""
    n = len(stats_list)
    return jax.tree_util.tree_map(
        lambda *xs: sum(xs) / n, *stats_list)

"""Shared trainer skeleton for the 4-stage pipeline.

The reference duplicates one trainer skeleton per stage script (SURVEY §1.2):
config -> logger -> data -> model -> optimizer -> cosine LR -> epoch loop with
grad-norm probe -> SWA -> validation -> EarlyStopping -> checkpointing.
Here the skeleton is factored once; stage scripts subclass :class:`BaseLearner`
and provide the jitted step functions.

TPU specifics:
* ONE jitted ``train_step`` per stage with donated state — params, optimizer
  and batch-stats never leave HBM between steps.
* Batches are device_put with the leading dim sharded over the mesh's 'data'
  axis; XLA inserts the gradient all-reduce over ICI (no hand-written
  collectives).
* uint8 batches travel over PCIe/ICI and are normalized + augmented on device
  inside the step (4x less host->device traffic than float32).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import BatchLoader
from ..data.prefetch import DevicePrefetcher
from ..parallel.mesh import make_mesh, shard_batch
from ..utils import (EarlyStopping, get_conf, init_logger, load_checkpoint,
                     save_checkpoint, to_dict, graft)
from ..utils.nn import op_counter, param_count
from .optim import TrainState, average_batch_stats, swa_update

__all__ = ["BaseLearner"]


class BaseLearner:
    """Config-driven trainer; subclasses implement model/step specifics."""

    #: subclass label used in checkpoints / logs
    stage: str = "base"

    def __init__(self, cfg):
        self.cfg = get_conf(cfg) if isinstance(cfg, (str, Path)) else cfg
        self.logger = init_logger(self.cfg.get("logger", {}))
        self.logger.log_parameters({"stage": self.stage, **_flatten_cfg(self.cfg)})
        self.rng = jax.random.PRNGKey(int(self.cfg.get("dataset", {}).get("seed", 0)))
        # (data, expert) device mesh; `parallel.expert: E` in the YAML shards
        # the stacked-expert parameter axis E ways (EP), the rest is DP.
        # The data axis must divide the batch size (static shapes, drop_last
        # batches) — shrink it to the largest power-of-two divisor that fits.
        par = self.cfg.get("parallel", {})
        expert_ways = int(par.get("expert", 1))
        bs = int(self.cfg.get("dataloader", {}).get("batch_size", 32))
        n = len(jax.devices())
        if par.get("data") is not None:     # explicit override (tests/tuning)
            data_ways = int(par.get("data"))
        else:
            data_ways = max(n // expert_ways, 1)
            while data_ways > 1 and bs % data_ways != 0:
                data_ways //= 2
        n_used = data_ways * expert_ways
        if n_used > 1 and n_used <= n:
            self.mesh = make_mesh(jax.devices()[:n_used], data=data_ways,
                                  expert=expert_ways)
            if n_used < n:
                print(f"[{self.stage}] using {n_used}/{n} devices "
                      f"(data={data_ways} x expert={expert_ways}; batch "
                      f"{bs} not divisible by larger data axes)")
        else:
            self.mesh = None
        self.epoch = 0
        self.iteration = 0
        self.best = float("inf")
        tp = self.cfg.get("train_params", {})
        # mixed precision: bf16 compute / fp32 params+loss (TPU MXU path);
        # default fp32 = reference parity (conf/stage_0.yaml trains fp32)
        from ..utils.nn import parse_dtype
        self.compute_dtype = parse_dtype(tp.get("dtype", "float32"))
        self.epochs = int(tp.get("epochs", 1))
        self.swa_start = int(tp.get("swa_start", 10 ** 9))
        self.save_every = int(tp.get("save_every", 10))
        self.start_saving_best = int(tp.get("start_saving_best", 0))
        self.early_stopping = (
            EarlyStopping(patience=int(tp.get("patience", 7)),
                          delta=float(tp.get("early_stopping_delta", 0.0)))
            if bool(tp.get("early_stopping", False)) else None)
        # comet auto-histogram analog (reference train_0.py:288-307 logs
        # weight histograms per epoch). Off by default: fetching the full
        # param tree costs real wall time on a tunneled device.
        self.auto_histograms = bool(
            self.cfg.get("logger", {}).get("auto_histograms", False))

        self.build_data()
        self.build_model()
        self.maybe_resume()

    # -- subclass hooks --------------------------------------------------------
    def build_data(self) -> None:
        raise NotImplementedError

    def build_model(self) -> None:
        raise NotImplementedError

    def train_step(self, state: TrainState, batch, rng, iteration):
        """jitted: (state, batch, rng, it) -> (state, metrics dict)"""
        raise NotImplementedError

    def validate(self) -> dict:
        raise NotImplementedError

    # -- shared machinery -------------------------------------------------------
    def make_loader(self, dataset, shuffle=True) -> BatchLoader:
        dl = self.cfg.get("dataloader", {})
        return BatchLoader(dataset, batch_size=int(dl.get("batch_size", 32)),
                           shuffle=shuffle and bool(dl.get("shuffle", True)))

    def put(self, batch):
        if self.mesh is not None:
            return shard_batch(self.mesh, batch)
        return jax.tree_util.tree_map(jnp.asarray, batch)

    def next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    @property
    def save_dir(self) -> Path:
        return Path(self.cfg.get("directory", {}).get("save", "./checkpoint"))

    @property
    def model_name(self) -> str:
        return self.cfg.get("directory", {}).get("model_name", self.stage)

    def checkpoint_state(self, to_numpy: bool = True) -> dict:
        state = {
            "epoch": np.int64(self.epoch),
            "iteration": np.int64(self.iteration),
            "model": self.state.params,
            "batch_stats": self.state.batch_stats,
            "best": np.float64(self.best),
        }
        if self.state.swa_params is not None:
            state["model-swa"] = self.state.swa_params
            state["swa_n"] = np.asarray(self.state.swa_n)
        # opt_state is an optax pytree of namedtuples: store flattened leaves
        leaves = jax.tree_util.tree_leaves(self.state.opt_state)
        conv = np.asarray if to_numpy else (lambda l: l)
        state["opt_leaves"] = {str(i): conv(l) for i, l in enumerate(leaves)}
        return state

    @property
    def _orbax(self):
        """Lazy orbax store when ``directory.format: orbax`` is configured —
        async, per-shard, sharding-preserving checkpoints for multi-chip runs
        (the msgpack default keeps the reference's file naming semantics)."""
        if getattr(self, "_orbax_store", None) is None:
            from ..utils.orbax_io import OrbaxStore

            self._orbax_store = OrbaxStore(self.save_dir)
        return self._orbax_store

    def save(self, is_best: bool, suffix: str = "") -> None:
        name = f"{self.model_name}-e{self.epoch}{suffix}"
        if self.cfg.get("directory", {}).get("format", "") == "orbax":
            # async: device arrays stream per-shard while training continues
            state = self.checkpoint_state(to_numpy=False)
            self._orbax.save(name, state)
            if is_best:
                self._orbax.save(f"{self.model_name}-best", state)
            return
        save_checkpoint(self.checkpoint_state(), is_best, self.save_dir, name,
                        best_prefix=self.model_name)

    def maybe_resume(self) -> None:
        if not bool(self.cfg.get("logger", {}).get("resume", False)):
            return
        load = self.cfg.get("directory", {}).get("load", "")
        if not load or not Path(load).exists():
            return
        if Path(load).is_dir():            # orbax checkpoint directory
            from ..utils.orbax_io import OrbaxStore

            store = OrbaxStore(Path(load).parent)
            ck = store.restore(Path(load).name)
        else:
            ck = load_checkpoint(load)
        self.restore_from(ck)
        print(f"[{self.stage}] resumed from {load} at epoch {self.epoch}")

    def restore_from(self, ck: dict) -> None:
        self.epoch = int(ck.get("epoch", 0))
        self.iteration = int(ck.get("iteration", 0))
        self.best = float(ck.get("best", float("inf")))
        params = graft(self.state.params, ck.get("model", {}))
        batch_stats = graft(self.state.batch_stats, ck.get("batch_stats", {}))
        opt_state = self.state.opt_state
        if "opt_leaves" in ck:
            treedef = jax.tree_util.tree_structure(opt_state)
            leaves = [ck["opt_leaves"][str(i)]
                      for i in range(treedef.num_leaves)]
            opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
        swa = ck.get("model-swa")
        # device_put: graft/unflatten yield host numpy leaves; committing
        # them here makes the restore a single upload instead of re-paying
        # host->device transfers on calls that don't carry the state
        # (validation before the first train step, frozen-subtree reads).
        # On a mesh, each leaf is committed WITH the sharding of its
        # pre-restore counterpart (placed by build_model) — a bare
        # device_put would land everything uncommitted on device 0 and the
        # first jitted step would pay a full-tree reshard.
        def commit(restored, like):
            if self.mesh is None:
                return jax.device_put(restored)
            return jax.tree_util.tree_map(
                lambda r, l: jax.device_put(
                    r, l.sharding) if isinstance(l, jax.Array) else r,
                restored, like)

        self.state = self.state.replace(
            params=commit(params, self.state.params),
            batch_stats=commit(batch_stats, self.state.batch_stats),
            opt_state=commit(opt_state, self.state.opt_state),
            swa_params=(commit(graft(self.state.params, swa),
                               self.state.params)
                        if swa is not None else None),
            swa_n=jnp.asarray(ck["swa_n"]) if "swa_n" in ck else None,
            step=jnp.asarray(self.iteration, jnp.int32))

    def train(self) -> None:
        """The generic epoch loop (reference train_*.py skeleton)."""
        step_fn = jax.jit(self.train_step, donate_argnums=0)
        for self.epoch in range(self.epoch + 1, self.epochs + 1):
            t0 = time.perf_counter()
            losses, n_batches = [], 0
            # background thread assembles + device_puts the next uint8 batch
            # while the current step runs (replaces DataLoader workers +
            # pin_memory; SURVEY §2.9 item 3)
            for batch in DevicePrefetcher(self.train_loader, mesh=self.mesh,
                                          depth=2):
                self.state, metrics = step_fn(
                    self.state, batch, self.next_rng(),
                    jnp.asarray(self.iteration, jnp.float32))
                self.iteration += 1
                n_batches += 1
                # keep the loss as a DEVICE scalar: float() here is a D2H
                # sync per step — ~2 tunnel RTTs (~70 ms) that serialize an
                # otherwise-async dispatch chain (measured: 2.7 vs 7+
                # steps/s on the r5 run). One fetch per epoch instead.
                losses.append(metrics["loss"])
                if self.iteration % 50 == 0:
                    self.logger.log_metrics(
                        {k: float(v) for k, v in metrics.items()},
                        step=self.iteration, epoch=self.epoch, prefix="batch")
            epoch_loss = (float(jnp.mean(jnp.stack(losses)))
                          if losses else 0.0)

            if self.epoch >= self.swa_start:
                self.state = swa_update(self.state)

            val_metrics = self.validate()
            dt = time.perf_counter() - t0
            self.logger.log_metrics(
                {"train_loss": epoch_loss, "time": dt, **val_metrics},
                step=self.iteration, epoch=self.epoch)
            if self.auto_histograms:
                self.log_param_histograms()
            print(f"[{self.stage}] epoch {self.epoch}/{self.epochs} "
                  f"loss={epoch_loss:.4f} "
                  f"val={val_metrics.get('val_loss', float('nan')):.4f} "
                  f"({dt:.1f}s)")

            val_loss = val_metrics.get("val_loss", epoch_loss)
            is_best = (val_loss < self.best
                       and self.epoch >= self.start_saving_best)
            if is_best:
                self.best = val_loss
            if is_best or self.epoch % self.save_every == 0:
                self.save(is_best)
            if self.early_stopping is not None:
                self.early_stopping(val_loss)
                if self.early_stopping.early_stop:
                    print(f"[{self.stage}] early stopping at epoch {self.epoch}")
                    break

        if self.state.swa_params is not None:
            self.recalibrate_swa_bn()
            self.save(False, suffix="-swa")
        self.log_op_cost()
        if getattr(self, "_orbax_store", None) is not None:
            self._orbax_store.wait()       # pending async saves -> durable
        self.logger.end()

    def recalibrate_swa_bn(self, max_batches: int = 50) -> None:
        """torch ``update_bn`` analog: recompute BatchNorm statistics for the
        SWA-averaged parameters by equal-weight averaging per-batch stats."""
        collect = jax.jit(self.collect_batch_stats)
        stats = []
        for i, batch in enumerate(self.train_loader):
            if i >= max_batches:
                break
            stats.append(collect(self.state.swa_params, self.put(batch),
                                 self.next_rng()))
        if stats:
            self.state = self.state.replace(
                batch_stats=average_batch_stats([jax.device_get(s) for s in stats]))

    def collect_batch_stats(self, params, batch, rng):
        """Subclass hook: forward in train mode, return new batch_stats."""
        raise NotImplementedError

    def log_param_histograms(self) -> None:
        """Per-top-level-module weight histograms, the comet auto-histogram
        analog (reference train_0.py:288-307). One device fetch per leaf,
        grouped by the first path component so the record count stays small."""
        import jax

        groups: dict[str, list] = {}
        def visit(path, leaf):
            top = str(getattr(path[0], "key", path[0]))
            groups.setdefault(top, []).append(np.asarray(leaf).ravel())
        jax.tree_util.tree_map_with_path(visit, self.state.params)
        for top, leaves in groups.items():
            self.logger.log_histogram_3d(
                np.concatenate(leaves), name=f"weights/{top}",
                step=self.iteration)

    def log_op_cost(self) -> None:
        """XLA cost analysis of the eval step — GFLOPs + params at train end
        (the reference's thop FLOPs probe, train_2.py:238-242)."""
        if self.logger.disabled:
            return                     # observability off: skip the extra
        try:                           # lower+compile entirely
            batch = self.put(next(iter(self.val_loader)))
            args = self.eval_example_args(batch)
            cost = op_counter(self.eval_step, self.state, *args)
            metrics = {"gflops": cost["flops"] / 1e9,
                       "params": param_count(self.state.params)}
            self.logger.log_metrics(metrics, step=self.iteration)
            print(f"[{self.stage}] {metrics['gflops']:.2f} GFLOPs/eval-batch, "
                  f"{metrics['params'] / 1e6:.2f}M params")
        except Exception as e:           # cost analysis is best-effort
            print(f"[{self.stage}] op-cost probe skipped: {e}")

    def eval_example_args(self, batch):
        """Extra eval_step args beyond (state, batch); subclasses override."""
        return (batch,)


def _flatten_cfg(cfg, prefix=""):
    out = {}
    for k, v in to_dict(cfg).items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten_cfg(v, key + "."))
        else:
            out[key] = v
    return out

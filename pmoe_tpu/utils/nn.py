"""NN utilities: weight-init menu, name-based freezing masks, grad norms, op counting.

TPU-native analog of the reference's utils/nn.py (init_weights:61, freeze:22,
check_grad_norm:10, op_counter:197, EarlyStopping:204). Freezing in JAX is a pytree
partition mask (consumed by ``optax.masked`` / multi_transform) instead of
``requires_grad`` flags; the name-substring exclusion semantics are preserved.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util

__all__ = [
    "jit_init",
    "parse_dtype",
    "get_initializer",
    "make_freeze_mask",
    "trainable_count",
    "param_count",
    "check_grad_norm",
    "global_norm",
    "op_counter",
    "EarlyStopping",
]


def parse_dtype(name: Any) -> Any:
    """``train_params.dtype`` config value -> jnp dtype (compute precision).

    The reference trains fp32 on cuda:0 (conf/stage_0.yaml:4); on TPU the MXU
    wants bf16 matmuls/convs, so every trainer accepts ``train_params.dtype:
    bfloat16`` for mixed precision — bf16 compute, fp32 params/optimizer
    state, fp32 loss math (losses upcast internally). Accepts a dtype object,
    ``float32``/``fp32``/``f32``, ``bfloat16``/``bf16``, ``float16``/``fp16``.
    """
    if name is None:
        return jnp.float32
    if not isinstance(name, str):
        return jnp.dtype(name)
    key = name.strip().lower()
    table = {
        "float32": jnp.float32, "fp32": jnp.float32, "f32": jnp.float32,
        "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
        "float16": jnp.float16, "fp16": jnp.float16, "f16": jnp.float16,
    }
    if key not in table:
        raise ValueError(f"unknown dtype {name!r}; use float32/bfloat16/float16")
    return table[key]


def jit_init(model, rngs, *args, train: bool = False):
    """``model.init`` under jit: ONE compiled (and persistently cacheable)
    program instead of eager per-op dispatch — ~10x faster for conv-heavy
    models on CPU and also faster on TPU. ``train`` stays a static Python
    bool (modules branch on it)."""
    fn = jax.jit(lambda rngs, *a: model.init(rngs, *a, train))
    return jax.tree_util.tree_map(lambda x: x, fn(rngs, *args))


def get_initializer(
    method: str = "kaiming_normal",
    mean: float = 0.0,
    std: float = 0.5,
    low: float = 0.0,
    high: float = 1.0,
    mode: str = "fan_in",
    nonlinearity: str = "leaky_relu",
    gain: float = 1.0,
) -> Callable:
    """Return a flax kernel initializer matching the reference init menu
    (reference utils/nn.py:61-194): kaiming_{normal,uniform}, normal, uniform,
    xavier_{normal,uniform}. Biases are zero-initialized by flax default."""
    method = method.lower()
    # torch 'leaky_relu' default negative_slope=0.01 -> gain sqrt(2/(1+0.01^2))
    if nonlinearity == "leaky_relu":
        neg = 0.01
        nl_gain = math.sqrt(2.0 / (1.0 + neg ** 2))
    elif nonlinearity == "relu":
        nl_gain = math.sqrt(2.0)
    else:
        nl_gain = 1.0

    if method in ("kaiming_normal", "kaiming_normal_"):
        # variance_scaling(scale, mode, distribution); torch kaiming_normal:
        # std = gain / sqrt(fan); variance = gain^2 / fan -> scale = gain^2
        return jax.nn.initializers.variance_scaling(
            nl_gain ** 2, mode.replace("fan_", "fan_"), "truncated_normal"
        )
    if method in ("kaiming_uniform", "kaiming_uniform_"):
        return jax.nn.initializers.variance_scaling(nl_gain ** 2, mode, "uniform")
    if method == "normal":
        def init(key, shape, dtype=jnp.float32):
            return mean + std * jax.random.normal(key, shape, dtype)
        return init
    if method == "uniform":
        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, low, high)
        return init
    if method == "xavier_normal":
        base = jax.nn.initializers.glorot_normal()
        def init(key, shape, dtype=jnp.float32):
            return gain * base(key, shape, dtype)
        return init
    if method == "xavier_uniform":
        base = jax.nn.initializers.glorot_uniform()
        def init(key, shape, dtype=jnp.float32):
            return gain * base(key, shape, dtype)
        return init
    raise ValueError(f"Unknown init method {method!r}")


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def make_freeze_mask(params: Any, exclude: Sequence[str] | None = None) -> Any:
    """Boolean pytree: True = trainable, False = frozen.

    Matches the reference ``freeze(model, exclude)`` semantics
    (utils/nn.py:22-58): with an empty exclusion list everything freezes;
    otherwise a parameter stays trainable iff any exclusion substring occurs in
    its '/'-joined path name (e.g. ``['model_weights', 'alpha']``).
    """
    exclude = list(exclude or [])

    def decide(path, _leaf):
        if not exclude:
            return False
        name = _path_str(path)
        return any(token in name for token in exclude)

    return tree_util.tree_map_with_path(decide, params)


def stop_gradient_frozen(params: Any, trainable_mask: Any) -> Any:
    """Wrap frozen leaves in ``stop_gradient`` before the forward pass.

    The torch reference freezes via ``requires_grad=False`` — autograd never
    builds the frozen branches' backward. An optax ``masked(set_to_zero)``
    alone zeroes updates AFTER the full backward ran; applying this inside the
    loss lets XLA prune the frozen subtrees' backward entirely (it halves the
    stage-3 actor update's memory: the frozen MoE backbone's grads otherwise
    blow HBM at batch 64)."""
    import jax

    return tree_util.tree_map(
        lambda p, m: p if m else jax.lax.stop_gradient(p), params,
        trainable_mask)


def trainable_count(params: Any, mask: Any | None = None) -> int:
    leaves = tree_util.tree_leaves(params)
    if mask is None:
        return int(sum(np.prod(l.shape) for l in leaves))
    mleaves = tree_util.tree_leaves(mask)
    return int(
        sum(np.prod(l.shape) for l, m in zip(leaves, mleaves) if m)
    )


def param_count(params: Any) -> int:
    return trainable_count(params)


def global_norm(tree: Any) -> jnp.ndarray:
    """Global L2 norm over a pytree (one fused reduction on device)."""
    leaves = [jnp.sum(jnp.square(x.astype(jnp.float32))) for x in tree_util.tree_leaves(tree)]
    if not leaves:
        return jnp.asarray(0.0)
    return jnp.sqrt(sum(leaves))


def check_grad_norm(grads: Any) -> jnp.ndarray:
    """Grad-norm probe (reference utils/nn.py:10-19), computed on device as one
    fused reduction instead of a Python sweep over parameters."""
    return global_norm(grads)


def op_counter(fn: Callable, *example_args, **example_kwargs) -> dict:
    """FLOPs/bytes estimate for a jitted function via XLA cost analysis — the
    TPU-native replacement of the reference's thop profile (utils/nn.py:197-201)."""
    lowered = jax.jit(fn).lower(*example_args, **example_kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax versions returned a list
        cost = cost[0] if cost else {}
    cost = dict(cost or {})
    return {
        "flops": float(cost.get("flops", -1.0)),
        "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
    }


class EarlyStopping:
    """Early-stopping on validation loss (reference utils/nn.py:204-245)."""

    def __init__(self, patience: int = 7, verbose: bool = False, delta: float = 0.0,
                 trace_func: Callable = print):
        self.patience = patience
        self.verbose = verbose
        self.counter = 0
        self.best_score = None
        self.early_stop = False
        self.val_loss_min = float("inf")
        self.delta = delta
        self.trace_func = trace_func

    def __call__(self, val_loss: float, _model: Any = None) -> None:
        score = -float(val_loss)
        if self.best_score is None:
            self.best_score = score
        elif score < self.best_score + self.delta:
            self.counter += 1
            self.trace_func(
                f"EarlyStopping counter: {self.counter} out of {self.patience}"
            )
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_score = score
            self.counter = 0

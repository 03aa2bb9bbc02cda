"""Mixture-of-diagonal-Gaussians distribution.

JAX-native replacement for the reference's
``MixtureSameFamily(Categorical(alphas), Independent(Normal(mean, std), 1))``
(/root/reference/PMoE/model/moe.py:152-157). Implemented as a pytree so it can
be returned from jitted forwards; ``log_prob`` is a single logsumexp over the
expert axis and ``sample`` draws the component with Gumbel-max then gathers —
both fully batched, no per-expert Python loops.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["MixtureOfGaussians"]

_LOG_2PI = math.log(2.0 * math.pi)


class MixtureOfGaussians(NamedTuple):
    """probs: (..., K) mixture weights (already softmaxed);
    mean, std: (..., K, D) diagonal Gaussian components."""

    probs: jnp.ndarray
    mean: jnp.ndarray
    std: jnp.ndarray

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., D) -> (...,). logsumexp_k [log pi_k + sum_d log N(x_d)].

        std is floored at 1e-4 here as a pure numerical guard: the expert
        head's ``std = elu(.) + 1`` (reference moe.py:97) can collapse
        arbitrarily close to 0 under clean low-variance labels, where
        (x - mean)^2 / std^2 overflows fp32 to inf and one poisoned batch
        NaNs the whole optimizer state (observed in stage-2 BC at step 22).
        A healthy std (goldens sit near 1) is unaffected."""
        std = jnp.maximum(self.std, 1e-4)
        x = x[..., None, :]                                   # (..., 1, D)
        z = (x - self.mean) / std
        comp_lp = -0.5 * jnp.sum(z * z + _LOG_2PI, axis=-1) - jnp.sum(
            jnp.log(std), axis=-1
        )                                                      # (..., K)
        log_pi = jnp.log(jnp.clip(self.probs, 1e-38))
        return jax.scipy.special.logsumexp(log_pi + comp_lp, axis=-1)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        """Draw one action per batch row: Gumbel-max over mixture weights, then
        the selected component's diagonal Gaussian."""
        k_cat, k_norm = jax.random.split(key)
        log_pi = jnp.log(jnp.clip(self.probs, 1e-38))
        gumbel = jax.random.gumbel(k_cat, log_pi.shape, dtype=log_pi.dtype)
        idx = jnp.argmax(log_pi + gumbel, axis=-1)            # (...,)
        onehot = jax.nn.one_hot(idx, self.probs.shape[-1], dtype=self.mean.dtype)
        mean = jnp.sum(self.mean * onehot[..., None], axis=-2)   # (..., D)
        std = jnp.sum(self.std * onehot[..., None], axis=-2)
        eps = jax.random.normal(k_norm, mean.shape, dtype=mean.dtype)
        return mean + std * eps

    def mode_of_means(self) -> jnp.ndarray:
        """Deterministic read-out: mean of the highest-weight component."""
        idx = jnp.argmax(self.probs, axis=-1)
        onehot = jax.nn.one_hot(idx, self.probs.shape[-1], dtype=self.mean.dtype)
        return jnp.sum(self.mean * onehot[..., None], axis=-2)

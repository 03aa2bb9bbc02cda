"""Exploration noise for the DDPG stage (reference utils/noise.py).

Stateful host-side noise processes driven by an explicit numpy Generator so runs
are reproducible without touching global RNG state.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "ActionNoise",
    "NormalActionNoise",
    "OrnsteinUhlenbeckActionNoise",
    "AdaptiveParamNoiseSpec",
]


class ActionNoise:
    def reset(self) -> None:
        pass


class NormalActionNoise(ActionNoise):
    """i.i.d. Gaussian action noise (reference utils/noise.py:41-52)."""

    def __init__(self, mu, sigma, rng: np.random.Generator | None = None):
        self.mu = np.asarray(mu, dtype=np.float64)
        self.sigma = np.asarray(sigma, dtype=np.float64)
        self._rng = rng or np.random.default_rng()

    def __call__(self) -> np.ndarray:
        return self._rng.normal(self.mu, self.sigma)

    def __repr__(self) -> str:
        return f"NormalActionNoise(mu={self.mu}, sigma={self.sigma})"


class OrnsteinUhlenbeckActionNoise(ActionNoise):
    """Temporally correlated OU noise (reference utils/noise.py:54-78)."""

    def __init__(self, mu, sigma, theta: float = 0.15, dt: float = 1e-2,
                 x0=None, rng: np.random.Generator | None = None):
        self.theta = theta
        self.mu = np.asarray(mu, dtype=np.float64)
        self.sigma = np.asarray(sigma, dtype=np.float64)
        self.dt = dt
        self.x0 = x0
        self._rng = rng or np.random.default_rng()
        self.reset()

    def __call__(self) -> np.ndarray:
        x = (
            self.x_prev
            + self.theta * (self.mu - self.x_prev) * self.dt
            + self.sigma * np.sqrt(self.dt) * self._rng.normal(size=self.mu.shape)
        )
        self.x_prev = x
        return x

    def reset(self) -> None:
        self.x_prev = self.x0 if self.x0 is not None else np.zeros_like(self.mu)

    def __repr__(self) -> str:
        return f"OrnsteinUhlenbeckActionNoise(mu={self.mu}, sigma={self.sigma})"


class AdaptiveParamNoiseSpec:
    """Parameter-space noise stddev adapter (reference utils/noise.py:5-38)."""

    def __init__(self, initial_stddev: float = 0.1,
                 desired_action_stddev: float = 0.1,
                 adoption_coefficient: float = 1.01):
        self.initial_stddev = initial_stddev
        self.desired_action_stddev = desired_action_stddev
        self.adoption_coefficient = adoption_coefficient
        self.current_stddev = initial_stddev

    def adapt(self, distance: float) -> None:
        if distance > self.desired_action_stddev:
            self.current_stddev /= self.adoption_coefficient
        else:
            self.current_stddev *= self.adoption_coefficient

    def get_stats(self) -> dict:
        return {"param_noise_stddev": self.current_stddev}

    def __repr__(self) -> str:
        return (
            f"AdaptiveParamNoiseSpec(initial_stddev={self.initial_stddev}, "
            f"desired_action_stddev={self.desired_action_stddev}, "
            f"adoption_coefficient={self.adoption_coefficient})"
        )

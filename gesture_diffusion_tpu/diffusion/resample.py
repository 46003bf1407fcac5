"""Timestep schedule samplers.

Parity with ``models/modules/resample.py:12-158``.  The uniform sampler is
in-graph (``jax.random``) so the whole train step stays on device — the
reference draws timesteps with host numpy every batch (``resample.py:58``).
The loss-aware second-moment resampler keeps host-side numpy state; in the
single-controller JAX model the "all_gather across ranks" of the reference
(``resample.py:91-103``) is unnecessary because per-example losses are
already global values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class UniformSampler:
    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def sample(self, rng: jax.Array, batch: int):
        """:return: (t indices (batch,), importance weights (batch,))."""
        t = jax.random.randint(rng, (batch,), 0, self.num_timesteps)
        return t, jnp.ones((batch,), jnp.float32)


class LossSecondMomentResampler:
    """Importance-sample timesteps proportional to RMS of recent losses."""

    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros((num_timesteps, history_per_term), np.float64)
        self._loss_counts = np.zeros((num_timesteps,), np.int64)

    def _warmed_up(self) -> bool:
        return (self._loss_counts == self.history_per_term).all()

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones((self.num_timesteps,), np.float64)
        w = np.sqrt(np.mean(self._loss_history**2, axis=-1))
        w /= w.sum()
        w *= 1.0 - self.uniform_prob
        w += self.uniform_prob / len(w)
        return w

    def sample(self, rng: jax.Array, batch: int):
        w = self.weights()
        p = w / w.sum()
        t = jax.random.choice(rng, self.num_timesteps, (batch,), p=jnp.asarray(p))
        wt = 1.0 / (self.num_timesteps * p)
        return t, jnp.asarray(wt, jnp.float32)[t]

    def update_with_all_losses(self, ts, losses) -> None:
        for t, loss in zip(np.asarray(ts).tolist(), np.asarray(losses).tolist()):
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1


def create_named_schedule_sampler(name: str, num_timesteps: int):
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")

"""Timestep schedule samplers.

Parity with ``models/modules/resample.py:12-158``.  The uniform sampler is
in-graph (``jax.random``) so the whole train step stays on device — the
reference draws timesteps with host numpy every batch (``resample.py:58``).
The loss-aware second-moment resampler keeps host-side numpy state (its
weights change every batch, so baking them into the jitted step would
retrace per step); the trainer draws timesteps with ``sample_np`` and
feeds ``t``/``weights`` in as traced arguments.  Cross-host history sync
mirrors the reference's ``update_with_local_losses`` all_gather
(``resample.py:91-108``): every process contributes its addressable
(t, loss) pairs and applies the identical concatenation, so per-host
histories — and therefore the importance weights and the next host-side
timestep draw — stay bit-identical on every host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _default_allgather(x: np.ndarray):
    """Per-process (t, loss) gather: list of every process's array, in
    process order (identical on all hosts).  Single-process: identity.

    Ragged-safe, mirroring the reference's explicit batch-size gather +
    padding (``resample.py:95-103``): ``process_allgather`` stacks
    equal-shape arrays only, so per-process lengths are gathered first,
    each contribution is padded to the global max, and the pad rows are
    stripped after the gather — asymmetric addressable shards or a final
    ragged batch gather correctly instead of crashing."""
    if jax.process_count() == 1:
        return [x]
    from jax.experimental import multihost_utils

    x = np.asarray(x)
    lengths = multihost_utils.process_allgather(
        np.asarray(len(x), np.int64))
    max_len = int(np.asarray(lengths).max())
    if max_len == 0:
        return [x for _ in range(jax.process_count())]
    pad = np.zeros((max_len - len(x),) + x.shape[1:], x.dtype)
    stacked = multihost_utils.process_allgather(
        np.concatenate([x, pad], axis=0))
    return [row[:int(n)] for row, n in zip(stacked, np.asarray(lengths))]


class UniformSampler:
    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def sample(self, rng: jax.Array, batch: int):
        """:return: (t indices (batch,), importance weights (batch,))."""
        t = jax.random.randint(rng, (batch,), 0, self.num_timesteps)
        return t, jnp.ones((batch,), jnp.float32)

    def sample_np(self, rng: np.random.Generator, batch: int):
        """Host-side draw (numpy), for trainers that feed t as an argument."""
        t = rng.integers(0, self.num_timesteps, size=batch)
        return t.astype(np.int32), np.ones((batch,), np.float32)


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

    def sample_np(self, rng: np.random.Generator, batch: int):
        """Host-side draw: current importance weights, numpy rng.  All
        hosts draw identically because ``update_with_local_losses`` keeps
        their histories (hence weights and rng consumption) in lockstep."""
        w = self.weights()
        p = w / w.sum()
        t = rng.choice(self.num_timesteps, size=batch, p=p)
        wt = 1.0 / (self.num_timesteps * p)
        return t.astype(np.int32), wt[t].astype(np.float32)

    def update_with_local_losses(self, local_ts, local_losses,
                                 allgather=None) -> None:
        """Reference ``resample.py:91-108``: all_gather every rank's
        (t, loss) pairs, then apply the SAME global update on every host so
        per-host histories cannot drift.  ``allgather`` maps one host-local
        array to the ordered list of every process's array (injectable for
        tests; defaults to ``jax.experimental.multihost_utils`` — identity
        when single-process)."""
        gather = allgather if allgather is not None else _default_allgather
        # one gather for both columns: (n, 2) float64 rows of (t, loss) —
        # t and f32 losses are both exact in f64 — so the multihost path
        # pays one lengths + one data collective per step instead of two
        # of each (the rendezvous is host-blocking on the train hot path)
        pairs = np.stack([np.asarray(local_ts, np.float64),
                          np.asarray(local_losses, np.float64)], axis=1)
        gathered = np.concatenate([np.asarray(a).reshape(-1, 2)
                                   for a in gather(pairs)])
        self.update_with_all_losses(gathered[:, 0].astype(np.int64),
                                    gathered[:, 1])

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

"""Deterministic key management.

Replaces the reference's mixed numpy/torch RNG (``utils/seed.py``,
``resample.py:58``) with a single ``jax.random`` key tree: one root seed,
named-stream splitting, and per-step folding so every host/step/stream
combination is reproducible without global state.
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np


def _stream_salt(name: str) -> int:
    return int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little")


class RngStream:
    """A root key plus named, foldable sub-streams."""

    def __init__(self, seed: int):
        self.seed = int(seed)
        self._root = jax.random.key(self.seed)

    def key(self, name: str, step: "int | None" = None) -> jax.Array:
        k = jax.random.fold_in(self._root, _stream_salt(name))
        if step is not None:
            k = jax.random.fold_in(k, step)
        return k

    def numpy(self, name: str, step: "int | None" = None) -> np.random.Generator:
        """Host-side generator derived from the same tree (data shuffling)."""
        salt = _stream_salt(name) ^ (0 if step is None else (step + 0x9E3779B9))
        return np.random.default_rng((self.seed, salt))


def fix_seed(seed: int) -> RngStream:
    """Reference-parity entry point (``utils/seed.py:1-13``): also seeds the
    legacy global numpy RNG for third-party code paths."""
    np.random.seed(seed % (2**32))
    return RngStream(seed)

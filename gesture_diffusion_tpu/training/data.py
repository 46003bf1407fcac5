"""Minimal array-backed dataset + sharded batch iterator.

Replaces torch DataLoader/DistributedSampler (``models/trainer.py:20-38``):
the windowed dataset is a dict of contiguous numpy arrays; an epoch is a
seeded permutation sliced into drop-last batches, placed onto the mesh with
batch-dim sharding.  In multi-host runs each host permutes identically and
takes its ``jax.process_index()`` slice.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import numpy as np

from ..parallel import shard_batch
from jax.sharding import Mesh


class ArrayDataset:
    """data: {"wav": (N, T_wav), "pose": (N, T, C)} float32 arrays."""

    def __init__(self, data: Dict[str, np.ndarray]):
        sizes = {k: len(v) for k, v in data.items()}
        assert len(set(sizes.values())) == 1, f"ragged dataset: {sizes}"
        self.data = {k: np.asarray(v, np.float32) for k, v in data.items()}

    def __len__(self) -> int:
        return len(next(iter(self.data.values())))

    @property
    def d_pose(self) -> int:
        return self.data["pose"].shape[-1]


def iter_batches(
    dataset: ArrayDataset,
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
    shuffle: bool = True,
    drop_last: bool = True,
    mesh: Optional[Mesh] = None,
) -> Iterator[Dict[str, jax.Array]]:
    n = len(dataset)
    idx = np.arange(n)
    if shuffle:
        assert rng is not None, "shuffling requires a generator"
        rng.shuffle(idx)
    n_batches = n // batch_size if drop_last else -(-n // batch_size)
    for b in range(n_batches):
        sel = idx[b * batch_size:(b + 1) * batch_size]
        batch = {k: v[sel] for k, v in dataset.data.items()}
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        yield batch


def steps_per_epoch(dataset_len: int, batch_size: int) -> int:
    return dataset_len // batch_size

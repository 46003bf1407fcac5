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


def host_slice(indices: np.ndarray, process_index: int,
               process_count: int) -> np.ndarray:
    """This host's disjoint share of a (globally identical) index batch.

    DistributedSampler semantics (``models/trainer.py:29,35``): every host
    draws the SAME seeded permutation, then takes a contiguous
    1/process_count slice of each global batch.  Requires the global batch
    size to be divisible by process_count (as the reference requires the
    batch to divide across ranks).
    """
    if len(indices) % process_count:
        raise ValueError(
            f"global batch {len(indices)} not divisible by "
            f"{process_count} hosts")
    per_host = len(indices) // process_count
    return indices[process_index * per_host:(process_index + 1) * per_host]


def iter_batches(
    dataset: ArrayDataset,
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
    shuffle: bool = True,
    drop_last: bool = True,
    mesh: Optional[Mesh] = None,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Iterator[Dict[str, jax.Array]]:
    """Yield global batches of ``batch_size``; under multi-host SPMD with a
    mesh, each host materialises exactly the rows its addressable devices
    own (read off the sharding's indices map) and the global array is
    assembled with ``jax.make_array_from_single_device_arrays``; without a
    mesh each host takes its contiguous ``host_slice``.

    ``process_index``/``process_count`` default to the runtime's
    (``jax.process_index()``); pass explicit values to fake a multi-host
    layout in tests.
    """
    if process_count is None:
        process_count = jax.process_count()
    if process_index is None:
        process_index = jax.process_index()
    n = len(dataset)
    idx = np.arange(n)
    if shuffle:
        assert rng is not None, "shuffling requires a generator"
        rng.shuffle(idx)         # same seed on every host -> same permutation
    n_batches = n // batch_size if drop_last else -(-n // batch_size)
    multihost = process_count > 1
    # every FULL batch must divide over hosts x mesh data axis; a batch_size
    # that can't is a misconfiguration surfaced here, NOT silently truncated
    # on every batch (which would quietly shrink — or zero out — the epoch)
    divisor = process_count if multihost else 1
    if mesh is not None:
        divisor = int(np.lcm(divisor, mesh.shape["data"]))
    if batch_size % divisor:
        raise ValueError(
            f"batch_size {batch_size} not divisible by {divisor} "
            f"({process_count} hosts x data axis "
            f"{mesh.shape['data'] if mesh is not None else 1})")
    sharding = None
    imap_cache: Dict[tuple, dict] = {}   # gshape -> device indices map
    if multihost and mesh is not None:
        from ..parallel import data_sharding
        sharding = data_sharding(mesh)
    for b in range(n_batches):
        sel = idx[b * batch_size:(b + 1) * batch_size]
        if len(sel) % divisor:
            # ragged FINAL batch (drop_last=False only): truncate to the
            # largest evenly-shardable size rather than dying at epoch end
            # (DistributedSampler pads instead; truncation never duplicates
            # samples).  Applies on single-host meshes too — shard_batch's
            # device_put requires divisibility just like the assembly below.
            sel = sel[: len(sel) - len(sel) % divisor]
            if len(sel) == 0:
                continue
        if multihost:
            if mesh is not None:
                # derive each addressable device's global rows from the
                # sharding's own indices map — correct for ANY mesh device
                # order, unlike a contiguous process_index-ordered
                # host_slice (which silently pairs hosts with the wrong
                # rows on a custom device_order mesh)
                batch = {}
                for k, v in dataset.data.items():
                    gshape = (len(sel),) + v.shape[1:]
                    if gshape not in imap_cache:   # identical for all full batches
                        imap_cache[gshape] = (
                            sharding.addressable_devices_indices_map(gshape))
                    shards = [jax.device_put(v[sel[sl[0]]], d)
                              for d, sl in imap_cache[gshape].items()]
                    batch[k] = jax.make_array_from_single_device_arrays(
                        gshape, sharding, shards)
            else:
                local = host_slice(sel, process_index, process_count)
                batch = {k: v[local] for k, v in dataset.data.items()}
        else:
            batch = {k: v[sel] for k, v in dataset.data.items()}
            if mesh is not None:
                batch = shard_batch(batch, mesh)
        yield batch


def steps_per_epoch(dataset_len: int, batch_size: int,
                    drop_last: bool = True) -> int:
    """Number of batches :func:`iter_batches` yields for these settings
    (before any mesh-divisor truncation of the final ragged batch, which
    can drop it entirely — a lower bound only when drop_last=False)."""
    return (dataset_len // batch_size if drop_last
            else -(-dataset_len // batch_size))

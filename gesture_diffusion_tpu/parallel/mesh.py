"""Device mesh + sharding helpers.

The reference's only parallelism is single-node NCCL DDP
(``utils/pytorch_ddp.py``, SURVEY.md §2).  The TPU-native equivalent is a
``jax.sharding.Mesh`` with a ``data`` axis (optionally a ``model`` axis for
head/tensor sharding): parameters are replicated, batches are sharded on
``data``, and XLA inserts the gradient ``psum`` over ICI automatically when
the jitted train step consumes sharded batches with replicated params — no
process groups, ports, or explicit collectives to manage.

Multi-host extension: ``jax.distributed.initialize()`` before mesh creation
makes the same code span hosts over DCN; per-host data loading uses
``jax.process_index()`` to slice the dataset (replacing DistributedSampler).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids: Optional[Sequence[int]] = None) -> int:
    """Initialise multi-host JAX (DCN between hosts, ICI within) and return
    this host's process index.  Safe to call on a single host (no-op).

    Replaces the reference's ``dist.init_process_group``/env:// rendezvous
    (``utils/pytorch_ddp.py:6-27``); afterwards the same ``make_mesh``/
    ``pjit`` code spans all hosts' devices, and the data loader slices
    per host via ``training.data.host_slice``.
    """
    if num_processes is not None and num_processes > 1:
        kwargs = {}
        if local_device_ids is not None:
            # e.g. split one host's devices between co-located processes
            # (the multi-process CPU validation in tests/test_multiprocess.py
            # runs through exactly this path)
            kwargs["local_device_ids"] = list(local_device_ids)
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id, **kwargs)
    return jax.process_index()


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D ("data", "model") mesh; defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        # implicit sizing must use every device — silently dropping the
        # remainder would run at reduced throughput with no signal.  An
        # EXPLICIT n_data that uses fewer devices stays allowed (that is
        # how Train.world_size requests a smaller data axis).
        if len(devices) % n_model:
            raise ValueError(
                f"{len(devices)} devices not divisible by n_model="
                f"{n_model}; pass n_data explicitly to use a subset")
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devices)}")
    use = devices[: n_data * n_model]
    arr = np.array(use).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of (N, ...) arrays with N sharded over ``data``."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / optimizer state) across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)

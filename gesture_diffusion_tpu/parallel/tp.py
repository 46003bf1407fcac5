"""Tensor-parallel parameter shardings over the mesh's "model" axis.

The reference has no TP (SURVEY.md §2 parallelism table) and this model is
small enough that DP alone matches it — but the framework exposes the full
TPU-native recipe so larger configs scale: give parameters
`NamedSharding`s (attention Q/K/V and FF-in kernels column-sharded, the
corresponding output projections row-sharded, everything else replicated)
and let XLA's SPMD partitioner insert the `psum`s over ICI.  Megatron-style
head parallelism falls out because the head dimension is the sharded
output dimension of Q/K/V.

Composes with data parallelism: batch sharded on "data", these params
sharded on "model", gradients all-reduced over "data" automatically.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix, kernel PartitionSpec). Column-parallel: output dim sharded;
# row-parallel: input (contracting) dim sharded -> XLA adds the psum.
_COLUMN_PARALLEL = ("query/kernel", "key/kernel", "value/kernel",
                    "ff/layer1/kernel", "layer1/kernel")
_ROW_PARALLEL = ("output/kernel", "ff/layer2/kernel", "layer2/kernel")


def _spec_for(path: str, shape: Tuple[int, ...], n_model: int) -> P:
    if len(shape) == 2:
        if any(path.endswith(s) for s in _COLUMN_PARALLEL) \
                and shape[1] % n_model == 0:
            return P(None, "model")
        if any(path.endswith(s) for s in _ROW_PARALLEL) \
                and shape[0] % n_model == 0:
            return P("model", None)
    return P()


def tensor_parallel_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings for the decoder's attention/FF weights,
    replicated elsewhere.  Identity (all-replicated) when the mesh has no
    "model" extent."""
    n_model = mesh.shape.get("model", 1)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        # render every key kind: DictKey -> .key, SequenceKey -> str(.idx)
        # (the raw int idx crashes str.join), GetAttrKey -> .name (str(k)
        # renders '.name' whose leading dot breaks endswith matching)
        parts = []
        for p in kp:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            elif hasattr(p, "name"):
                parts.append(str(p.name))
            else:
                parts.append(str(p))
        return "/".join(parts)

    specs = {}
    for kp, leaf in flat:
        p = path_str(kp)
        specs[p] = (_spec_for(p, tuple(leaf.shape), n_model)
                    if n_model > 1 else P())

    def to_sharding(kp, leaf):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def apply_shardings(tree, shardings):
    """device_put every leaf onto its sharding."""
    return jax.tree.map(jax.device_put, tree, shardings)

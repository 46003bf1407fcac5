"""Vertex-factored cross-attention decoder with ST-GCN residuals.

Parity with ``models/nn.py:231-378`` + ``modules/gcn/tgcn.py:6-63``: pose
features are reshaped (N, T, V, d_model/V); each layer applies a pre-LN
K-partition graph convolution residual on the vertex axis, then the
joint-stream cross-attention of :class:`..decoders.CrossAttentionLayer`
on the flattened features.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.graph import build_graph
from .attention import PositionalEncoding
from .decoders import CrossAttentionLayer

Dtype = jnp.dtype


class GraphConv(nn.Module):
    """K-partition graph conv (t_kernel 1): Dense C->K*C then contraction
    with the (K, V, V) adjacency (``tgcn.py:54-63``)."""

    out_channels: int
    n_partitions: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, A: jax.Array) -> jax.Array:
        """x: (N, T, V, C) -> (N, T, V, out_channels)."""
        y = nn.Dense(self.out_channels * self.n_partitions,
                     dtype=self.dtype, name="proj")(x)
        n, t, v, kc = y.shape
        y = y.reshape(n, t, v, self.n_partitions, self.out_channels)
        return jnp.einsum("ntvkc,kvw->ntwc", y, A.astype(y.dtype))


class CrossAttentionGCNLayer(nn.Module):
    d_model: int
    n_vertices: int
    n_partitions: int
    heads: int
    dropout: float = 0.0
    ff_memory: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, A: jax.Array, memory: jax.Array,
                 train: bool):
        """x: (N, T, V, d_model/V); memory: (N, T_mem, d_model)."""
        det = not train
        dv = self.d_model // self.n_vertices
        z = nn.LayerNorm(dtype=self.dtype, name="norm_gcn")(x)
        z = GraphConv(dv, self.n_partitions, dtype=self.dtype, name="gcn")(z, A)
        x = x + nn.Dropout(self.dropout)(z, deterministic=det)

        n, t, v, _ = x.shape
        x_flat = x.reshape(n, t, self.d_model)
        x_flat, memory = CrossAttentionLayer(
            self.d_model, self.heads, self.dropout, ff_memory=self.ff_memory,
            dtype=self.dtype, name="attn")(x_flat, memory, train)
        return x_flat.reshape(n, t, v, dv), memory


class CrossAttentionGCN(nn.Module):
    """Decoder-level module (``nn.py:277-378``): per-vertex input/output
    embeddings, shared PE over [x ; memory], N GCN+attention layers (the
    last skips the memory feed-forward)."""

    d_x: int
    d_memory: int
    d_model: int
    heads: int
    n_layers: int
    d_out: int
    dropout: float = 0.0
    graph_layout: str = "beat"
    graph_strategy: str = "spatial"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, memory: jax.Array, train: bool) -> jax.Array:
        A = jnp.asarray(build_graph(self.graph_layout, self.graph_strategy))
        n_partitions, v, _ = A.shape
        assert self.d_model % v == 0, (
            f"d_model {self.d_model} must be divisible by n_vertices {v}")
        assert self.d_x % v == 0 and self.d_out % v == 0
        dv = self.d_model // v
        det = not train

        n, t, _ = x.shape
        x = x.reshape(n, t, v, self.d_x // v)
        x = nn.Dense(dv, dtype=self.dtype, name="emb_x")(x)
        x = x.reshape(n, t, self.d_model)
        memory = nn.Dense(self.d_model, dtype=self.dtype, name="emb_mem")(memory)

        pe = PositionalEncoding(self.d_model, self.dropout, name="pe")
        h = pe(jnp.concatenate([x, memory], axis=1), det)
        x, memory = h[:, :t], h[:, t:]
        x = x.reshape(n, t, v, dv)

        for i in range(self.n_layers):
            x, memory = CrossAttentionGCNLayer(
                self.d_model, v, n_partitions, self.heads, self.dropout,
                ff_memory=(i < self.n_layers - 1), dtype=self.dtype,
                name=f"layer{i}")(x, A, memory, train)

        x = nn.Dense(self.d_out // v, dtype=self.dtype, name="out_proj")(x)
        return x.reshape(n, t, self.d_out)

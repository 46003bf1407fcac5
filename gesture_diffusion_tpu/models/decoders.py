"""Pose decoders: Primer-EZ cross-attention stacks, batch-first.

Re-design of ``models/nn.py:55-447``:
  * ``OnewayCrossAttention`` — the operational BEAT decoder
    (``configs/beat-ours.json:67``): N layers of pre-LN
    {self-attn -> cross-attn(x -> memory) -> squared-ReLU FF}.
  * ``CrossAttention`` — joint-stream variant: self-attn each stream, then a
    shared attention over the concatenation [x ; memory], split back, FF both
    (last layer skips the memory FF).

Both take x (N, T, d_x) and memory (N, T_mem, d_mem) and return (N, T, d_out).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import FeedForward, MultiHeadAttention, PositionalEncoding

Dtype = jnp.dtype


class OnewayCrossAttentionLayer(nn.Module):
    d_model: int
    heads: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, memory: jax.Array, train: bool) -> jax.Array:
        det = not train
        drop = nn.Dropout(self.dropout)
        mha = lambda name: MultiHeadAttention(
            self.heads, self.d_model, self.dropout, dtype=self.dtype, name=name)

        z = nn.LayerNorm(dtype=self.dtype, name="norm_self_attn")(x)
        z = mha("self_attn")(z, z, z, deterministic=det)
        x = x + drop(z, deterministic=det)

        z = nn.LayerNorm(dtype=self.dtype, name="norm_cross_attn")(x)
        z = mha("cross_attn")(z, memory, memory, deterministic=det)
        x = x + drop(z, deterministic=det)

        z = nn.LayerNorm(dtype=self.dtype, name="norm_ff")(x)
        z = FeedForward(self.d_model, dropout=self.dropout, dtype=self.dtype,
                        name="ff")(z, deterministic=det)
        return x + drop(z, deterministic=det)


class OnewayCrossAttention(nn.Module):
    d_x: int
    d_memory: int
    d_model: int
    heads: int
    n_layers: int
    d_out: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, memory: jax.Array, train: bool) -> jax.Array:
        det = not train
        pe = PositionalEncoding(self.d_model, self.dropout, name="pe")
        x = pe(nn.Dense(self.d_model, dtype=self.dtype, name="emb_x")(x), det)
        memory = pe(nn.Dense(self.d_model, dtype=self.dtype, name="emb_mem")(memory), det)
        for i in range(self.n_layers):
            x = OnewayCrossAttentionLayer(
                self.d_model, self.heads, self.dropout, dtype=self.dtype,
                name=f"layer{i}")(x, memory, train)
        x = nn.LayerNorm(dtype=self.dtype, name="out_norm")(x)
        return nn.Dense(self.d_out, dtype=self.dtype, name="out_proj")(x)


class CrossAttentionLayer(nn.Module):
    d_model: int
    heads: int
    dropout: float = 0.0
    ff_memory: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, memory: jax.Array, train: bool):
        det = not train
        drop = nn.Dropout(self.dropout)
        mha = lambda name: MultiHeadAttention(
            self.heads, self.d_model, self.dropout, dtype=self.dtype, name=name)

        z = nn.LayerNorm(dtype=self.dtype, name="norm_self_attn")(x)
        z = mha("self_attn")(z, z, z, deterministic=det)
        x = x + drop(z, deterministic=det)

        z = nn.LayerNorm(dtype=self.dtype, name="norm_self_attn_mem")(memory)
        z = mha("self_attn_mem")(z, z, z, deterministic=det)
        memory = memory + drop(z, deterministic=det)

        t_x = x.shape[1]
        h = jnp.concatenate([x, memory], axis=1)
        z = nn.LayerNorm(dtype=self.dtype, name="norm_cross_attn")(h)
        z = mha("cross_attn")(z, z, z, deterministic=det)
        h = h + drop(z, deterministic=det)
        x, memory = h[:, :t_x], h[:, t_x:]

        z = nn.LayerNorm(dtype=self.dtype, name="norm_ff")(x)
        z = FeedForward(self.d_model, dropout=self.dropout, dtype=self.dtype,
                        name="ff")(z, deterministic=det)
        x = x + drop(z, deterministic=det)

        if self.ff_memory:
            z = nn.LayerNorm(dtype=self.dtype, name="norm_ff_mem")(memory)
            z = FeedForward(self.d_model, dropout=self.dropout, dtype=self.dtype,
                            name="ff_mem")(z, deterministic=det)
            memory = memory + drop(z, deterministic=det)
        return x, memory


class CrossAttention(nn.Module):
    d_x: int
    d_memory: int
    d_model: int
    heads: int
    n_layers: int
    d_out: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, memory: jax.Array, train: bool) -> jax.Array:
        det = not train
        x = nn.Dense(self.d_model, dtype=self.dtype, name="emb_x")(x)
        memory = nn.Dense(self.d_model, dtype=self.dtype, name="emb_mem")(memory)
        # the reference applies one PE to the concatenated [x ; memory]
        # stream (nn.py:437-442): memory tokens continue x's position index
        t_x = x.shape[1]
        pe = PositionalEncoding(self.d_model, self.dropout, name="pe")
        h = pe(jnp.concatenate([x, memory], axis=1), det)
        x, memory = h[:, :t_x], h[:, t_x:]
        for i in range(self.n_layers):
            x, memory = CrossAttentionLayer(
                self.d_model, self.heads, self.dropout,
                ff_memory=(i < self.n_layers - 1), dtype=self.dtype,
                name=f"layer{i}")(x, memory, train)
        x = nn.LayerNorm(dtype=self.dtype, name="out_norm")(x)
        return nn.Dense(self.d_out, dtype=self.dtype, name="out_proj")(x)

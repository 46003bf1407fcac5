"""Generic Primer-EZ transformer stacks (encoder / decoder).

Parity surface: ``/root/reference/models/modules/transformer.py`` —
``PrimerEZEncoder`` (:248), ``PrimerEZDecoder`` (:297),
``TransformerLayer`` (:196) with masks, and
``EmbeddingsWithPositionalEncoding`` (:183, note the sqrt(d_model)
embedding scale — unlike the plain ``PositionalEncoding`` the operational
decoders use).  These stacks are dead code on every reference call path
(SURVEY §2, "Used: no") but are part of its model-zoo surface; ported here
as thin compositions of the same ``MultiHeadAttention`` /
``FeedForward`` primitives the operational decoders use
(``models/attention.py``), batch-first (N, T, C).

Mask convention (batch-first translation of the reference's
``[T_q, T_k, N]``): boolean, broadcastable to ``(N, T_q, T_k, 1)``;
True = attend, False = masked.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import (FeedForward, MultiHeadAttention,
                        sinusoidal_position_encoding)

Dtype = jnp.dtype


class EmbedWithPositionalEncoding(nn.Module):
    """Linear embed scaled by sqrt(d_model) plus sinusoidal PE
    (``transformer.py:183-194``)."""

    d_model: int
    max_len: int = 5000
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pe = jnp.asarray(sinusoidal_position_encoding(self.max_len,
                                                      self.d_model))
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear")(x)
        return h * math.sqrt(self.d_model) + pe[None, : x.shape[1]].astype(
            h.dtype)


class PrimerLayer(nn.Module):
    """Pre-LN residual layer: self-attn [-> src-attn] -> FF, all with the
    Primer dconv-QKV attention and squared-ReLU FF
    (``transformer.py:196-245``)."""

    d_model: int
    heads: int
    dropout: float = 0.0
    with_src: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 src: Optional[jax.Array] = None,
                 src_mask: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        det = not train
        drop = nn.Dropout(self.dropout)
        mha = lambda name: MultiHeadAttention(
            self.heads, self.d_model, self.dropout, dtype=self.dtype,
            name=name)

        z = nn.LayerNorm(dtype=self.dtype, name="norm_self_attn")(x)
        z = mha("self_attn")(z, z, z, mask=mask, deterministic=det)
        x = x + drop(z, deterministic=det)

        if self.with_src:
            assert src is not None, "decoder layer needs memory"
            z = nn.LayerNorm(dtype=self.dtype, name="norm_src_attn")(x)
            z = mha("src_attn")(z, src, src, mask=src_mask, deterministic=det)
            x = x + drop(z, deterministic=det)

        z = nn.LayerNorm(dtype=self.dtype, name="norm_ff")(x)
        z = FeedForward(self.d_model, dropout=self.dropout, dtype=self.dtype,
                        name="ff")(z, deterministic=det)
        return x + drop(z, deterministic=det)


class PrimerEZEncoder(nn.Module):
    """``transformer.py:248-295``: embed+PE -> n x self-attn layers ->
    LN + Linear head (d_out defaults to d_model)."""

    d_x: int
    d_model: int
    heads: int
    n_layers: int
    dropout: float = 0.0
    d_out: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        h = EmbedWithPositionalEncoding(self.d_model, dtype=self.dtype,
                                        name="pe")(x)
        for i in range(self.n_layers):
            h = PrimerLayer(self.d_model, self.heads, self.dropout,
                            dtype=self.dtype, name=f"layer{i}")(
                h, mask=mask, train=train)
        h = nn.LayerNorm(dtype=self.dtype, name="out_norm")(h)
        return nn.Dense(self.d_out or self.d_model, dtype=self.dtype,
                        name="out_proj")(h)


class PrimerEZDecoder(nn.Module):
    """``transformer.py:297-347``: embed+PE -> n x {self-attn ->
    src-attn(memory) -> FF} layers -> LN + Linear head."""

    d_x: int
    d_model: int
    heads: int
    n_layers: int
    dropout: float = 0.0
    d_out: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, memory: jax.Array,
                 mask: Optional[jax.Array] = None,
                 src_mask: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        h = EmbedWithPositionalEncoding(self.d_model, dtype=self.dtype,
                                        name="pe")(x)
        for i in range(self.n_layers):
            h = PrimerLayer(self.d_model, self.heads, self.dropout,
                            with_src=True, dtype=self.dtype,
                            name=f"layer{i}")(
                h, mask=mask, src=memory, src_mask=src_mask, train=train)
        h = nn.LayerNorm(dtype=self.dtype, name="out_norm")(h)
        return nn.Dense(self.d_out or self.d_model, dtype=self.dtype,
                        name="out_proj")(h)

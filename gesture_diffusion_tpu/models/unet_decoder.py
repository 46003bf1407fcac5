"""1-D GLIDE-style UNet decoder with audio cross-attention.

Parity with ``models/nn.py:450-550`` (UNetAttn) + ``modules/glide/unet.py``
(UNetModel/ResBlock/AttentionBlock/QKVAttention/Up/Downsample) +
``modules/glide/nn.py`` utilities, restructured for (N, T, C) layout:

  * ResBlock: GroupNorm(32)+SiLU+conv, FiLM scale-shift from the timestep
    embedding, zero-init output conv;
  * AttentionBlock: self-attention over time with optional encoder K/V from
    the audio stream (GLIDE text-conditioning pattern), q/k pre-scaled by
    1/sqrt(sqrt(d)) as in the reference's QKVAttention;
  * symmetric zero-padding of the window to a power-of-two-friendly length
    (``nn.py:495-507``), cropped after the UNet.

The decoder consumes the shared memory layout [t-token ; audio tokens]
produced by ``GestureDenoiser.denoise`` and splits it exactly like the
reference (``nn.py:516``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = jnp.dtype

zeros_init = nn.initializers.zeros


def group_norm(name: str, dtype=None) -> nn.Module:
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dtype, name=name)


class ResBlock1D(nn.Module):
    out_channels: int
    emb_channels: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array, train: bool) -> jax.Array:
        """x: (N, T, C); emb: (N, emb_channels)."""
        h = group_norm("norm_in", self.dtype)(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3,), padding=1, dtype=self.dtype,
                    name="conv_in")(h)
        emb_out = nn.Dense(2 * self.out_channels, dtype=self.dtype,
                           name="emb_proj")(jax.nn.silu(emb))
        scale, shift = jnp.split(emb_out[:, None, :], 2, axis=-1)
        h = group_norm("norm_out", self.dtype)(h) * (1 + scale) + shift
        h = jax.nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = nn.Conv(self.out_channels, (3,), padding=1, dtype=self.dtype,
                    kernel_init=zeros_init, bias_init=zeros_init,
                    name="conv_out")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1,), dtype=self.dtype,
                        name="skip_proj")(x)
        return x + h


class UNetAttentionBlock(nn.Module):
    heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array,
                 encoder_out: Optional[jax.Array] = None) -> jax.Array:
        """x: (N, T, C); encoder_out: (N, T_enc, C_enc) — width inferred."""
        n, t, c = x.shape
        d_k = c // self.heads
        h = group_norm("norm", self.dtype)(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(n, t, self.heads, 3 * d_k), 3, axis=-1)
        if encoder_out is not None:
            ekv = nn.Dense(2 * c, dtype=self.dtype, name="encoder_kv")(encoder_out)
            te = encoder_out.shape[1]
            ek, evv = jnp.split(ekv.reshape(n, te, self.heads, 2 * d_k), 2, axis=-1)
            k = jnp.concatenate([ek, k], axis=1)
            v = jnp.concatenate([evv, v], axis=1)
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(d_k, jnp.float32)))
        scores = jnp.einsum("nihd,njhd->nijh", q * scale, k * scale,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(scores, axis=2).astype(v.dtype)
        out = jnp.einsum("nijh,njhd->nihd", attn, v).reshape(n, t, c)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=zeros_init,
                       bias_init=zeros_init, name="proj_out")(out)
        return x + out


class UNet1D(nn.Module):
    """Input/middle/output blocks with skip concatenation
    (``glide/unet.py:280-493``), 1-D over time."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    num_heads: int = 1
    dropout: float = 0.0
    conv_resample: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array,
                 encoder_out: Optional[jax.Array], train: bool) -> jax.Array:
        """x: (N, T, in_channels); emb: (N, 4*model_channels)."""
        mc = self.model_channels
        attn_res = set(self.attention_resolutions)

        def res(ch, name):
            return ResBlock1D(ch, emb.shape[-1], self.dropout,
                              dtype=self.dtype, name=name)

        def attn(name):
            return UNetAttentionBlock(self.num_heads, dtype=self.dtype,
                                      name=name)

        h = nn.Conv(self.channel_mult[0] * mc, (3,), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        hs = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = res(mult * mc, f"down_{level}_{i}")(h, emb, train)
                if ds in attn_res:
                    h = attn(f"down_attn_{level}_{i}")(h, encoder_out)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.conv_resample:
                    h = nn.Conv(h.shape[-1], (3,), strides=(2,), padding=1,
                                dtype=self.dtype, name=f"downsample_{level}")(h)
                else:
                    h = nn.avg_pool(h, (2,), strides=(2,))
                hs.append(h)
                ds *= 2

        h = res(h.shape[-1], "middle_res1")(h, emb, train)
        h = attn("middle_attn")(h, encoder_out)
        h = res(h.shape[-1], "middle_res2")(h, emb, train)

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res(mult * mc, f"up_{level}_{i}")(h, emb, train)
                if ds in attn_res:
                    h = attn(f"up_attn_{level}_{i}")(h, encoder_out)
                if level and i == self.num_res_blocks:
                    n, t, c = h.shape
                    h = jax.image.resize(h, (n, t * 2, c), "nearest")
                    if self.conv_resample:
                        h = nn.Conv(c, (3,), padding=1, dtype=self.dtype,
                                    name=f"upsample_{level}")(h)
                    ds //= 2

        h = group_norm("norm_out", self.dtype)(h)
        h = jax.nn.silu(h)
        return nn.Conv(self.out_channels, (3,), padding=1, dtype=self.dtype,
                       kernel_init=zeros_init, bias_init=zeros_init,
                       name="conv_out")(h)


def _pad_lengths(window_len: int, n_levels: int) -> Tuple[int, int]:
    """Symmetric pad so T keeps halving cleanly (``nn.py:495-507``)."""
    def ok(length: int) -> bool:
        for _ in range(n_levels):
            length /= 2
        return length % 2 == 0

    t = window_len
    while not ok(t):
        t += 1
    if window_len % 2 != 0:
        raise NotImplementedError("uneven window length not supported")
    pad = (t - window_len) // 2
    return pad, pad


class UNetAttn(nn.Module):
    """Decoder wrapper (``nn.py:450-544``): memory[0] is the diffusion-step
    token (fed through the UNet's time-embed MLP), memory[1:] is the audio
    stream used as encoder K/V in the attention blocks."""

    d_x: int
    d_memory: int
    d_model: int
    heads: int
    n_layers: int                 # num_res_blocks per level
    d_out: int
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4)
    attention_resolutions: Sequence[int] = (1, 2, 4)
    window_len: int = 40
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, memory: jax.Array, train: bool) -> jax.Array:
        t_token, audio = memory[:, 0], memory[:, 1:]
        # time_embed_dim == model_channels in the reference's vendored GLIDE
        # (glide/unet.py:349 — NOT the upstream 4x widening)
        emb = nn.Dense(self.d_model, dtype=self.dtype,
                       name="time_embed_0")(t_token)
        emb = nn.Dense(self.d_model, dtype=self.dtype,
                       name="time_embed_2")(jax.nn.silu(emb))

        lo, hi = _pad_lengths(self.window_len, len(self.channel_mult) - 1)
        h = jnp.pad(x, ((0, 0), (lo, hi), (0, 0)))
        h = UNet1D(
            in_channels=self.d_x, model_channels=self.d_model,
            out_channels=self.d_out, num_res_blocks=self.n_layers,
            attention_resolutions=self.attention_resolutions,
            channel_mult=self.channel_mult, num_heads=self.heads,
            dropout=self.dropout,
            dtype=self.dtype, name="unet")(h, emb, audio, train)
        if lo or hi:
            h = h[:, lo:h.shape[1] - hi]
        return h

"""The conditional gesture denoiser (epsilon predictor).

Re-design of ``models/model.py:6-166`` + ``models/nn.py:17-52``.  The key
TPU restructuring: the model is split into

  * ``encode_memory(wav)``   — timestep-INDEPENDENT speech conditioning
    (mel front-end + SE-ResNet + projection (+ V2 blend)), computed ONCE per
    clip and closed over by the sampler's scan — the reference re-runs all
    of it for each of the 1000 denoising steps (SURVEY.md §3.2);
  * ``denoise(x_t, t, speech_memory)`` — the per-step work: sinusoidal
    timestep token + cross-attention decoder (+ inpaint projection).

``__call__(x_t, t, wav)`` composes both for training.  Layout is (N, T, C).

Model variants (``Model.type`` in configs):
  * "default" — memory = [t-token ; low ; mid ; high]  (model.py:23-73)
  * "s2g_v2"  — streams left-zero-padded to equal length, channel-concat,
    blended by a Linear to one stream (model.py:76-117); BEAT's choice
  * "inpaint" — adds x += zero-init MLP([seed_pose*mask ; mask])
    (model.py:120-166, GLIDE-style zero init)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .decoders import CrossAttention, OnewayCrossAttention
from .speech_encoder import HA2GSpeechEncoder

Dtype = jnp.dtype


def timestep_freqs(dim: int, max_period: float = 10000.0) -> jax.Array:
    """(dim//2,) sinusoid frequencies of the timestep embedding — the ONE
    definition shared with the fused sampler's in-kernel embedding
    (ops/fused_sampler.py), so the two paths cannot drift."""
    half = dim // 2
    return jnp.exp(-math.log(max_period)
                   * jnp.arange(half, dtype=jnp.float32) / half)


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal embedding, (N,) -> (N, dim); cos first then sin, matching
    the reference (``models/nn.py:17-35``)."""
    freqs = timestep_freqs(dim, max_period)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class DiffusionStepEncoder(nn.Module):
    d_model: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, t: jax.Array, train: bool) -> jax.Array:
        x = timestep_embedding(t, self.d_model).astype(self.dtype or jnp.float32)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="proj1")(x)
        x = jax.nn.silu(x)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="proj2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=not train)


@dataclasses.dataclass(frozen=True)
class DenoiserConfig:
    d_pose: int
    d_model: int = 256
    heads: int = 8
    n_layers: int = 4
    dropout: float = 0.0
    model_type: str = "s2g_v2"            # default | s2g_v2 | inpaint
    decoder_type: str = "oneway_cross_attention"
    # ^ | cross_attention | cross_attention_gcn | unet_attention
    pose_seed_len: int = 10               # inpaint only
    dtype: Optional[str] = None           # e.g. "bfloat16" (whole model)
    encoder_dtype: Optional[str] = None   # mixed precision: conv trunk only
    # ^ the SE-ResNet speech encoder is conv/MXU-bound and tolerates bf16;
    #   the decoder's LN/softmax paths are VPU-bound where bf16 cast churn
    #   LOSES time (measured, PERF.md) — so the policy splits them.
    # cross_attention_gcn extras
    graph_layout: str = "beat"
    graph_strategy: str = "spatial"
    # unet_attention extras
    channel_mult: tuple = (1, 2, 4)
    attention_resolutions: tuple = (1, 2, 4)
    window_len: int = 40

    @property
    def jax_dtype(self):
        return jnp.dtype(self.dtype) if self.dtype else None


class GestureDenoiser(nn.Module):
    cfg: DenoiserConfig

    def setup(self):
        c = self.cfg
        dt = c.jax_dtype
        enc_dt = jnp.dtype(c.encoder_dtype) if c.encoder_dtype else dt
        self.speech_encoder = HA2GSpeechEncoder(c.d_model, c.dropout,
                                                dtype=enc_dt)
        self.step_encoder = DiffusionStepEncoder(c.d_model, c.dropout, dtype=dt)
        common = dict(d_x=c.d_pose, d_memory=c.d_model, d_model=c.d_model,
                      heads=c.heads, n_layers=c.n_layers, d_out=c.d_pose,
                      dropout=c.dropout, dtype=dt)
        if c.decoder_type == "oneway_cross_attention":
            self.decoder = OnewayCrossAttention(**common)
        elif c.decoder_type == "cross_attention":
            self.decoder = CrossAttention(**common)
        elif c.decoder_type == "cross_attention_gcn":
            from .gcn_decoder import CrossAttentionGCN

            self.decoder = CrossAttentionGCN(
                graph_layout=c.graph_layout, graph_strategy=c.graph_strategy,
                **common)
        elif c.decoder_type == "unet_attention":
            from .unet_decoder import UNetAttn

            self.decoder = UNetAttn(
                channel_mult=tuple(c.channel_mult),
                attention_resolutions=tuple(c.attention_resolutions),
                window_len=c.window_len, **common)
        else:
            raise ValueError(f"Unsupported decoder type {c.decoder_type}")
        if c.model_type not in ("default", "s2g_v2", "inpaint"):
            # a typo'd model_type must not silently build the 'default'
            # architecture (the reference raises too, model_creation.py:160)
            raise ValueError(f"Unsupported model_type {c.model_type}")
        if c.model_type == "s2g_v2":
            self.blend_layer = nn.Dense(c.d_model, dtype=dt)
        if c.model_type == "inpaint":
            zeros = nn.initializers.zeros
            self.inpaint_proj = nn.Sequential([
                nn.Dense(c.d_model, kernel_init=zeros, bias_init=zeros, dtype=dt),
                jax.nn.silu,
                nn.Dense(c.d_model, kernel_init=zeros, bias_init=zeros, dtype=dt),
                jax.nn.silu,
                nn.Dense(c.d_pose, kernel_init=zeros, bias_init=zeros, dtype=dt),
            ])
            self.inpaint_dropout = nn.Dropout(c.dropout)

    # -- t-independent conditioning (hoisted out of sampler loops) ---------
    def encode_memory(self, wav: jax.Array, train: bool = False) -> jax.Array:
        """(N, T_wav) -> (N, T_mem, d_model) speech memory (no t-token)."""
        low, mid, high = self.speech_encoder(wav, train)
        if self.cfg.model_type == "s2g_v2":
            longest = max(s.shape[1] for s in (low, mid, high))
            streams = [
                jnp.pad(s, ((0, 0), (longest - s.shape[1], 0), (0, 0)))
                for s in (low, mid, high)
            ]
            z = jnp.concatenate(streams, axis=-1)          # (N, T, 3*d_model)
            return self.blend_layer(z)                     # (N, T, d_model)
        return jnp.concatenate([low, mid, high], axis=1)   # (N, T_l+T_m+T_h, d)

    def inpaint_projection(self, inpaint_pose: jax.Array,
                           inpaint_mask: jax.Array) -> jax.Array:
        """The inpaint model type's additive conditioning,
        MLP([pose*mask ; mask]) -> (N, T, d_pose) — t-INDEPENDENT, so
        samplers hoist it out of the denoising loop (the reference
        recomputes it inside every step, ``models/model.py:120-166``).
        Eval-path form: dropout is identity at ``train=False``."""
        inp = jnp.concatenate(
            [inpaint_pose * inpaint_mask, inpaint_mask], axis=-1)
        return self.inpaint_proj(inp)

    # -- per-step denoising --------------------------------------------------
    def denoise(
        self,
        x_t: jax.Array,                       # (N, T, d_pose)
        t: jax.Array,                         # (N,)
        speech_memory: jax.Array,             # (N, T_mem, d_model)
        train: bool = False,
        inpaint_pose: Optional[jax.Array] = None,   # (N, T, d_pose)
        inpaint_mask: Optional[jax.Array] = None,   # (N, T, 1)
    ) -> jax.Array:
        x = x_t
        if self.cfg.model_type == "inpaint":
            assert inpaint_pose is not None and inpaint_mask is not None
            inp = jnp.concatenate([inpaint_pose * inpaint_mask, inpaint_mask], axis=-1)
            proj = self.inpaint_proj(inp)
            proj = self.inpaint_dropout(proj, deterministic=not train)
            x = x + proj
        t_token = self.step_encoder(t, train)[:, None]     # (N, 1, d_model)
        # promote, never truncate: with encoder_dtype=bf16 on default/
        # inpaint models the raw stream concat is bf16, and casting the
        # fp32 step embedding DOWN to it would squeeze the timestep signal
        # to ~3 significant digits (policy is bf16 conv trunk, fp32 decoder)
        mdt = jnp.promote_types(t_token.dtype, speech_memory.dtype)
        memory = jnp.concatenate(
            [t_token.astype(mdt), speech_memory.astype(mdt)], axis=1)
        return self.decoder(x, memory, train)

    def __call__(
        self,
        x_t: jax.Array,
        t: jax.Array,
        wav: jax.Array,
        train: bool = False,
        inpaint_pose: Optional[jax.Array] = None,
        inpaint_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        memory = self.encode_memory(wav, train)
        return self.denoise(x_t, t, memory, train, inpaint_pose, inpaint_mask)

"""Full GLIDE UNet model family, TPU-native (channel-last, dims 1 / 2).

Parity surface: ``/root/reference/models/modules/glide/unet.py`` —
``UNetModel`` (:280-527) including the branches the reference's operational
1-D gesture path never exercises: 2-D signals (NHWC here), class
conditioning via a label embedding (:296-297, :356-357, :511-513),
``resblock_updown`` up/down residual blocks (:108-110, :142-149),
``num_head_channels`` / ``num_heads_upsample`` attention head selection
(:218-224), and the conditioned variants ``SuperResUNetModel`` (:528),
``InpaintUNetModel`` (:551) and ``SuperResInpaintUNetModel`` (:578).

Reference defects reconstructed here (documented, not copied):
  * ``timestep_embedding`` is referenced at ``unet.py:509`` but defined
    nowhere in the repository — a latent ``NameError`` on the dead 2-D
    path.  Reconstructed to the published GLIDE convention:
    ``cat([cos(t f), sin(t f)])`` with ``f = exp(-ln(1e4) * k / half)``.
  * stray debug ``print(h.shape)`` in ``forward`` (:517, :524) dropped.

Layout notes (TPU-first):
  * activations are channel-LAST — (N, T, C) for dims=1, (N, H, W, C) for
    dims=2 — so convs lower to XLA NHWC convolutions that tile directly
    onto the MXU without layout transposes;
  * attention keeps the reference's head-major interleaved QKV channel
    order ([h0: q|k|v, h1: q|k|v, ...], ``unet.py:264``) so torch
    checkpoints transplant with a plain transpose
    (``interop/torch_import.py::import_glide_unet_state_dict``);
  * GroupNorm statistics are computed in fp32 regardless of ``dtype``
    (reference ``GroupNorm32`` casts to float, ``glide/nn.py:15``).

3-D signals (``dims == 3``) are intentionally unsupported: the reference's
3-D branch is dead on every call path and its inner-two-dims pooling
special case has no consumer.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = jnp.dtype

zeros_init = nn.initializers.zeros


def timestep_embedding(timesteps: jax.Array, dim: int,
                       max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embedding, GLIDE convention (the reference calls
    this at ``unet.py:509`` without ever defining it).  Frequencies come
    from the ONE shared definition (``denoiser.timestep_freqs``, also used
    by the fused kernel) so the three paths cannot drift."""
    from .denoiser import timestep_freqs

    freqs = timestep_freqs(dim, max_period)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _group_norm(name: str) -> nn.Module:
    # reference normalization() == GroupNorm32(32, ch) with fp32 stats
    # regardless of the model compute dtype (glide/nn.py:15)
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                        name=name)


def _resize_nearest(x: jax.Array, factor: int) -> jax.Array:
    spatial = tuple(s * factor for s in x.shape[1:-1])
    return jax.image.resize(x, (x.shape[0], *spatial, x.shape[-1]),
                            method="nearest")


def _avg_pool(x: jax.Array) -> jax.Array:
    nd = x.ndim - 2
    return nn.avg_pool(x, (2,) * nd, strides=(2,) * nd)


class GlideResBlock(nn.Module):
    """``unet.py:96-198``: GroupNorm+SiLU+conv in, FiLM or additive
    timestep conditioning, zero-init out conv, optional internal
    up/downsampling (``up``/``down``; the non-conv resample is applied to
    both the residual branch and the skip, after the input norm+SiLU but
    before the input conv — ``unet.py:181-186``)."""

    out_channels: int
    dropout: float = 0.0
    use_conv: bool = False          # 3x3 (vs 1x1) channel-change skip
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array, train: bool) -> jax.Array:
        nd = x.ndim - 2
        k3 = (3,) * nd
        h = _group_norm("in_norm")(x).astype(x.dtype)
        h = jax.nn.silu(h)
        if self.up:
            h = _resize_nearest(h, 2)
            x = _resize_nearest(x, 2)
        elif self.down:
            h = _avg_pool(h)
            x = _avg_pool(x)
        h = nn.Conv(self.out_channels, k3, padding=1, dtype=self.dtype,
                    name="in_conv")(h)
        width = 2 * self.out_channels if self.use_scale_shift_norm \
            else self.out_channels
        e = nn.Dense(width, dtype=self.dtype,
                     name="emb_proj")(jax.nn.silu(emb))
        e = e.reshape(e.shape[0], *(1,) * nd, e.shape[-1])
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(e, 2, axis=-1)
            h = _group_norm("out_norm")(h).astype(h.dtype)
            h = h * (1 + scale) + shift
        else:
            h = h + e
            h = _group_norm("out_norm")(h).astype(h.dtype)
        h = jax.nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = nn.Conv(self.out_channels, k3, padding=1, dtype=self.dtype,
                    kernel_init=zeros_init, bias_init=zeros_init,
                    name="out_conv")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, k3 if self.use_conv else (1,) * nd,
                        padding=1 if self.use_conv else 0, dtype=self.dtype,
                        name="skip")(x)
        return x + h


class GlideAttentionBlock(nn.Module):
    """``unet.py:201-278``: flattened-spatial self-attention with optional
    encoder K/V; q and k pre-scaled by ``1/sqrt(sqrt(d))``, softmax in
    fp32; QKV channels head-major interleaved as in the reference."""

    num_heads: int = 1
    num_head_channels: int = -1
    encoder_channels: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array,
                 encoder_out: Optional[jax.Array] = None) -> jax.Array:
        n, *spatial, c = x.shape
        if self.num_head_channels == -1:
            heads = self.num_heads
        else:
            assert c % self.num_head_channels == 0, \
                f"channels {c} not divisible by head width {self.num_head_channels}"
            heads = c // self.num_head_channels
        d_k = c // heads
        t = int(np.prod(spatial))
        h = _group_norm("norm")(x).astype(x.dtype)
        h = h.reshape(n, t, c)
        # (n, t, heads, 3, d_k): channel j of the torch 1x1 conv maps to
        # head j // (3 d_k), slot (j % (3 d_k)) // d_k — same flatten order
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h)
        q, k, v = [a[..., 0, :] for a in jnp.split(
            qkv.reshape(n, t, heads, 3, d_k), 3, axis=3)]
        if encoder_out is not None:
            ekv = nn.Dense(2 * c, dtype=self.dtype,
                           name="encoder_kv")(encoder_out)
            te = encoder_out.shape[1]
            ek, ev = [a[..., 0, :] for a in jnp.split(
                ekv.reshape(n, te, heads, 2, d_k), 2, axis=3)]
            k = jnp.concatenate([ek, k], axis=1)
            v = jnp.concatenate([ev, v], axis=1)
        scale = 1.0 / np.sqrt(np.sqrt(d_k))
        scores = jnp.einsum("nihd,njhd->nijh", q * scale, k * scale,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(scores, axis=2).astype(v.dtype)
        out = jnp.einsum("nijh,njhd->nihd", attn, v).reshape(n, t, c)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=zeros_init,
                       bias_init=zeros_init, name="proj_out")(out)
        return x + out.reshape(n, *spatial, c)


class GlideUNet(nn.Module):
    """``unet.py:280-527`` in full: input/middle/output blocks with skip
    concatenation, attention at the configured downsample rates, optional
    class conditioning and resblock-based up/downsampling."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    dims: int = 2
    num_classes: Optional[int] = None
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    encoder_channels: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, timesteps: jax.Array,
                 y: Optional[jax.Array] = None,
                 encoder_out: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        assert self.dims in (1, 2), "dims must be 1 or 2 (see module docstring)"
        assert x.ndim == self.dims + 2, \
            f"expected channel-last rank-{self.dims + 2} input, got {x.shape}"
        assert (y is not None) == (self.num_classes is not None), \
            "must pass y iff the model is class-conditional (unet.py:504-506)"
        mc = self.model_channels
        attn_res = set(self.attention_resolutions)
        nd = self.dims
        k3 = (3,) * nd
        heads_up = self.num_heads_upsample
        if heads_up == -1:
            heads_up = self.num_heads

        def res(ch, name, **kw):
            return GlideResBlock(
                ch, self.dropout,
                use_scale_shift_norm=self.use_scale_shift_norm,
                dtype=self.dtype, name=name, **kw)

        def attn(name, heads):
            return GlideAttentionBlock(
                heads, self.num_head_channels, self.encoder_channels,
                dtype=self.dtype, name=name)

        emb = timestep_embedding(timesteps, mc).astype(
            self.dtype or jnp.float32)
        emb = nn.Dense(mc, dtype=self.dtype, name="time_embed_0")(emb)
        emb = nn.Dense(mc, dtype=self.dtype,
                       name="time_embed_2")(jax.nn.silu(emb))
        if self.num_classes is not None:
            emb = emb + nn.Embed(self.num_classes, mc, dtype=self.dtype,
                                 name="label_emb")(y)

        h = nn.Conv(self.channel_mult[0] * mc, k3, padding=1,
                    dtype=self.dtype, name="input_0_conv")(x)
        hs = [h]
        ds, idx = 1, 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = res(mult * mc, f"input_{idx}_res")(h, emb, train)
                if ds in attn_res:
                    h = attn(f"input_{idx}_attn", self.num_heads)(
                        h, encoder_out)
                hs.append(h)
                idx += 1
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res(h.shape[-1], f"input_{idx}_down",
                            down=True)(h, emb, train)
                elif self.conv_resample:
                    h = nn.Conv(h.shape[-1], k3, strides=2, padding=1,
                                dtype=self.dtype,
                                name=f"input_{idx}_down")(h)
                else:
                    h = _avg_pool(h)
                hs.append(h)
                idx += 1
                ds *= 2

        h = res(h.shape[-1], "middle_res1")(h, emb, train)
        h = attn("middle_attn", self.num_heads)(h, encoder_out)
        h = res(h.shape[-1], "middle_res2")(h, emb, train)

        idx = 0
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res(mult * mc, f"output_{idx}_res")(h, emb, train)
                if ds in attn_res:
                    h = attn(f"output_{idx}_attn", heads_up)(h, encoder_out)
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = res(h.shape[-1], f"output_{idx}_up",
                                up=True)(h, emb, train)
                    else:
                        h = _resize_nearest(h, 2)
                        if self.conv_resample:
                            h = nn.Conv(h.shape[-1], k3, padding=1,
                                        dtype=self.dtype,
                                        name=f"output_{idx}_up")(h)
                    ds //= 2
                idx += 1

        h = _group_norm("out_norm")(h).astype(h.dtype)
        h = jax.nn.silu(h)
        return nn.Conv(self.out_channels, k3, padding=1, dtype=self.dtype,
                       kernel_init=zeros_init, bias_init=zeros_init,
                       name="out_conv")(h)


def _resize_linear(x: jax.Array, spatial: Sequence[int]) -> jax.Array:
    return jax.image.resize(
        x, (x.shape[0], *spatial, x.shape[-1]), method="linear")


class SuperResGlideUNet(nn.Module):
    """``unet.py:528-549``: conditions on a low-resolution input, upsampled
    (bi)linearly to the target resolution and channel-concatenated."""

    unet: GlideUNet

    def __call__(self, x, timesteps, low_res, **kw):
        up = _resize_linear(low_res, x.shape[1:-1])
        return self.unet(jnp.concatenate([x, up], axis=-1), timesteps, **kw)

    @staticmethod
    def config(in_channels: int, **kw) -> dict:
        return dict(in_channels=in_channels * 2, **kw)


class InpaintGlideUNet(nn.Module):
    """``unet.py:551-576``: conditions on a masked image + its mask."""

    unet: GlideUNet

    def __call__(self, x, timesteps, inpaint_image=None, inpaint_mask=None,
                 **kw):
        if inpaint_image is None:
            inpaint_image = jnp.zeros_like(x)
        if inpaint_mask is None:
            inpaint_mask = jnp.zeros_like(x[..., :1])
        return self.unet(
            jnp.concatenate(
                [x, inpaint_image * inpaint_mask,
                 jnp.broadcast_to(inpaint_mask, (*x.shape[:-1], 1))],
                axis=-1),
            timesteps, **kw)

    @staticmethod
    def config(in_channels: int, **kw) -> dict:
        return dict(in_channels=in_channels * 2 + 1, **kw)


class SuperResInpaintGlideUNet(nn.Module):
    """``unet.py:578-611``: inpainting + super-resolution conditioning."""

    unet: GlideUNet

    def __call__(self, x, timesteps, inpaint_image=None, inpaint_mask=None,
                 low_res=None, **kw):
        if inpaint_image is None:
            inpaint_image = jnp.zeros_like(x)
        if inpaint_mask is None:
            inpaint_mask = jnp.zeros_like(x[..., :1])
        up = _resize_linear(low_res, x.shape[1:-1])
        return self.unet(
            jnp.concatenate(
                [x, inpaint_image * inpaint_mask,
                 jnp.broadcast_to(inpaint_mask, (*x.shape[:-1], 1)), up],
                axis=-1),
            timesteps, **kw)

    @staticmethod
    def config(in_channels: int, **kw) -> dict:
        return dict(in_channels=in_channels * 3 + 1, **kw)

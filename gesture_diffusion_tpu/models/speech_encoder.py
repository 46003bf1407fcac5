"""HA2G hierarchical speech encoder, TPU-native (NHWC, flax).

Re-design of the reference stack
``models/modules/ha2g/speech_encoder.py:9-61`` +
``ha2g/model/ResNetSE34V2.py:13-221`` + ``ResNetBlocks.py:7-96``:

  mel spectrogram (frozen front-end, see ``ops/audio.py``)
    -> 3x3 conv stem -> SE-ResNet [3,4,6,3] with filters [32,64,128,256]
    -> taps after layer2/3/4
    -> per-tap head: (pixel-shuffle to realign time) + valid conv + BN
       + Linear over the flattened (channel, freq) axis -> 32-d sequence
    -> shared Linear 32 -> d_model producing (low, mid, high) streams.

Differences from the reference's CUDA/torch habits: NHWC layout (freq=H,
time=W) so convs map directly onto TPU convolution tiling; BatchNorm uses a
``batch_stats`` collection and, under pjit data parallelism, computes
global-batch statistics automatically (the reference's per-GPU BN is a DDP
artifact, not a design choice).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.audio import speech_frontend

Dtype = jnp.dtype


def pixel_shuffle_nhwc(x: jax.Array, r: int) -> jax.Array:
    """torch ``PixelShuffle(r)`` semantics on NHWC:
    out[n, h*r+i, w*r+j, c] = in[n, h, w, c*r*r + i*r + j]."""
    n, h, w, c = x.shape
    cp = c // (r * r)
    x = x.reshape(n, h, w, cp, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)          # n, h, i, w, j, cp
    return x.reshape(n, h * r, w * r, cp)


class SELayer(nn.Module):
    channels: int
    reduction: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = x.mean(axis=(1, 2))                               # (N, C)
        y = nn.Dense(self.channels // self.reduction, dtype=self.dtype)(y)
        y = jax.nn.relu(y)
        y = nn.Dense(self.channels, dtype=self.dtype)(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class SEBasicBlock(nn.Module):
    """conv-relu-bn / conv-bn-se / +residual / relu (reference block order,
    ``ResNetBlocks.py:21-37``)."""

    planes: int
    stride: int = 1
    use_projection: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        residual = x
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = jax.nn.relu(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(y)
        y = SELayer(self.planes, dtype=self.dtype, name="se")(y)
        if self.use_projection:
            residual = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype, name="proj_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    name="proj_bn")(residual)
        return jax.nn.relu(y + residual)


class SEBottleneck(nn.Module):
    """1x1 reduce / 3x3 / 1x1 expand(x4) bottleneck with SE, bn-then-relu
    order (reference ``ResNetBlocks.py:40-78``).  Unused by the reference's
    operational config (its ResNetSE34V2 builds SEBasicBlocks only) but part
    of its model-zoo surface; expansion = 4.
    """

    planes: int
    stride: int = 1
    use_projection: bool = False
    dtype: Optional[Dtype] = None

    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn3")(y)
        y = SELayer(self.planes * self.expansion, dtype=self.dtype,
                    name="se")(y)
        if self.use_projection:
            residual = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=self.stride, use_bias=False,
                               dtype=self.dtype, name="proj_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    name="proj_bn")(residual)
        return jax.nn.relu(y + residual)


class TapHead(nn.Module):
    """valid conv + relu + bn + Linear over flattened (channel, freq)."""

    channels: int
    kernel: int
    n_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        y = nn.Conv(self.channels, (self.kernel, self.kernel), padding="VALID",
                    dtype=self.dtype, name="conv")(x)
        y = jax.nn.relu(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(y)
        # (N, H, W, C) -> (N, W, C*H): channel-major flatten like the
        # reference's NCHW reshape (ResNetSE34V2.py:160-162)
        y = y.transpose(0, 2, 3, 1)
        y = y.reshape(y.shape[0], y.shape[1], -1)
        return nn.Dense(self.n_out, dtype=self.dtype, name="fc")(y)


class SEResNetEncoder(nn.Module):
    """SE-ResNet-34-ish trunk over the mel image with three temporal taps."""

    layers: Sequence[int] = (3, 4, 6, 3)
    filters: Sequence[int] = (32, 64, 128, 256)
    n_out: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, mel: jax.Array, train: bool
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """mel: (N, n_mels, T_spec) -> three (N, T_i, n_out) streams."""
        x = mel[..., None]                                    # (N, F, T, 1)
        x = nn.Conv(self.filters[0], (3, 3), padding=1, dtype=self.dtype,
                    name="stem_conv")(x)
        x = jax.nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn")(x)

        def stage(x, planes, blocks, stride, name):
            in_ch = x.shape[-1]
            for b in range(blocks):
                x = SEBasicBlock(
                    planes,
                    stride=stride if b == 0 else 1,
                    use_projection=(b == 0 and (stride != 1 or in_ch != planes)),
                    dtype=self.dtype,
                    name=f"{name}_block{b}",
                )(x, train)
            return x

        x = stage(x, self.filters[0], self.layers[0], 1, "layer1")
        f1 = stage(x, self.filters[1], self.layers[1], 2, "layer2")
        f2 = stage(f1, self.filters[2], self.layers[2], 2, "layer3")
        f3 = stage(f2, self.filters[3], self.layers[3], 2, "layer4")

        low = TapHead(self.filters[1], 2, self.n_out, dtype=self.dtype,
                      name="head_low")(f1, train)
        mid = TapHead(self.filters[1] // 2, 3, self.n_out, dtype=self.dtype,
                      name="head_mid")(pixel_shuffle_nhwc(f2, 2), train)
        high = TapHead(self.filters[1] // 4, 3, self.n_out, dtype=self.dtype,
                       name="head_high")(pixel_shuffle_nhwc(f3, 4), train)
        return low, mid, high


class HA2GSpeechEncoder(nn.Module):
    """Waveform -> three (N, T_i, d_model) feature streams."""

    d_model: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, wav: jax.Array, train: bool
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        mel = speech_frontend(wav)                             # frozen, no params
        mel = mel.astype(self.dtype or jnp.float32)
        low, mid, high = SEResNetEncoder(dtype=self.dtype, name="resnet")(mel, train)
        proj = nn.Dense(self.d_model, dtype=self.dtype, name="wav_proj")
        drop = nn.Dropout(self.dropout)
        det = not train
        return (proj(drop(low, deterministic=det)),
                proj(drop(mid, deterministic=det)),
                proj(drop(high, deterministic=det)))

"""Waveform front-end: pre-emphasis + mel spectrogram, pure JAX.

Replaces the reference's frozen torchaudio pipeline
(``models/modules/ha2g/speech_encoder.py:18-27`` and
``ha2g/model/utils.py:22-38``) with native ops:

  * pre-emphasis y[t] = x[t] - 0.97*x[t-1], left reflect pad (y[0] uses x[1]);
  * STFT: center=True reflect padding, periodic Hann window, n_fft=1024,
    hop=512, power-2 magnitude;
  * HTK mel filterbank (torchaudio ``mel_scale="htk"``, ``norm=None``),
    f_min=0, f_max=sr/2, applied as a single (n_freqs, n_mels) matmul —
    MXU-friendly;
  * instance normalisation over time per (batch, mel) channel
    (torch ``InstanceNorm1d(128)``, eps 1e-5, no affine).

The whole front-end is fused by XLA into the surrounding jit; frames are
materialised with a gather and reduced via one rFFT + one matmul.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def pre_emphasis(wav: jax.Array, coef: float = 0.97) -> jax.Array:
    """(N, T) -> (N, T)."""
    prev = jnp.concatenate([wav[:, 1:2], wav[:, :-1]], axis=1)
    return wav - coef * prev


def hann_window(n: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann (torch ``hann_window(periodic=True)``)."""
    k = np.arange(n)
    return jnp.asarray(0.5 - 0.5 * np.cos(2.0 * np.pi * k / n), dtype=dtype)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


# Slaney mel scale (librosa's default, htk=False): linear below 1 kHz at
# 3/200 mel/Hz, logarithmic above with step log(6.4)/27
_SLANEY_F_SP = 200.0 / 3.0
_SLANEY_MIN_LOG_HZ = 1000.0
_SLANEY_MIN_LOG_MEL = _SLANEY_MIN_LOG_HZ / _SLANEY_F_SP     # = 15.0
_SLANEY_LOGSTEP = np.log(6.4) / 27.0


def _hz_to_mel_slaney(f):
    f = np.asarray(f, np.float64)
    return np.where(
        f >= _SLANEY_MIN_LOG_HZ,
        _SLANEY_MIN_LOG_MEL + np.log(np.maximum(f, 1e-12)
                                     / _SLANEY_MIN_LOG_HZ) / _SLANEY_LOGSTEP,
        f / _SLANEY_F_SP)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    return np.where(
        m >= _SLANEY_MIN_LOG_MEL,
        _SLANEY_MIN_LOG_HZ * np.exp(_SLANEY_LOGSTEP
                                    * (m - _SLANEY_MIN_LOG_MEL)),
        m * _SLANEY_F_SP)


def mel_filterbank(
    n_freqs: int, n_mels: int, sample_rate: int,
    f_min: float = 0.0, f_max: "float | None" = None,
    htk: bool = True, norm: "str | None" = None,
) -> np.ndarray:
    """(n_freqs, n_mels) triangular mel filterbank.

    Defaults (htk=True, norm=None) match the torchaudio front-end the
    reference's speech encoder froze (``ha2g/model/utils.py:22-38``);
    htk=False + norm="slaney" is librosa's default basis, needed by the
    onset-detection path (``generation/eval_utils.py``)."""
    f_max = sample_rate / 2.0 if f_max is None else f_max
    hz_to_mel = _hz_to_mel_htk if htk else _hz_to_mel_slaney
    mel_to_hz = _mel_to_hz_htk if htk else _mel_to_hz_slaney
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)                              # (n_mels + 2,)
    f_diff = np.diff(f_pts)                               # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        # area normalisation: each triangle scaled to ~constant energy
        fb *= (2.0 / (f_pts[2:] - f_pts[:-2]))[None, :]
    elif norm is not None:
        raise ValueError(f"unknown mel norm {norm!r}")
    return fb.astype(np.float32)


def frame_signal(wav: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Center-padded (reflect) framing: (N, T) -> (N, n_frames, n_fft)."""
    pad = n_fft // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[:, idx]


@partial(jax.jit, static_argnames=("sample_rate", "n_fft", "hop_length",
                                   "n_mels", "htk", "norm"))
def mel_spectrogram(
    wav: jax.Array,
    sample_rate: int = 16000,
    n_fft: int = 1024,
    hop_length: int = 512,
    n_mels: int = 128,
    htk: bool = True,
    norm: "str | None" = None,
) -> jax.Array:
    """(N, T_wav) -> (N, n_mels, n_frames), power spectrogram x mel fbank."""
    frames = frame_signal(wav.astype(jnp.float32), n_fft, hop_length)
    frames = frames * hann_window(n_fft)
    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2      # (N, F, n_fft/2+1)
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate,
                                    htk=htk, norm=norm))
    mel = spec @ fb                                          # (N, F, n_mels)
    return jnp.swapaxes(mel, 1, 2)


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-(batch, channel) normalisation over the trailing time axis:
    (N, C, T) -> (N, C, T)."""
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def speech_frontend(wav: jax.Array, n_mels: int = 128) -> jax.Array:
    """Full frozen front-end: (N, T_wav) -> (N, n_mels, n_frames)."""
    mel = mel_spectrogram(pre_emphasis(wav), n_mels=n_mels) + 1e-6
    return instance_norm(mel)

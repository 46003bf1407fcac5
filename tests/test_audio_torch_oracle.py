"""Mel front-end vs a torch-STFT oracle (torchaudio's documented pipeline:
reflect-padded center STFT, periodic Hann, power 2, HTK mel fbank)."""

import numpy as np
import pytest
import torch

from gesture_diffusion_tpu.ops import audio


@pytest.fixture(scope="module")
def wav():
    return np.random.default_rng(0).normal(0, 0.3, (2, 16000)).astype(np.float32)


def torch_mel(wav_np, sr=16000, n_fft=1024, hop=512, n_mels=128):
    window = torch.hann_window(n_fft, periodic=True)
    spec = torch.stft(torch.from_numpy(wav_np), n_fft, hop, window=window,
                      center=True, pad_mode="reflect", return_complex=True)
    power = spec.abs() ** 2                       # (N, F, T)
    fb = torch.from_numpy(audio.mel_filterbank(n_fft // 2 + 1, n_mels, sr))
    return torch.einsum("nft,fm->nmt", power, fb).numpy()


def test_mel_matches_torch_stft(wav):
    import jax.numpy as jnp

    ours = np.asarray(audio.mel_spectrogram(jnp.asarray(wav)))
    ref = torch_mel(wav)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_speech_frontend_forwards_n_mels(wav):
    """speech_frontend(n_mels=k) must actually produce k mel channels —
    the parameter used to be silently dropped (always 128)."""
    import jax.numpy as jnp

    out = np.asarray(audio.speech_frontend(jnp.asarray(wav), n_mels=64))
    assert out.shape[1] == 64


def test_pre_emphasis_matches_torch_conv(wav):
    import jax.numpy as jnp
    import torch.nn.functional as F

    x = torch.from_numpy(wav).unsqueeze(1)
    x = F.pad(x, (1, 0), "reflect")
    filt = torch.tensor([[[-0.97, 1.0]]])
    ref = F.conv1d(x, filt).squeeze(1).numpy()
    ours = np.asarray(audio.pre_emphasis(jnp.asarray(wav)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_vis_skeleton_gif_smoke(tmp_path):
    from gesture_diffusion_tpu.data import Skeleton, parse_bvh
    from gesture_diffusion_tpu.export.vis_skeleton import (
        make_skeleton_video,
        pose_to_positions,
    )
    from tests.test_data import TOY_BVH

    sk = Skeleton.from_bvh(parse_bvh(TOY_BVH, is_text=True))
    pose = np.random.default_rng(1).uniform(-20, 20, (4, 3 * 3))
    pos = pose_to_positions(sk, pose, ["Spine", "Head", "LeftArm"])
    out = make_skeleton_video(pos, sk, str(tmp_path / "skel.gif"), fps=4,
                              wav=np.zeros(3200, np.float32), lim=5)
    import os

    assert os.path.getsize(out) > 1000
    assert os.path.exists(str(tmp_path / "skel.wav"))

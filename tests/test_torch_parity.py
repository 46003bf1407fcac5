"""Full-model forward parity vs the reference PyTorch implementation.

One set of weights, both frameworks: the reference flagship model
(``Speech2GestureModelV2`` + HA2G encoder + 4-layer oneway decoder,
``/root/reference/models/model.py:76-117``) is instantiated in torch,
its randomly-initialized ``state_dict`` is transplanted into our
``GestureDenoiser`` via ``interop.import_torch_state_dict``, and the full
eps-prediction forward is compared on fixed inputs.

The reference code is EXECUTED, never copied (repo norm).  Its module-level
imports need two stubs that this environment lacks:
  * ``torchaudio.transforms.MelSpectrogram`` — re-created from torchaudio's
    documented pipeline (center reflect-pad STFT, periodic Hann, power 2,
    HTK mel fbank, norm=None) with torch.stft; this repo's JAX mel is
    separately pinned to the same oracle in ``test_audio_torch_oracle.py``.
  * ``fasttext`` — imported by the reference's ``vocab.py`` at module level
    but unused on the model path.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"


def _install_stubs():
    import os

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    if "torchaudio" not in sys.modules:
        from gesture_diffusion_tpu.ops import audio as jaudio

        class MelSpectrogram(torch.nn.Module):
            def __init__(self, sample_rate=16000, n_fft=400, hop_length=None,
                         n_mels=128, **_):
                super().__init__()
                self.n_fft, self.n_mels = n_fft, n_mels
                self.hop = hop_length or n_fft // 2
                self.register_buffer(
                    "window", torch.hann_window(n_fft, periodic=True))
                self.register_buffer("fb", torch.from_numpy(
                    jaudio.mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate)))

            def forward(self, wav):
                spec = torch.stft(
                    wav, self.n_fft, self.hop, window=self.window,
                    center=True, pad_mode="reflect", return_complex=True)
                power = spec.abs() ** 2                    # (N, F, T)
                return torch.einsum("nft,fm->nmt", power, self.fb)

        ta = types.ModuleType("torchaudio")
        ta.transforms = types.ModuleType("torchaudio.transforms")
        ta.transforms.MelSpectrogram = MelSpectrogram
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = ta.transforms
    sys.modules.setdefault("fasttext", types.ModuleType("fasttext"))
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


@pytest.fixture(scope="module")
def ref_model():
    _install_stubs()
    from models.model import Speech2GestureModelV2
    from models.modules.ha2g.speech_encoder import HA2GSpeechEncoder
    from models.nn import DiffusionStepEncoder, OnewayCrossAttention

    torch.manual_seed(7)
    d_pose, d_model = 123, 256
    model = Speech2GestureModelV2(
        d_pose, d_model,
        HA2GSpeechEncoder(d_model=d_model, dropout_prob=0.0),
        OnewayCrossAttention(d_x=d_pose, d_memory=d_model, d_model=d_model,
                             heads=8, dropout_prob=0.0, n_layers=4,
                             d_out=d_pose),
        DiffusionStepEncoder(d_model, 0.0),
    )
    # a couple of train-mode passes so BN running stats move off (0, 1) —
    # otherwise a mean/var transplant bug would be invisible
    rng = np.random.default_rng(3)
    model.train()
    with torch.no_grad():
        for i in range(2):
            wav = torch.from_numpy(
                rng.normal(0, 0.3, (2, 32000)).astype(np.float32))
            x = torch.from_numpy(
                rng.normal(size=(2, d_pose, 40)).astype(np.float32))
            t = torch.tensor([i, 500 + i])
            model(x, t, wav=wav)
    model.eval()
    return model


def test_forward_parity(ref_model):
    import jax
    import jax.numpy as jnp

    from gesture_diffusion_tpu.interop import import_torch_state_dict
    from gesture_diffusion_tpu.models import DenoiserConfig, GestureDenoiser

    cfg = DenoiserConfig(d_pose=123)
    model = GestureDenoiser(cfg)
    variables = import_torch_state_dict(ref_model.state_dict(), cfg)

    # structure parity with a fresh init (catches missing/extra leaves)
    rng = np.random.default_rng(0)
    wav_np = rng.normal(0, 0.3, (2, 32000)).astype(np.float32)
    x_np = rng.normal(size=(2, 40, 123)).astype(np.float32)
    t_np = np.array([3, 977], np.int32)
    init_vars = GestureDenoiser(cfg).init(
        jax.random.key(0), jnp.asarray(x_np), jnp.asarray(t_np),
        jnp.asarray(wav_np), train=False)
    ours_paths = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_leaves_with_path(init_vars)}
    theirs_paths = {jax.tree_util.keystr(p)
                    for p, _ in jax.tree_util.tree_leaves_with_path(variables)}
    assert ours_paths == theirs_paths

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(x_np.transpose(0, 2, 1)),   # (N, C, T)
            torch.from_numpy(t_np.astype(np.int64)),
            wav=torch.from_numpy(wav_np),
        ).numpy().transpose(0, 2, 1)                      # -> (N, T, C)

    ours = np.asarray(model.apply(
        variables, jnp.asarray(x_np), jnp.asarray(t_np), jnp.asarray(wav_np),
        train=False))

    assert ours.shape == ref_out.shape == (2, 40, 123)
    scale = np.abs(ref_out).max()
    err = np.abs(ours - ref_out).max()
    assert err < 1e-3 * max(scale, 1.0), (
        f"max abs err {err:.2e} vs output scale {scale:.2e}")


def test_param_count_matches_torch(ref_model):
    import jax

    from gesture_diffusion_tpu.interop import import_torch_state_dict
    from gesture_diffusion_tpu.models import DenoiserConfig

    cfg = DenoiserConfig(d_pose=123)
    variables = import_torch_state_dict(ref_model.state_dict(), cfg)
    n_ours = sum(x.size for x in jax.tree.leaves(variables["params"]))
    n_ref = sum(p.numel() for p in ref_model.parameters() if p.requires_grad)
    assert n_ours == n_ref

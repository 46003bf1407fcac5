"""Independent-oracle assurance for the librosa-free onset front-end.

librosa itself cannot be executed in this environment (the golden harness
``tools/make_onset_goldens.py`` stays available for when it can), but
``transformers.audio_utils`` ships a numpy reimplementation of librosa's
DSP primitives — ``mel_filter_bank(norm="slaney", mel_scale="slaney")``
and ``spectrogram(center=True, pad_mode="reflect")`` were ported from
librosa and are maintained as numerically-equivalent.  That makes them a
genuine EXTERNAL oracle for everything below librosa's peak picker:

  * the Slaney mel basis used by ``generation/eval_utils.onset_strength``
    (mel-basis normalisation drift — one of the two known failure classes);
  * STFT framing, periodic-Hann windowing and the center/reflect padding
    (whose mis-handling caused the pre-a74ff08 systematic 64 ms shift —
    the other known failure class);
  * power→dB conversion (ref=1, amin=1e-10, top_db=80) and the lag-1
    positive-flux + center-compensation envelope assembly.

The only stage left un-oracled is ``peak_pick`` (pure index logic,
covered analytically by click-train tests here and in
``test_eval_export.py``).  Reference usage under test:
``/root/reference/models/eval_utils.py:100`` (librosa.onset.onset_detect).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from make_onset_goldens import SR, onset_golden_waveforms  # noqa: E402

ta = pytest.importorskip("transformers.audio_utils")

WAVEFORMS = dict(onset_golden_waveforms())


def test_slaney_mel_basis_matches_librosa_port():
    from gesture_diffusion_tpu.ops.audio import mel_filterbank

    ours = mel_filterbank(1025, 128, SR, htk=False, norm="slaney")
    ref = ta.mel_filter_bank(1025, 128, 0.0, SR / 2.0, SR,
                             norm="slaney", mel_scale="slaney")
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-7 * ref.max())


def test_htk_mel_basis_matches_librosa_port():
    # the speech encoder's frozen torchaudio basis (htk=True, norm=None)
    from gesture_diffusion_tpu.ops.audio import mel_filterbank

    ours = mel_filterbank(513, 128, SR, htk=True, norm=None)
    ref = ta.mel_filter_bank(513, 128, 0.0, SR / 2.0, SR,
                             norm=None, mel_scale="htk")
    np.testing.assert_allclose(ours, ref, atol=1e-6 * ref.max())


@pytest.mark.parametrize("name", ["click_2hz", "clicks_in_noise",
                                  "tone_bursts", "speechy_noise"])
def test_mel_spectrogram_matches_oracle(name):
    import jax.numpy as jnp

    from gesture_diffusion_tpu.ops.audio import mel_spectrogram

    wav = WAVEFORMS[name]
    ours = np.asarray(mel_spectrogram(
        jnp.asarray(wav[None]), sample_rate=SR, n_fft=2048, hop_length=512,
        n_mels=128, htk=False, norm="slaney"))[0]
    fb = ta.mel_filter_bank(1025, 128, 0.0, SR / 2.0, SR,
                            norm="slaney", mel_scale="slaney")
    ref = ta.spectrogram(wav.astype(np.float64),
                         ta.window_function(2048, "hann"),
                         frame_length=2048, hop_length=512, power=2.0,
                         center=True, pad_mode="reflect", mel_filters=fb,
                         mel_floor=0.0, dtype=np.float64)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    # f32 FFT vs the oracle's f64: ~1e-7 relative on the spectrogram scale
    np.testing.assert_allclose(ours, ref, atol=2e-6 * ref.max())


@pytest.mark.parametrize("name", list(WAVEFORMS))
def test_onset_envelope_matches_oracle(name):
    """Full onset_strength vs an envelope assembled from oracle stages:
    oracle mel -> power_to_db(ref=1, amin=1e-10, top_db=80) -> lag-1
    positive flux, band mean -> front pad lag + n_fft//(2*hop), truncate."""
    from gesture_diffusion_tpu.generation.eval_utils import onset_strength

    wav = WAVEFORMS[name]
    fb = ta.mel_filter_bank(1025, 128, 0.0, SR / 2.0, SR,
                            norm="slaney", mel_scale="slaney")
    mel = ta.spectrogram(wav.astype(np.float64),
                         ta.window_function(2048, "hann"),
                         frame_length=2048, hop_length=512, power=2.0,
                         center=True, pad_mode="reflect", mel_filters=fb,
                         mel_floor=0.0, dtype=np.float64)
    db = ta.power_to_db(mel, reference=1.0, min_value=1e-10, db_range=80.0)
    flux = np.maximum(0.0, db[:, 1:] - db[:, :-1]).mean(axis=0)
    pad = 1 + 2048 // (2 * 512)
    env_ref = np.concatenate([np.zeros(pad), flux])[: db.shape[1]]

    env_ours = onset_strength(wav, SR)
    assert env_ours.shape == env_ref.shape
    scale = max(float(env_ref.max()), 1e-6)
    np.testing.assert_allclose(env_ours, env_ref, atol=2e-5 * scale)


def test_onset_times_click_train_analytic():
    """End-to-end timing anchor (covers peak_pick, the one non-oracled
    stage): every click at exactly 0.25 + 0.5k s must have a detected
    onset within 1.5 hops (48 ms) — measured lateness here is 18-46 ms
    (frame quantisation + flux rise time, matching librosa's own typical
    click lateness), so a systematic shift like the pre-a74ff08 3-frame
    (64 ms) bug fails loudly.  The detector may
    double-fire on these 10 ms-wide clicks (librosa's default wait is
    int(0.03 * sr/hop) = 0 frames at 16 kHz/512 — faithful behaviour),
    so counts are not asserted; spurious onsets are bounded to within
    2.5 hops of a true click (the double-fire lands 1-2 frames after
    the primary)."""
    from gesture_diffusion_tpu.generation.eval_utils import onset_detect

    hop_s = 512 / SR
    truth = 0.25 + 0.5 * np.arange(8)
    times = onset_detect(WAVEFORMS["click_2hz"], SR)
    assert len(times) >= len(truth), times
    d = np.abs(times[:, None] - truth[None, :])
    assert d.min(axis=0).max() <= 1.5 * hop_s + 1e-9, (times, truth)
    assert d.min(axis=1).max() <= 2.5 * hop_s + 1e-9, (times, truth)


def test_onset_times_silence_empty():
    from gesture_diffusion_tpu.generation.eval_utils import onset_detect

    assert len(onset_detect(WAVEFORMS["silence"], SR)) == 0

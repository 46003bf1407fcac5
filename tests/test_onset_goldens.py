"""Golden-vector assurance for the librosa-free onset detector.

``generation/eval_utils.py`` reimplements librosa 0.10's
``onset_strength``/``onset_detect`` from the published algorithm because
librosa cannot be executed in this environment (reference usage:
``/root/reference/models/eval_utils.py:100``).  ``tools/
make_onset_goldens.py`` runs REAL librosa elsewhere and commits its
outputs as ``tests/golden/onset_goldens.npz``; this test regenerates the
identical waveforms (shared generator — the data file stores only librosa
outputs) and diffs our implementation against them.  Skips (two tests,
looping over all waveforms internally) while the golden file has not been
generated yet; the standing assurance in the meantime is
``test_onset_oracle.py`` — the ``transformers.audio_utils`` librosa-port
oracle covering the mel basis, STFT framing/center compensation, dB
conversion and full envelope (everything below the peak picker) — plus
the analytic click-train/silence unit tests there and in
``test_eval_export.py``.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from make_onset_goldens import SR, onset_golden_waveforms  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "onset_goldens.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN),
    reason="onset_goldens.npz not generated yet — run "
           "tools/make_onset_goldens.py in a librosa environment")


@pytest.fixture(scope="module")
def goldens():
    return np.load(GOLDEN)


def test_onset_strength_matches_librosa(goldens):
    from gesture_diffusion_tpu.generation.eval_utils import onset_strength

    for name, wav in onset_golden_waveforms():
        ours = onset_strength(wav, SR)
        ref = goldens[f"env_{name}"]
        n = min(len(ours), len(ref))
        assert abs(len(ours) - len(ref)) <= 1, (name, len(ours), len(ref))
        scale = max(float(np.abs(ref).max()), 1e-6)
        np.testing.assert_allclose(ours[:n], ref[:n], atol=1e-3 * scale,
                                   rtol=1e-3, err_msg=name)


def test_onset_times_match_librosa(goldens):
    from gesture_diffusion_tpu.generation.eval_utils import onset_detect

    for name, wav in onset_golden_waveforms():
        ours = onset_detect(wav, SR)
        ref = goldens[f"onsets_{name}"]
        # onset TIMES must agree to one hop (32 ms @ 16 kHz/512): the beat
        # metrics integrate a Gaussian of sigma 0.1 s around each onset, so
        # one-hop jitter is inconsequential but a systematic shift (the
        # pre-a74ff08 64 ms bug) fails loudly
        assert len(ours) == len(ref), (name, ours, ref)
        if len(ref):
            np.testing.assert_allclose(ours, ref, atol=512 / SR + 1e-9,
                                       err_msg=name)

#!/usr/bin/env python
"""Generate librosa onset-detection golden vectors.

RUN THIS IN ANY ENVIRONMENT THAT HAS librosa 0.10 (this box does not ship
it — ``generation/eval_utils.py`` reimplements ``onset_strength`` /
``onset_detect`` from the published 0.10 algorithm, and this script turns
real librosa outputs into checked-in goldens so that reimplementation can
be diffed against the ground truth the moment such an environment exists):

    python tools/make_onset_goldens.py

writes ``tests/golden/onset_goldens.npz`` containing, per deterministic
synthetic waveform (regenerated bit-identically by the test from
``onset_golden_waveforms()`` below — only librosa's OUTPUTS are stored):

  * ``env_{name}``    — ``librosa.onset.onset_strength(y=w, sr=sr)``
  * ``onsets_{name}`` — ``librosa.onset.onset_detect(y=w, sr=sr,
                          units='time')``

``tests/test_onset_goldens.py`` skips while the file is absent and becomes
the primary assurance once it is checked in (reference usage:
``/root/reference/models/eval_utils.py:100``).
"""

import os
import sys

import numpy as np

SR = 16000


def onset_golden_waveforms():
    """Deterministic synthetic suite: (name, waveform float32 @ 16 kHz).

    Shared by the generator script and the golden test — the waveforms are
    regenerated, never stored, so generator and test cannot drift."""
    rng = np.random.default_rng(1234)
    t = np.arange(4 * SR) / SR
    cases = []

    # click train at 2 Hz (the analytic case the unit tests already cover)
    click = np.zeros(4 * SR, np.float32)
    for k in range(8):
        i = int((0.25 + 0.5 * k) * SR)
        click[i:i + 160] = np.hanning(160).astype(np.float32)
    cases.append(("click_2hz", click))

    # irregular clicks over pink-ish noise floor
    noisy = (0.02 * rng.standard_normal(4 * SR)).astype(np.float32)
    for s in (0.31, 0.9, 1.17, 1.85, 2.4, 3.33):
        i = int(s * SR)
        noisy[i:i + 200] += 0.8 * np.hanning(200).astype(np.float32)
    cases.append(("clicks_in_noise", noisy))

    # amplitude-modulated tone bursts (soft onsets)
    bursts = np.zeros(4 * SR, np.float32)
    for k, f0 in enumerate((220.0, 330.0, 440.0, 550.0)):
        i = int((0.4 + 0.9 * k) * SR)
        seg = np.sin(2 * np.pi * f0 * t[: SR // 4])
        bursts[i:i + SR // 4] = (seg * np.hanning(SR // 4)).astype(np.float32)
    cases.append(("tone_bursts", bursts))

    # speech-shaped noise: filtered noise with random energy envelope
    env = np.interp(np.arange(4 * SR),
                    np.arange(0, 4 * SR, SR // 8),
                    rng.random(32)).astype(np.float32)
    speechy = (env * rng.standard_normal(4 * SR)).astype(np.float32)
    speechy = np.convolve(speechy, np.ones(8) / 8, mode="same"
                          ).astype(np.float32)
    cases.append(("speechy_noise", speechy))

    # silence — must produce zero onsets
    cases.append(("silence", np.zeros(2 * SR, np.float32)))
    return cases


def main() -> int:
    try:
        import librosa
    except ImportError:
        print("librosa is not installed in this environment; run this "
              "script wherever librosa 0.10 is available and commit "
              "tests/golden/onset_goldens.npz", file=sys.stderr)
        return 1

    out = {"librosa_version": np.asarray(librosa.__version__), "sr": SR}
    for name, wav in onset_golden_waveforms():
        out[f"env_{name}"] = librosa.onset.onset_strength(y=wav, sr=SR)
        out[f"onsets_{name}"] = librosa.onset.onset_detect(
            y=wav, sr=SR, units="time")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "tests", "golden", "onset_goldens.npz")
    np.savez(path, **out)
    print(f"wrote {os.path.normpath(path)} (librosa {librosa.__version__})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

import numpy as np

from gesture_diffusion_tpu.export.features import (
    create_foot_contact_signal,
    get_foot_contact_idxs,
    peak_indexes,
)


def test_peak_indexes_basic():
    x = np.zeros(50)
    x[[10, 30]] = [1.0, 0.8]
    idx = peak_indexes(x, thres=0.3, min_dist=5)
    assert list(idx) == [10, 30]


def test_peak_indexes_min_dist_keeps_highest():
    x = np.zeros(50)
    x[[10, 13, 30]] = [0.8, 1.0, 0.9]
    idx = peak_indexes(x, thres=0.3, min_dist=5)
    assert list(idx) == [13, 30]


def test_foot_contact_signal():
    t = np.arange(600)
    signal = np.sin(2 * np.pi * t / 240)  # up peaks at 60, 300+240; downs at 180, 420
    up, down = get_foot_contact_idxs(signal, t=0.02, min_dist=120)
    assert len(up) >= 2 and len(down) >= 1
    track = create_foot_contact_signal(signal, start=1, t=0.02, min_dist=120)
    assert set(track) <= {0, 1}
    assert track[int(down[0]) + 1] == 0          # down-peak clears contact
    later_up = [u for u in up if u > down[0]]
    assert track[int(later_up[0]) + 1] == 1      # next up-peak restores it


def test_down_peak_negative_thres_is_bug_compat():
    """The reference passes thres=t/min(signal) to peakutils for the
    down-peaks — NEGATIVE for a signal dipping below zero, and peakutils
    does not clamp, so every strict local maximum of -signal survives
    thresholding.  A tiny dip that a positive t/|min| threshold would
    suppress must be kept (features.py:14 bug-compat)."""
    signal = np.zeros(400)
    signal[100] = -1.0        # deep down-peak
    signal[300] = -0.001      # tiny dip, far below thres*range for t=0.02
    _, down = get_foot_contact_idxs(signal, t=0.02, min_dist=50)
    assert list(down) == [100, 300]


def test_peak_indexes_all_zero_signal_no_peaks():
    """max == min == 0 -> infinite threshold via numpy division (the
    reference divides by zero the same way) -> no peaks, no crash."""
    up, down = get_foot_contact_idxs(np.zeros(100), t=0.02, min_dist=10)
    assert len(up) == 0 and len(down) == 0

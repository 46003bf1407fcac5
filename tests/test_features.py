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

"""Mocap transform suite vs the EXECUTED reference pymo implementation.

Golden columns in tests/golden/pymo_transforms.npz were produced by running
/root/reference/datasets/pymo/preprocessing.py (via tests/golden_gen_pymo.py,
with a scipy-backed transforms3d shim) on tests/golden/synth_fullbody.bvh —
smooth synthetic motion over the real 88-joint BEAT hierarchy.  No reference
code was copied.  Values are compared per column NAME (the reference's
pandas insertion order is not part of the contract).
"""

import os

import numpy as np
import pytest

from gesture_diffusion_tpu.data import mocap_transforms as mt
from gesture_diffusion_tpu.data.bvh import parse_bvh

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "golden")
NPZ = os.path.join(GOLD, "pymo_transforms.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(NPZ)


@pytest.fixture(scope="module")
def track():
    return parse_bvh(os.path.join(GOLD, "synth_fullbody.bvh"))


def _ours(tracks):
    t = tracks[0]
    return {f"{j}_{c}": t.values[:, i] for i, (j, c) in enumerate(t.channel_names)}


def _check(golden, tag, tracks, atol=2e-3, rtol=2e-4, skip=()):
    got = _ours(tracks)
    want = {k.split("/", 1)[1]: golden[k] for k in golden.files
            if k.startswith(tag + "/") and not k.endswith("/dropped")}
    assert want, f"no golden columns for tag {tag}"
    assert set(got) == set(want), (
        f"{tag}: column sets differ; ours-only={sorted(set(got)-set(want))[:5]} "
        f"golden-only={sorted(set(want)-set(got))[:5]}")
    for name in want:
        if any(s in name for s in skip):
            continue
        np.testing.assert_allclose(
            got[name], want[name], atol=atol, rtol=rtol,
            err_msg=f"{tag}/{name}")


class TestMocapParameterizer:
    def test_expmap(self, golden, track):
        _check(golden, "expmap",
               mt.MocapParameterizer("expmap").fit(0).transform([track]))

    def test_expmap_inverse(self, golden, track):
        mp = mt.MocapParameterizer("expmap")
        exp = mp.transform([track])
        _check(golden, "expmap_inv", mp.inverse_transform(exp))

    def test_position(self, golden, track):
        _check(golden, "position",
               mt.MocapParameterizer("position").transform([track]))

    def test_expmap2pos(self, golden):
        """Golden parity on a collision-free chain: the reference's
        _expmap_to_pos selects expmap columns by substring
        (preprocessing.py:212), so prefix-colliding joints (Spine/Spine1,
        Head/HeadEnd, ...) read the wrong rotations on the full hierarchy —
        a defect our exact-name matching fixes.  On the toy skeleton both
        agree, pinning the (reversed-product) FK convention itself."""
        toy = parse_bvh(os.path.join(GOLD, "toy_chain.bvh"))
        exp = mt.MocapParameterizer("expmap").transform([toy])
        _check(golden, "toy_expmap2pos",
               mt.MocapParameterizer("expmap2pos").transform(exp))

    def test_euler_identity(self, track):
        out = mt.MocapParameterizer("euler").transform([track])
        assert out[0] is track


class TestMirrorReorder:
    @pytest.mark.parametrize("axis", ["X", "Y"])
    def test_mirror(self, golden, track, axis):
        out = mt.Mirror(axis=axis, append=False).transform([track])
        _check(golden, f"mirror{axis}", out)

    def test_mirror_append(self, track):
        out = mt.Mirror(axis="X", append=True).transform([track])
        assert len(out) == 2 and out[0] is track

    def test_reorder(self, golden, track):
        out = mt.EulerReorder("ZXY").fit([track]).transform([track])
        _check(golden, "reorderZXY", out)
        assert out[0].joints["Spine"].order == "ZXY"
        assert out[0].joints["Spine"].channels == [
            "Zrotation", "Xrotation", "Yrotation"]


class TestRootTransformer:
    @pytest.mark.parametrize("method,ps,rs", [
        ("abdolute_translation_deltas", 0, 0),
        ("abdolute_translation_deltas", 4, 0),
        ("pos_rot_deltas", 0, 0),
        ("pos_rot_deltas", 5, 2),
        ("hip_centric", 0, 0),
    ])
    def test_forward_and_inverse(self, golden, track, method, ps, rs):
        rt = mt.RootTransformer(method, position_smoothing=ps,
                                rotation_smoothing=rs)
        fwd = rt.transform([track])
        tag = f"root_{method}_{ps}_{rs}"
        _check(golden, tag, fwd)
        if method != "hip_centric":
            inv = rt.inverse_transform(fwd, start_pos=(3.0, -2.0))
            _check(golden, tag + "_inv", inv)

    def test_abs_deltas_roundtrip_recovers_trajectory(self, track):
        rt = mt.RootTransformer("abdolute_translation_deltas")
        inv = rt.inverse_transform(rt.transform([track]))[0]
        cols = {f"{j}_{c}": inv.values[:, i]
                for i, (j, c) in enumerate(inv.channel_names)}
        orig = {f"{j}_{c}": track.values[:, i]
                for i, (j, c) in enumerate(track.channel_names)}
        root = track.root_name
        # deltas integrate back up to the (dropped) start position
        for c in ("Xposition", "Zposition"):
            want = orig[f"{root}_{c}"] - orig[f"{root}_{c}"][0]
            np.testing.assert_allclose(cols[f"{root}_{c}"], want, atol=1e-6)


class TestRootCentric:
    def test_forward_and_inverse(self, golden, track):
        pos = mt.MocapParameterizer("position").transform([track])
        rcp = mt.RootCentricPositionNormalizer()
        fwd = rcp.transform(pos)
        _check(golden, "rootcentric", fwd)
        _check(golden, "rootcentric_inv", rcp.inverse_transform(fwd))


class TestConstantsRemover:
    def test_against_reference(self, golden, track):
        t = track.clone()
        xcol = [i for i, (j, c) in enumerate(t.channel_names)
                if j == t.root_name and c == "Xposition"][0]
        t.values[:, xcol] = 1.25
        cr = mt.ConstantsRemover()
        fwd = cr.fit([t]).transform([t])
        _check(golden, "constants", fwd)
        dropped = [n.decode() for n in golden["constants/dropped"]]
        assert sorted(cr.const_dims_) == dropped
        _check(golden, "constants_inv", cr.inverse_transform(fwd))


class TestArrayTransforms:
    def test_scalers(self):
        rng = np.random.default_rng(0)
        X = [rng.normal(2.0, 3.0, (40, 5)), rng.normal(-1.0, 0.5, (25, 5))]
        for cls in (mt.ListStandardScaler, mt.ListMinMaxScaler):
            sc = cls().fit(X)
            out = sc.transform(X)
            flat = np.concatenate(list(out), axis=0)
            if cls is mt.ListStandardScaler:
                np.testing.assert_allclose(flat.mean(0), 0.0, atol=1e-12)
                np.testing.assert_allclose(flat.std(0), 1.0, atol=1e-12)
            else:
                assert flat.min() >= 0.0 and flat.max() <= 1.0 + 1e-12
            back = sc.inverse_transform(out)
            for a, b in zip(back, X):
                np.testing.assert_allclose(a, b, atol=1e-10)

    def test_slicer_flattener_reverse(self, track):
        sl = mt.Slicer(window_size=16, overlap=0.5).fit([track])
        windows = sl.transform([track])
        # 40 frames, window 16, step 8 -> (40-8)//8 = 4 windows
        assert windows.shape == (4, 16, track.values.shape[1])
        np.testing.assert_array_equal(windows[1], track.values[8:24])
        flat = mt.Flattener().transform([w for w in windows])
        assert flat.shape == (64, track.values.shape[1])
        rev = mt.ReverseTime(append=True).transform([track])
        assert len(rev) == 2
        np.testing.assert_array_equal(rev[1].values, track.values[::-1])

    def test_downsampler(self, track):
        ds = mt.DownSampler(tgt_fps=60)            # 120 -> 60 fps, rate 2
        out = ds.transform([track])
        assert len(out) == 1
        np.testing.assert_array_equal(out[0].values, track.values[0:-1:2])
        assert out[0].framerate == pytest.approx(1 / 60)
        both = mt.DownSampler(tgt_fps=60, keep_all=True).transform([track])
        assert len(both) == 2
        np.testing.assert_array_equal(both[1].values, track.values[1:-1:2])

    def test_numpyfier_roundtrip(self, track):
        npf = mt.Numpyfier()
        arr = npf.fit([track]).transform([track])
        assert arr.shape == (1,) + track.values.shape
        back = npf.inverse_transform(arr)
        np.testing.assert_array_equal(back[0].values, track.values)
        assert back[0].channel_names == track.channel_names

    def test_joint_selector_roundtrip(self, track):
        js = mt.JointSelector(["Spine", "Spine1"], include_root=True)
        out = js.fit([track]).transform([track])
        names = {j for j, _ in out[0].channel_names}
        assert names == {"Hips", "Spine", "Spine1"}
        assert set(out[0].joints) == {"Hips", "Spine", "Spine1"}
        back = js.inverse_transform(out)[0]
        got = {f"{j}_{c}": back.values[:, i]
               for i, (j, c) in enumerate(back.channel_names)}
        orig = {f"{j}_{c}": track.values[:, i]
                for i, (j, c) in enumerate(track.channel_names)}
        assert set(got) == set(orig)
        for n in got:
            joint = n.rsplit("_", 1)[0]
            if joint in ("Hips", "Spine", "Spine1"):
                np.testing.assert_array_equal(got[n], orig[n])
            else:   # restored at first-frame value
                np.testing.assert_allclose(got[n], orig[n][0])

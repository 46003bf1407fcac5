"""Golden-value generator for the mocap transform suite.

EXECUTES the reference pymo code (/root/reference/datasets/pymo) on a
synthetic full-body BVH and records every transform's output columns into
tests/golden/pymo_transforms.npz.  Run manually (not under pytest):

    python tests/golden_gen_pymo.py

Per the repo norm, no reference code is copied — it is imported and run.
The reference needs ``transforms3d``, which is not installed; a scipy-backed
shim with identical conventions is injected first (transforms3d 'r'-prefixed
axes == scipy intrinsic/upper-case, 's'-prefixed == extrinsic/lower-case).
"""

import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("GESTURE_REF", "/root/reference")
GOLD = os.path.join(REPO, "tests", "golden")
sys.path.insert(0, REPO)


# ---------------------------------------------------------------------------
# transforms3d shim (scipy-backed)
# ---------------------------------------------------------------------------

def _install_t3d_shim():
    from scipy.spatial.transform import Rotation as R

    def _scipy_seq(axes):
        # 'rxyz' -> intrinsic 'XYZ'; 'sxyz' -> extrinsic 'xyz'
        frame, seq = axes[0], axes[1:]
        return seq.upper() if frame == "r" else seq.lower()

    euler = types.ModuleType("transforms3d.euler")

    def euler2mat(ai, aj, ak, axes="sxyz"):
        return R.from_euler(_scipy_seq(axes), [ai, aj, ak]).as_matrix()

    def mat2euler(m, axes="sxyz"):
        return tuple(R.from_matrix(np.asarray(m)).as_euler(_scipy_seq(axes)))

    def euler2axangle(ai, aj, ak, axes="sxyz"):
        rv = R.from_euler(_scipy_seq(axes), [ai, aj, ak]).as_rotvec()
        theta = float(np.linalg.norm(rv))
        vec = rv / theta if theta > 1e-12 else np.array([1.0, 0.0, 0.0])
        return vec, theta

    def axangle2euler(vector, theta, axes="sxyz"):
        rv = np.asarray(vector, float) * theta
        return tuple(R.from_rotvec(rv).as_euler(_scipy_seq(axes)))

    def euler2quat(ai, aj, ak, axes="sxyz"):
        q = R.from_euler(_scipy_seq(axes), [ai, aj, ak]).as_quat()  # xyzw
        return np.array([q[3], q[0], q[1], q[2]])

    def quat2euler(q, axes="sxyz"):
        q = np.asarray(q, float)
        xyzw = np.array([q[1], q[2], q[3], q[0]])
        return tuple(R.from_quat(xyzw).as_euler(_scipy_seq(axes)))

    euler.euler2mat = euler2mat
    euler.mat2euler = mat2euler
    euler.euler2axangle = euler2axangle
    euler.axangle2euler = axangle2euler
    euler.euler2quat = euler2quat
    euler.quat2euler = quat2euler

    quaternions = types.ModuleType("transforms3d.quaternions")

    def qmult(q, r):
        w0, x0, y0, z0 = q
        w1, x1, y1, z1 = r
        return np.array([
            w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
            w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
            w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
            w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1,
        ])

    def qinverse(q):
        q = np.asarray(q, float)
        return q * np.array([1.0, -1.0, -1.0, -1.0]) / np.sum(q * q)

    quaternions.qmult = qmult
    quaternions.qinverse = qinverse

    axangles = types.ModuleType("transforms3d.axangles")

    def mat2axangle(m, unit_thresh=1e-5):
        rv = R.from_matrix(np.asarray(m)).as_rotvec()
        theta = float(np.linalg.norm(rv))
        axis = rv / theta if theta > 1e-12 else np.array([0.0, 0.0, 1.0])
        return axis, theta

    axangles.mat2axangle = mat2axangle

    t3d = types.ModuleType("transforms3d")
    t3d.euler = euler
    t3d.quaternions = quaternions
    t3d.axangles = axangles
    sys.modules["transforms3d"] = t3d
    sys.modules["transforms3d.euler"] = euler
    sys.modules["transforms3d.quaternions"] = quaternions
    sys.modules["transforms3d.axangles"] = axangles


# ---------------------------------------------------------------------------
# synthetic motion on the real full-body hierarchy
# ---------------------------------------------------------------------------

def make_synth_bvh(path, n_frames=40, seed=7):
    from gesture_diffusion_tpu.data.bvh import parse_bvh, write_bvh

    data = parse_bvh(os.path.join(REF, "datasets", "hierarchy.txt"))
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 2 * np.pi, n_frames)
    C = len(data.channel_names)
    vals = np.zeros((n_frames, C))
    for i, (joint, chan) in enumerate(data.channel_names):
        if "position" in chan:
            # wandering root trajectory, tens of cm scale
            a, b = rng.uniform(5, 25), rng.uniform(0.5, 2.0)
            vals[:, i] = a * np.sin(b * t + rng.uniform(0, 6)) + rng.uniform(-10, 10)
            if chan == "Yposition":
                vals[:, i] = 95.0 + 2.0 * np.sin(t)
        else:
            # smooth rotations, amplitude < 60 deg (no expmap swap points)
            a = rng.uniform(5, 55)
            vals[:, i] = a * np.sin(rng.uniform(0.5, 2.0) * t + rng.uniform(0, 6))
    data.values = vals
    data.framerate = 0.008333
    write_bvh(data, path)
    return path


def df_cols(track):
    return {c: track.values[c].values.astype(np.float64)
            for c in track.values.columns}


def main():
    _install_t3d_shim()
    sys.path.insert(0, os.path.join(REF, "datasets"))
    from pymo.parsers import BVHParser
    from pymo import preprocessing as pp

    os.makedirs(GOLD, exist_ok=True)
    bvh_path = os.path.join(GOLD, "synth_fullbody.bvh")
    make_synth_bvh(bvh_path)

    parsed = BVHParser().parse(bvh_path)
    # Modern pandas no longer falls back to positional lookup on a timedelta
    # index (the reference's dx[0]=dx[1] at preprocessing.py:753 relies on
    # it) — run the transforms over an integer index instead.
    import pandas as pd
    parsed.values.index = pd.RangeIndex(len(parsed.values))
    out = {}

    def record(tag, tracks):
        track = tracks[0]
        for name, v in df_cols(track).items():
            out[f"{tag}/{name}"] = v

    # MocapParameterizer
    mp_exp = pp.MocapParameterizer("expmap")
    exp_tracks = mp_exp.fit_transform([parsed])
    record("expmap", exp_tracks)
    record("expmap_inv", mp_exp.inverse_transform(exp_tracks))
    record("position", pp.MocapParameterizer("position").fit_transform([parsed]))
    record("expmap2pos", pp.MocapParameterizer("expmap2pos").fit_transform(exp_tracks))

    # Mirror (no append -> single mirrored track)
    for axis in ("X", "Y"):
        record(f"mirror{axis}", pp.Mirror(axis=axis, append=False).fit_transform([parsed]))

    # EulerReorder
    record("reorderZXY", pp.EulerReorder("ZXY").fit_transform([parsed]))

    # RootTransformer
    for method, ps, rs in [("abdolute_translation_deltas", 0, 0),
                           ("abdolute_translation_deltas", 4, 0),
                           ("pos_rot_deltas", 0, 0),
                           ("pos_rot_deltas", 5, 2),
                           ("hip_centric", 0, 0)]:
        rt = pp.RootTransformer(method, position_smoothing=ps,
                                rotation_smoothing=rs)
        fwd = rt.fit_transform([parsed])
        tag = f"root_{method}_{ps}_{rs}"
        record(tag, fwd)
        if method != "hip_centric":
            record(tag + "_inv", rt.inverse_transform(fwd, start_pos=(3.0, -2.0)))

    # RootCentricPositionNormalizer over positions
    pos_tracks = pp.MocapParameterizer("position").fit_transform([parsed])
    rcp = pp.RootCentricPositionNormalizer()
    rcp_fwd = rcp.fit_transform(pos_tracks)
    record("rootcentric", rcp_fwd)
    record("rootcentric_inv", rcp.inverse_transform(rcp_fwd))

    # ConstantsRemover (synth BVH has constant zero columns? ensure some)
    cr = pp.ConstantsRemover()
    const_track = parsed.clone()
    const_track.values = parsed.values.copy()
    const_track.values[f"{parsed.root_name}_Xposition"] = 1.25   # constant col
    cr_fwd = cr.fit_transform([const_track])
    record("constants", cr_fwd)
    out["constants/dropped"] = np.array(
        [n.encode() for n in sorted(cr.const_dims_)])
    record("constants_inv", cr.inverse_transform(cr_fwd))

    # expmap2pos parity needs a skeleton with NO joint-name substring
    # collisions: the reference selects expmap columns via `joint in c`
    # (preprocessing.py:212), so Spine reads Spine3's rotations on the real
    # hierarchy.  A collision-free chain isolates the intended behaviour.
    toy_path = os.path.join(GOLD, "toy_chain.bvh")
    rng = np.random.default_rng(3)
    rows = rng.uniform(-40, 40, (8, 12))
    toy = (
        "HIERARCHY\nROOT Alpha\n{\n\tOFFSET 0 0 0\n"
        "\tCHANNELS 6 Xposition Yposition Zposition Xrotation Yrotation Zrotation\n"
        "\tJOINT Bravo\n\t{\n\t\tOFFSET 0 5 0\n"
        "\t\tCHANNELS 3 Xrotation Yrotation Zrotation\n"
        "\t\tJOINT Charlie\n\t\t{\n\t\t\tOFFSET 1 4 0\n"
        "\t\t\tCHANNELS 3 Xrotation Yrotation Zrotation\n"
        "\t\t\tEnd Site\n\t\t\t{\n\t\t\t\tOFFSET 0 2 0\n\t\t\t}\n"
        "\t\t}\n\t}\n}\nMOTION\nFrames: 8\nFrame Time: 0.008333\n"
        + "\n".join(" ".join(f"{v:.4f}" for v in r) for r in rows) + "\n")
    with open(toy_path, "w") as f:
        f.write(toy)
    toy_parsed = BVHParser().parse(toy_path)
    import pandas as pd  # noqa: F811
    toy_parsed.values.index = pd.RangeIndex(len(toy_parsed.values))
    toy_exp = pp.MocapParameterizer("expmap").fit_transform([toy_parsed])
    record("toy_expmap2pos",
           pp.MocapParameterizer("expmap2pos").fit_transform(toy_exp))

    np.savez_compressed(os.path.join(GOLD, "pymo_transforms.npz"), **out)
    print(f"wrote {len(out)} golden columns to {GOLD}/pymo_transforms.npz")


if __name__ == "__main__":
    main()

"""Composable mocap transforms over :class:`BvhData` tracks.

Functional-core port of the reference's sklearn-style pymo transform suite
(``datasets/pymo/preprocessing.py:19-1320``).  Each class keeps the
fit / transform / inverse_transform protocol (so ``sklearn.pipeline.Pipeline``
composes them unchanged), but the internals are vectorised over frames —
no pandas, no per-frame Python loops — with the rotation math delegated to
the batched JAX ops in :mod:`..ops.rotation`, :mod:`..ops.quaternions` and
:mod:`..ops.pivots`.

Column model: a track's motion is a single (T, C) array with
"{joint}_{channel}" names (:class:`BvhData`).  Transforms that add or remove
channels (expmap, root deltas, ...) rewrite the channel table in place of the
columns they consume, keeping a deterministic canonical order (file order)
instead of the reference's pandas-insertion order; parity tests therefore
compare values per column *name*.

Reference defects reproduced deliberately (bug-compat, so round-trips through
both frameworks agree — each is noted at its site):
  * ``RootCentricPositionNormalizer`` excludes joints by *substring* match on
    the root name, and its inverse shifts the root even though the transform
    never un-shifted it (``preprocessing.py:1043,1078``).
  * ``EulerReorder`` feeds X/Y/Z-ordered euler values into the joint's
    channel-order rotation composition (``preprocessing.py:494-495``) — a
    no-op distinction for the XYZ-ordered BEAT data.
"""

from __future__ import annotations

import copy as _copy
from typing import Dict, Sequence

import numpy as np

from ..ops import pivots as piv
from ..ops import quaternions as quat
from ..ops import rotation as rot
from .bvh import BvhData

__all__ = [
    "MocapParameterizer", "Mirror", "EulerReorder", "JointSelector",
    "Numpyfier", "Slicer", "RootTransformer", "RootCentricPositionNormalizer",
    "Flattener", "ConstantsRemover", "ListStandardScaler", "ListMinMaxScaler",
    "DownSampler", "ReverseTime", "TemplateTransform",
]

_ROT_CHANNELS = ("Xrotation", "Yrotation", "Zrotation")
_POS_CHANNELS = ("Xposition", "Yposition", "Zposition")


# ---------------------------------------------------------------------------
# column helpers
# ---------------------------------------------------------------------------

def _columns(track: BvhData) -> "Dict[str, np.ndarray]":
    """Name -> (T,) column view, insertion-ordered."""
    return {f"{j}_{c}": track.values[:, i]
            for i, (j, c) in enumerate(track.channel_names)}


def _rebuild(track: BvhData, cols: "Dict[str, np.ndarray]") -> BvhData:
    """New track with the given named columns (dict order = column order)."""
    new = track.clone()
    names = list(cols)
    new.channel_names = [tuple(n.rsplit("_", 1)) for n in names]
    if names:
        new.values = np.stack([np.asarray(cols[n], dtype=np.float64)
                               for n in names], axis=1)
    else:
        new.values = np.zeros((track.n_frames, 0))
    return new


def _has_rotations(cols, joint) -> bool:
    return all(f"{joint}_{c}" in cols for c in _ROT_CHANNELS)


def _rot_order(track: BvhData, joint: str) -> str:
    order = track.joints[joint].order
    return order if len(order) == 3 else "XYZ"


def _euler_deg(cols, joint: str, order: str) -> np.ndarray:
    """(T, 3) euler degrees in the joint's channel order."""
    return np.stack([cols[f"{joint}_{a}rotation"] for a in order], axis=1)


# ---------------------------------------------------------------------------
# MocapParameterizer — preprocessing.py:19-354
# ---------------------------------------------------------------------------

class MocapParameterizer:
    """param_type in {'euler', 'expmap', 'position', 'expmap2pos'}.

    Reference ``MocapParameterizer`` (``preprocessing.py:19-59``); the 'quat'
    branch there is an identity passthrough and is treated the same here.
    """

    def __init__(self, param_type: str = "euler"):
        self.param_type = param_type

    def fit(self, X, y=None):
        return self

    def transform(self, X, y=None):
        if self.param_type in ("euler", "quat"):
            return X
        if self.param_type == "expmap":
            return [self._to_expmap(t) for t in X]
        if self.param_type == "position":
            return [self._to_pos(t) for t in X]
        if self.param_type == "expmap2pos":
            return [self._expmap_to_pos(t) for t in X]
        raise ValueError(
            f"param types: euler, quat, expmap, position, expmap2pos; "
            f"got {self.param_type!r}")

    def inverse_transform(self, X, copy=None):
        if self.param_type in ("euler", "position"):
            return X      # ref prints 'positions 2 eulers is not supported'
        if self.param_type == "expmap":
            return [self._expmap_to_euler(t) for t in X]
        raise ValueError(f"cannot invert param type {self.param_type!r}")

    # -- euler -> expmap (ref _to_expmap, :257-308) ----------------------
    def _to_expmap(self, track: BvhData) -> BvhData:
        cols = _columns(track)
        out: Dict[str, np.ndarray] = {}
        done = set()
        for name in cols:
            joint, chan = name.rsplit("_", 1)
            if (chan not in _ROT_CHANNELS or "Nub" in joint
                    or not _has_rotations(cols, joint)):
                out[name] = cols[name]
                continue
            if joint in done:
                continue
            done.add(joint)
            # First rotation channel of a full triple: emit alpha/beta/gamma
            # here (in place), consuming all three euler columns.
            order = _rot_order(track, joint)
            e = _euler_deg(cols, joint, order)
            rv = np.asarray(rot.rotmat_to_rotvec(
                rot.euler_to_rotmat(e, degrees=True, order=order)))
            rv = np.asarray(rot.unroll_rotvec(rv))
            out[f"{joint}_alpha"] = rv[:, 0]
            out[f"{joint}_beta"] = rv[:, 1]
            out[f"{joint}_gamma"] = rv[:, 2]
        return _rebuild(track, out)

    # -- expmap -> euler (ref _expmap_to_euler, :310-354) ----------------
    def _expmap_to_euler(self, track: BvhData) -> BvhData:
        cols = _columns(track)
        out: Dict[str, np.ndarray] = {}
        for name in cols:
            joint, chan = name.rsplit("_", 1)
            if chan == "alpha" and "Nub" not in joint:
                order = _rot_order(track, joint)
                rv = np.stack([cols[f"{joint}_{p}"]
                               for p in ("alpha", "beta", "gamma")], axis=1)
                e = np.asarray(rot.rotmat_to_euler(
                    rot.rotvec_to_rotmat(rv), degrees=True, order=order))
                for i, axis in enumerate(order):
                    out[f"{joint}_{axis}rotation"] = e[:, i]
            elif chan in ("alpha", "beta", "gamma") and "Nub" not in joint:
                continue
            else:
                out[name] = cols[name]
        return _rebuild(track, out)

    # -- euler -> positions (ref _to_pos, :61-149) -----------------------
    def _to_pos(self, track: BvhData) -> BvhData:
        cols = _columns(track)
        T = track.n_frames
        g_quat: Dict[str, np.ndarray] = {}
        g_pos: Dict[str, np.ndarray] = {}
        out: Dict[str, np.ndarray] = {}
        for joint, info in track.joints.items():   # file order == DFS order
            if _has_rotations(cols, joint):
                order = _rot_order(track, joint)
                e = np.deg2rad(_euler_deg(cols, joint, order))
            else:
                order = "XYZ"
                e = np.zeros((T, 3))
            q = np.asarray(quat.from_euler(e, order.lower(), world=False))
            if all(f"{joint}_{c}" in cols for c in _POS_CHANNELS):
                p = np.stack([cols[f"{joint}_{c}"] for c in _POS_CHANNELS], axis=1)
            else:
                p = np.zeros((T, 3))
            if info.parent is None:
                # ref :123-126 — root position channels used as-is, no offset
                g_quat[joint] = q
                g_pos[joint] = p
            else:
                pq = g_quat[info.parent]
                g_quat[joint] = np.asarray(quat.qmul(pq, q))
                k = p + info.offset
                g_pos[joint] = g_pos[info.parent] + np.asarray(quat.qrotate(pq, k))
            for i, c in enumerate(_POS_CHANNELS):
                out[f"{joint}_{c}"] = g_pos[joint][:, i]
        return _rebuild(track, out)

    # -- expmap -> positions (ref _expmap_to_pos, :180-255) --------------
    def _expmap_to_pos(self, track: BvhData) -> BvhData:
        """Bug-compat port of the reference's matrix FK, which composes
        globals REVERSED (G_j = R_j @ G_parent) and rotates offsets as row
        vectors (``preprocessing.py:235-241``).  That convention is NOT
        equivalent to the quaternion FK in ``_to_pos`` — it applies every
        local rotation inverted (verified by executing both reference paths
        on a collision-free chain) — but it is the documented behaviour of
        'expmap2pos', so we reproduce it; parity is golden-tested on a
        collision-free skeleton.

        Deliberate defect fix: the reference additionally selects each
        joint's expmap columns by SUBSTRING match (``preprocessing.py:212``,
        ``[c for c in exp_params if joint in c]``) and keeps the first
        three, so any joint whose name is a substring of another's (Spine
        vs Spine1, Head vs HeadEnd, ...) silently reads the wrong joint's
        rotations on the full BEAT hierarchy.  We match by exact name."""
        cols = _columns(track)
        T = track.n_frames
        g_mat: Dict[str, np.ndarray] = {}
        g_pos: Dict[str, np.ndarray] = {}
        out: Dict[str, np.ndarray] = {}
        for joint, info in track.joints.items():
            if "Nub" not in joint and f"{joint}_alpha" in cols:
                rv = np.stack([cols[f"{joint}_{p}"]
                               for p in ("alpha", "beta", "gamma")], axis=1)
            else:
                rv = np.zeros((T, 3))
            R = np.asarray(rot.rotvec_to_rotmat(rv))
            if info.parent is None:
                g_mat[joint] = R
                g_pos[joint] = np.zeros((T, 3))    # ref :227-232: root at origin
            else:
                Gp = g_mat[info.parent]
                g_mat[joint] = np.einsum("tij,tjk->tik", R, Gp)
                q = np.einsum("j,tjk->tk", info.offset, Gp)
                g_pos[joint] = g_pos[info.parent] + q
            for i, c in enumerate(_POS_CHANNELS):
                out[f"{joint}_{c}"] = g_pos[joint][:, i]
        return _rebuild(track, out)


# ---------------------------------------------------------------------------
# Mirror — preprocessing.py:356-449
# ---------------------------------------------------------------------------

class Mirror:
    """Mirror about a world axis, swapping Left*/Right* joint tracks.

    ``append=True`` (reference default) returns originals followed by the
    mirrored copies.  Output columns: root positions + all non-Nub
    X/Y/Zrotation channels (the reference drops any other channels).
    """

    def __init__(self, axis: str = "X", append: bool = True):
        self.axis = axis
        self.append = append

    def fit(self, X, y=None):
        return self

    def transform(self, X, y=None):
        signs = {"X": np.array([1.0, -1.0, -1.0]),
                 "Y": np.array([-1.0, 1.0, -1.0]),
                 "Z": np.array([-1.0, -1.0, 1.0])}[self.axis]
        Q = list(X) if self.append else []
        for track in X:
            cols = _columns(track)
            root = track.root_name
            out: Dict[str, np.ndarray] = {}
            for i, c in enumerate(_POS_CHANNELS):
                out[f"{root}_{c}"] = -signs[i] * cols[f"{root}_{c}"]
            swap = {}
            for joint in track.joints:
                if "Nub" in joint or not _has_rotations(cols, joint):
                    continue
                if "Left" in joint:
                    swap[joint] = joint.replace("Left", "Right")
                elif "Right" in joint:
                    swap[joint] = joint.replace("Right", "Left")
                else:
                    swap[joint] = joint
            for joint, src in swap.items():
                for i, c in enumerate(_ROT_CHANNELS):
                    out[f"{joint}_{c}"] = signs[i] * cols[f"{src}_{c}"]
            Q.append(_rebuild(track, out))
        return Q

    def inverse_transform(self, X, copy=None, start_pos=None):
        return X


# ---------------------------------------------------------------------------
# EulerReorder — preprocessing.py:451-557
# ---------------------------------------------------------------------------

class EulerReorder:
    """Re-express every joint's euler triple in a new rotation order."""

    def __init__(self, new_order: str):
        self.new_order = new_order

    def fit(self, X, y=None):
        self.orig_skeleton = _copy.deepcopy(X[0].joints)
        return self

    def transform(self, X, y=None):
        Q = []
        for track in X:
            cols = _columns(track)
            out: Dict[str, np.ndarray] = {}
            new = track.clone()
            done = set()
            for name in cols:
                joint, chan = name.rsplit("_", 1)
                if (chan not in _ROT_CHANNELS or "Nub" in joint
                        or not _has_rotations(cols, joint)):
                    out[name] = cols[name]
                    continue
                if joint in done:
                    continue
                done.add(joint)
                order = _rot_order(track, joint)
                # Bug-compat (ref :494): values are read in X,Y,Z column
                # order but composed as angles about order[0..2].
                e_xyz = np.stack([cols[f"{joint}_{a}rotation"] for a in "XYZ"],
                                 axis=1)
                if order == self.new_order:
                    e_new = e_xyz
                else:
                    m = rot.euler_to_rotmat(e_xyz, degrees=True, order=order)
                    e_new = np.asarray(rot.rotmat_to_euler(
                        m, degrees=True, order=self.new_order))
                for i, axis in enumerate(self.new_order):
                    out[f"{joint}_{axis}rotation"] = e_new[:, i]
                new.joints[joint].order = self.new_order
                rot_seq = iter(self.new_order)
                new.joints[joint].channels = [
                    f"{next(rot_seq)}rotation" if c in _ROT_CHANNELS else c
                    for c in new.joints[joint].channels]
            rebuilt = _rebuild(track, out)
            rebuilt.joints = new.joints
            Q.append(rebuilt)
        return Q

    def inverse_transform(self, X, copy=None, start_pos=None):
        return X


# ---------------------------------------------------------------------------
# JointSelector — preprocessing.py:559-612
# ---------------------------------------------------------------------------

class JointSelector:
    """Keep only the named joints' channels (class form of the operational
    selection in ``data/pipeline.py::load_from_bvh``), with an
    inverse_transform that restores the dropped channels' rest values."""

    def __init__(self, joints: Sequence[str], include_root: bool = False):
        self.joints = list(joints)
        self.include_root = include_root

    def fit(self, X, y=None):
        t0 = X[0]
        selected = ([t0.root_name] if self.include_root else []) + self.joints
        self.selected_joints = selected
        self.selected_channels = [
            f"{j}_{c}" for j, c in t0.channel_names
            if j in selected and "Nub" not in j]
        cols = _columns(t0)
        self.not_selected = [n for n in cols if n not in self.selected_channels]
        self.not_selected_values = {n: float(cols[n][0]) for n in self.not_selected}
        self.orig_skeleton = _copy.deepcopy(t0.joints)
        return self

    def transform(self, X, y=None):
        Q = []
        for track in X:
            cols = _columns(track)
            out = {n: cols[n] for n in self.selected_channels}
            t2 = _rebuild(track, out)
            t2.joints = {k: v for k, v in track.clone().joints.items()
                         if k in self.selected_joints}
            for j in t2.joints.values():
                j.children = [c for c in j.children if c in t2.joints]
            Q.append(t2)
        return Q

    def inverse_transform(self, X, copy=None):
        Q = []
        for track in X:
            cols = _columns(track)
            T = track.n_frames
            for n in self.not_selected:
                cols[n] = np.full(T, self.not_selected_values[n])
            t2 = _rebuild(track, cols)
            t2.joints = _copy.deepcopy(self.orig_skeleton)
            Q.append(t2)
        return Q


# ---------------------------------------------------------------------------
# Numpyfier / Slicer — preprocessing.py:615-707
# ---------------------------------------------------------------------------

class Numpyfier:
    def fit(self, X, y=None):
        self.org_mocap_ = X[0].clone()
        self.org_mocap_.values = self.org_mocap_.values[:0]
        return self

    def transform(self, X, y=None):
        return np.array([t.values for t in X])

    def inverse_transform(self, X, copy=None):
        Q = []
        for arr in X:
            t = self.org_mocap_.clone()
            t.values = np.asarray(arr)
            Q.append(t)
        return Q


class Slicer:
    """Overlapping fixed-size windows over each track.  Ref :656-707."""

    def __init__(self, window_size: int, overlap: float = 0.5):
        self.window_size = window_size
        self.overlap = overlap

    def fit(self, X, y=None):
        self.org_mocap_ = X[0].clone()
        self.org_mocap_.values = self.org_mocap_.values[:0]
        return self

    def transform(self, X, y=None):
        Q = []
        for track in X:
            vals = track.values
            overlap_frames = int(self.overlap * self.window_size)
            step = self.window_size - overlap_frames
            n = (vals.shape[0] - overlap_frames) // step
            for i in range(max(n, 0)):
                Q.append(vals[i * step:i * step + self.window_size])
        return np.array(Q)

    def inverse_transform(self, X, copy=None):
        Q = []
        for arr in X:
            t = self.org_mocap_.clone()
            t.values = np.asarray(arr)
            Q.append(t)
        return Q


# ---------------------------------------------------------------------------
# RootTransformer — preprocessing.py:709-1017
# ---------------------------------------------------------------------------

def _gaussian_smooth(x: np.ndarray, sigma: float) -> np.ndarray:
    from scipy.ndimage import gaussian_filter1d
    return gaussian_filter1d(x, sigma, axis=0, mode="nearest")


class RootTransformer:
    """Root-trajectory re-parameterisations.

    Methods (reference spelling kept, including the 'abdolute' typo, so
    configs written against the reference keep working):
      * 'abdolute_translation_deltas' — x/z positions -> frame deltas
      * 'pos_rot_deltas'   — heading-normalised pose + planar velocity and
        angular-velocity channels (Holden-style)
      * 'hip_centric'      — zero out the root trajectory
    """

    def __init__(self, method: str, position_smoothing: float = 0,
                 rotation_smoothing: float = 0):
        self.method = method
        self.position_smoothing = position_smoothing
        self.rotation_smoothing = rotation_smoothing

    def fit(self, X, y=None):
        return self

    # ------------------------------------------------------------------
    def transform(self, X, y=None):
        return [self._forward(t) for t in X]

    def _forward(self, track: BvhData) -> BvhData:
        root = track.root_name
        cols = _columns(track)
        xp, yp, zp = (f"{root}_{c}" for c in _POS_CHANNELS)

        if self.method == "abdolute_translation_deltas":
            out = dict(cols)
            x, z = cols[xp], cols[zp]
            if self.position_smoothing > 0:
                x_sm = _gaussian_smooth(x, self.position_smoothing)
                z_sm = _gaussian_smooth(z, self.position_smoothing)
                dx = np.diff(x_sm, prepend=x_sm[0])
                dz = np.diff(z_sm, prepend=z_sm[0])
                out[xp] = x - x_sm
                out[zp] = z - z_sm
            else:
                dx = np.diff(x, prepend=x[0])
                dz = np.diff(z, prepend=z[0])
                out.pop(xp)
                out.pop(zp)
            if len(dx) > 1:                     # ref :753 — first delta copied
                dx[0] = dx[1]                   # (guarded: the reference dies
                dz[0] = dz[1]                   # with IndexError on 1 frame)
            out[f"{root}_dXposition"] = dx
            out[f"{root}_dZposition"] = dz
            return _rebuild(track, out)

        if self.method == "pos_rot_deltas":
            order = _rot_order(track, root)
            positions = np.stack([cols[xp], cols[yp], cols[zp]], axis=1)
            rotations = np.deg2rad(_euler_deg(cols, root, order))
            quats = np.asarray(quat.from_euler(rotations, order.lower(),
                                               world=False))

            reference = positions * np.array([1.0, 0.0, 1.0])
            if self.position_smoothing > 0:
                reference = _gaussian_smooth(reference, self.position_smoothing)
            velocity = np.diff(reference, axis=0)
            velocity = np.vstack([velocity[:1], velocity])

            positions = positions - reference

            forward = np.array(quat.qrotate(quats, np.array([0.0, 0.0, 1.0])))
            forward[:, 1] = 0.0
            if self.rotation_smoothing > 0:
                forward = _gaussian_smooth(forward, self.rotation_smoothing)
            forward = forward / np.linalg.norm(forward, axis=-1, keepdims=True)

            target = np.tile(np.array([0.0, 0.0, 1.0]), (len(forward), 1))
            rotation = np.asarray(quat.between(target, forward))
            inv = np.asarray(quat.qinv(rotation))
            positions = np.asarray(quat.qrotate(inv, positions))
            new_rotations = np.asarray(quat.qmul(inv, quats))
            velocity = np.asarray(quat.qrotate(inv, velocity))
            rvel = np.asarray(piv.from_quaternions(
                quat.qmul(rotation[1:], quat.qinv(rotation[:-1]))))
            rvel = np.concatenate([rvel[:1], rvel])

            eulers = np.rad2deg(np.asarray(rot.rotmat_to_euler(
                quat.to_rotmat(quat.qnormalize(new_rotations)),
                degrees=False, order=order)))

            out = dict(cols)
            out[xp], out[yp], out[zp] = positions.T
            out[f"{root}_dXposition"] = velocity[:, 0]
            out[f"{root}_dZposition"] = velocity[:, 2]
            for i, axis in enumerate(order):
                out[f"{root}_{axis}rotation"] = eulers[:, i]
            out[f"{root}_dYrotation"] = rvel
            return _rebuild(track, out)

        if self.method == "hip_centric":
            out = dict(cols)
            zeros = np.zeros(track.n_frames)
            for c in _POS_CHANNELS + _ROT_CHANNELS:
                name = f"{root}_{c}"
                if name in out:
                    out[name] = zeros
            return _rebuild(track, out)

        raise ValueError(f"unknown RootTransformer method {self.method!r}")

    # ------------------------------------------------------------------
    def inverse_transform(self, X, copy=None, start_pos=None):
        startx, startz = (0.0, 0.0) if start_pos is None else start_pos
        return [self._backward(t, startx, startz) for t in X]

    def _backward(self, track: BvhData, startx: float, startz: float) -> BvhData:
        root = track.root_name
        cols = _columns(track)
        xp, yp, zp = (f"{root}_{c}" for c in _POS_CHANNELS)

        if self.method == "abdolute_translation_deltas":
            dx = cols[f"{root}_dXposition"]
            dz = cols[f"{root}_dZposition"]
            # ref :919-924 — integrate deltas skipping the duplicated first
            recx = startx + np.concatenate([[0.0], np.cumsum(dx[1:])])
            recz = startz + np.concatenate([[0.0], np.cumsum(dz[1:])])
            out = dict(cols)
            if self.position_smoothing > 0:
                out[xp] = cols[xp] + recx
                out[zp] = cols[zp] + recz
            else:
                out[xp] = recx
                out[zp] = recz
            out.pop(f"{root}_dXposition")
            out.pop(f"{root}_dZposition")
            return _rebuild(track, out)

        if self.method == "pos_rot_deltas":
            order = _rot_order(track, root)
            positions = np.stack([cols[xp], cols[yp], cols[zp]], axis=1)
            rotations = np.deg2rad(_euler_deg(cols, root, order))
            quats = np.asarray(quat.from_euler(rotations, order.lower(),
                                               world=False))
            dx = cols[f"{root}_dXposition"]
            dz = cols[f"{root}_dZposition"]
            dry = cols[f"{root}_dYrotation"]

            # ref :980-987 — all increments rotate about the fixed y axis,
            # so the cumulative quaternion is just the cumulative angle.
            ry_angles = np.concatenate([[0.0], np.cumsum(dry[1:])])
            rec_ry = np.asarray(quat.from_angle_axis(
                ry_angles, np.array([0.0, 1.0, 0.0])))
            dp = np.asarray(quat.qrotate(
                rec_ry, np.stack([dx, np.zeros_like(dx), dz], axis=1)))
            rec_xp = np.concatenate([[0.0], np.cumsum(dp[1:, 0])])
            rec_zp = np.concatenate([[0.0], np.cumsum(dp[1:, 2])])

            rec_r = np.asarray(quat.qmul(rec_ry, quats))
            pp = np.asarray(quat.qrotate(rec_ry, positions))
            rec_xp = rec_xp + pp[:, 0]
            rec_zp = rec_zp + pp[:, 2]
            eulers = np.rad2deg(np.asarray(rot.rotmat_to_euler(
                quat.to_rotmat(quat.qnormalize(rec_r)),
                degrees=False, order=order)))

            out = dict(cols)
            out[xp] = rec_xp
            out[zp] = rec_zp
            for i, axis in enumerate(order):
                out[f"{root}_{axis}rotation"] = eulers[:, i]
            out.pop(f"{root}_dYrotation")
            out.pop(f"{root}_dXposition")
            out.pop(f"{root}_dZposition")
            return _rebuild(track, out)

        return track


# ---------------------------------------------------------------------------
# RootCentricPositionNormalizer — preprocessing.py:1020-1088
# ---------------------------------------------------------------------------

class RootCentricPositionNormalizer:
    """Subtract the root's floor projection from every other joint position."""

    def fit(self, X, y=None):
        return self

    def transform(self, X, y=None):
        Q = []
        for track in X:
            root = track.root_name
            cols = _columns(track)
            proj = np.stack([cols[f"{root}_Xposition"],
                             np.zeros(track.n_frames),
                             cols[f"{root}_Zposition"]], axis=1)
            out: Dict[str, np.ndarray] = {}
            # Bug-compat (ref :1043): substring exclusion — any joint whose
            # name CONTAINS the root name keeps absolute coordinates.
            for joint in track.joints:
                if root in joint:
                    continue
                for i, c in enumerate(_POS_CHANNELS):
                    out[f"{joint}_{c}"] = cols[f"{joint}_{c}"] - proj[:, i]
            for c in _POS_CHANNELS:
                out[f"{root}_{c}"] = cols[f"{root}_{c}"]
            Q.append(_rebuild(track, out))
        return Q

    def inverse_transform(self, X, copy=None):
        Q = []
        for track in X:
            root = track.root_name
            cols = _columns(track)
            proj = np.stack([cols[f"{root}_Xposition"],
                             np.zeros(track.n_frames),
                             cols[f"{root}_Zposition"]], axis=1)
            out: Dict[str, np.ndarray] = {}
            # Bug-compat (ref :1078): the inverse shifts EVERY joint,
            # including the root the transform left absolute.
            for joint in track.joints:
                for i, c in enumerate(_POS_CHANNELS):
                    out[f"{joint}_{c}"] = cols[f"{joint}_{c}"] + proj[:, i]
            Q.append(_rebuild(track, out))
        return Q


# ---------------------------------------------------------------------------
# array-level transforms — preprocessing.py:1090-1319
# ---------------------------------------------------------------------------

class Flattener:
    def fit(self, X, y=None):
        return self

    def transform(self, X, y=None):
        return np.concatenate(X, axis=0)


class ConstantsRemover:
    """Drop columns whose std (over the FIRST track, ddof=1 as pandas) is
    below eps; inverse restores their first-frame values."""

    def __init__(self, eps: float = 1e-6):
        self.eps = eps

    def fit(self, X, y=None):
        t0 = X[0]
        cols = _columns(t0)
        # pandas .std() of a single row is NaN and "NaN < eps" is False, so
        # the reference KEEPS every column of a 1-frame track — mirror that
        stds = {n: (np.std(v, ddof=1) if len(v) > 1 else np.nan)
                for n, v in cols.items()}
        self.const_dims_ = [n for n, s in stds.items() if s < self.eps]
        self.const_values_ = {n: float(cols[n][0]) for n in self.const_dims_}
        return self

    def transform(self, X, y=None):
        Q = []
        for track in X:
            cols = _columns(track)
            out = {n: v for n, v in cols.items() if n not in self.const_dims_}
            Q.append(_rebuild(track, out))
        return Q

    def inverse_transform(self, X, copy=None):
        Q = []
        for track in X:
            cols = _columns(track)
            for n in self.const_dims_:
                cols[n] = np.full(track.n_frames, self.const_values_[n])
            Q.append(_rebuild(track, cols))
        return Q


class _ListScalerBase:
    """Shared fit/apply over lists of arrays or BvhData tracks (the
    reference's is_DataFrame flag generalised by type dispatch)."""

    def _flat(self, X) -> np.ndarray:
        return np.concatenate(
            [t.values if isinstance(t, BvhData) else np.asarray(t) for t in X],
            axis=0)

    def _apply(self, X, fn):
        Q = []
        for t in X:
            if isinstance(t, BvhData):
                t2 = t.clone()
                t2.values = fn(t.values)
                Q.append(t2)
            else:
                Q.append(fn(np.asarray(t)))
        if any(isinstance(t, BvhData) for t in X):
            return Q
        if len({q.shape for q in Q}) == 1:
            return np.array(Q)
        return Q        # ragged track lengths stay a list


class ListStandardScaler(_ListScalerBase):
    def __init__(self, is_DataFrame: bool = False):
        self.is_DataFrame = is_DataFrame   # kept for signature parity

    def fit(self, X, y=None):
        flat = self._flat(X)
        self.data_mean_ = np.mean(flat, axis=0)
        self.data_std_ = np.std(flat, axis=0)
        return self

    def transform(self, X, y=None):
        return self._apply(X, lambda v: (v - self.data_mean_) / self.data_std_)

    def inverse_transform(self, X, copy=None):
        return self._apply(X, lambda v: v * self.data_std_ + self.data_mean_)


class ListMinMaxScaler(_ListScalerBase):
    def __init__(self, is_DataFrame: bool = False):
        self.is_DataFrame = is_DataFrame

    def fit(self, X, y=None):
        flat = self._flat(X)
        self.data_max_ = np.max(flat, axis=0)
        self.data_min_ = np.min(flat, axis=0)
        return self

    def transform(self, X, y=None):
        rng = self.data_max_ - self.data_min_
        return self._apply(X, lambda v: (v - self.data_min_) / rng)

    def inverse_transform(self, X, copy=None):
        rng = self.data_max_ - self.data_min_
        return self._apply(X, lambda v: v * rng + self.data_min_)


class DownSampler:
    """Integer-stride fps downsampling (drops the final frame, as the
    reference's ``[ii:-1:rate]`` slice does).  keep_all=True emits every
    phase offset as a separate track.  Ref :1244-1279."""

    def __init__(self, tgt_fps: int, keep_all: bool = False):
        self.tgt_fps = tgt_fps
        self.keep_all = keep_all

    def fit(self, X, y=None):
        return self

    def transform(self, X, y=None):
        Q = []
        for track in X:
            orig_fps = round(1.0 / track.framerate)
            rate = orig_fps // self.tgt_fps
            if orig_fps % self.tgt_fps != 0:
                raise ValueError(
                    f"orig fps {orig_fps} not divisible by target {self.tgt_fps}")
            for ii in range(rate):
                t2 = track.clone()
                t2.values = track.values[ii:-1:rate].copy()
                t2.framerate = 1.0 / self.tgt_fps
                Q.append(t2)
                if not self.keep_all:
                    break
        return Q

    def inverse_transform(self, X, copy=None):
        return X


class ReverseTime:
    def __init__(self, append: bool = True):
        self.append = append

    def fit(self, X, y=None):
        return self

    def transform(self, X, y=None):
        Q = list(X) if self.append else []
        for track in X:
            t2 = track.clone()
            t2.values = track.values[::-1].copy()
            Q.append(t2)
        return Q

    def inverse_transform(self, X, copy=None):
        return X


class TemplateTransform:
    def fit(self, X, y=None):
        return self

    def transform(self, X, y=None):
        return X

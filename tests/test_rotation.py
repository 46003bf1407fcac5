"""Rotation-op tests: scipy is the independent oracle for every conversion
(the reference used scipy/transforms3d for the same math)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from gesture_diffusion_tpu.ops import rotation as rot


@pytest.fixture(scope="module")
def random_eulers():
    rng = np.random.default_rng(0)
    # keep pitch away from +-90 deg to dodge gimbal ambiguity in euler tests
    e = rng.uniform(-170, 170, size=(256, 3))
    e[:, 1] = rng.uniform(-85, 85, size=256)
    return e


def test_euler_to_rotmat_matches_scipy(random_eulers):
    ours = np.asarray(rot.euler_to_rotmat(random_eulers))
    ref = R.from_euler("XYZ", random_eulers, degrees=True).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_rotmat_to_euler_roundtrip(random_eulers):
    m = rot.euler_to_rotmat(random_eulers)
    back = np.asarray(rot.rotmat_to_euler(m))
    np.testing.assert_allclose(back, random_eulers, atol=1e-4)


def test_ortho6d_layout_matches_reference_spec(random_eulers):
    """o6 = first two columns flattened row-major (data_utils.py:30-44)."""
    m = R.from_euler("XYZ", random_eulers, degrees=True).as_matrix()
    expect = m[:, :, [0, 1]].reshape(-1, 6)
    ours = np.asarray(rot.euler_to_ortho6d(random_eulers))
    np.testing.assert_allclose(ours, expect, atol=1e-6)


def test_ortho6d_roundtrip(random_eulers):
    o6 = rot.euler_to_ortho6d(random_eulers)
    m = np.asarray(rot.ortho6d_to_rotmat(o6))
    ref = R.from_euler("XYZ", random_eulers, degrees=True).as_matrix()
    np.testing.assert_allclose(m, ref, atol=1e-5)
    e = np.asarray(rot.ortho6d_to_euler(o6))
    np.testing.assert_allclose(e, random_eulers, atol=1e-3)


def test_ortho6d_gram_schmidt_repairs_noise(random_eulers):
    rng = np.random.default_rng(1)
    o6 = np.asarray(rot.euler_to_ortho6d(random_eulers)) + rng.normal(0, 0.01, (256, 6))
    m = np.asarray(rot.ortho6d_to_rotmat(o6))
    eye = np.einsum("nij,nkj->nik", m, m)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (256, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_rotvec_matches_scipy(random_eulers):
    ours = np.asarray(rot.euler_to_rotvec(random_eulers))
    ref = R.from_euler("XYZ", random_eulers, degrees=True).as_rotvec()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rotvec_to_rotmat_matches_scipy():
    rng = np.random.default_rng(2)
    rv = rng.normal(0, 1.2, size=(256, 3))
    rv = np.concatenate([rv, rv * 1e-9], axis=0)  # include tiny angles
    ours = np.asarray(rot.rotvec_to_rotmat(rv))
    ref = R.from_rotvec(rv).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_rotmat_to_quat_matches_scipy():
    rng = np.random.default_rng(3)
    m = R.random(512, random_state=rng).as_matrix()
    ours = np.asarray(rot.rotmat_to_quat(m))  # (w,x,y,z), w>=0
    ref = R.from_matrix(m).as_quat()          # (x,y,z,w)
    ref = np.concatenate([ref[:, 3:], ref[:, :3]], axis=1)
    ref = np.where(ref[:, :1] < 0, -ref, ref)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_rotvec_euler_roundtrip(random_eulers):
    rv = rot.euler_to_rotvec(random_eulers)
    back = np.asarray(rot.rotvec_to_euler(rv))
    np.testing.assert_allclose(back, random_eulers, atol=5e-4)


class TestUnroll:
    def _make_discontinuous_track(self):
        """A rotation sweeping through pi about a fixed axis: the naive
        rotvec track snaps from angle ~pi to ~pi (other side), flipping axis."""
        axis = np.array([0.57735, 0.57735, 0.57735])
        angles = np.linspace(0.5, 2 * np.pi - 0.5, 120)
        mats = R.from_rotvec(np.outer(angles, axis)).as_matrix()
        return R.from_matrix(mats).as_rotvec()  # scipy canonicalises to [0,pi]

    def test_unroll_preserves_rotation(self):
        rv = self._make_discontinuous_track()
        unrolled = np.asarray(rot.unroll_rotvec(rv))
        m0 = R.from_rotvec(rv).as_matrix()
        m1 = np.asarray(rot.rotvec_to_rotmat(unrolled))
        np.testing.assert_allclose(m0, m1, atol=1e-5)

    def test_unroll_removes_discontinuity(self):
        rv = self._make_discontinuous_track()
        raw_jump = np.abs(np.diff(rv, axis=0)).max()
        unrolled = np.asarray(rot.unroll_rotvec(rv))
        smooth_jump = np.abs(np.diff(unrolled, axis=0)).max()
        assert raw_jump > 1.0          # the canonical track really does jump
        assert smooth_jump < 0.2       # unrolled track is continuous

    def test_unroll_identity_on_smooth_track(self):
        axis = np.array([1.0, 0.0, 0.0])
        angles = np.linspace(0.1, 2.0, 50)
        rv = np.outer(angles, axis)
        out = np.asarray(rot.unroll_rotvec(rv))
        np.testing.assert_allclose(out, rv, atol=1e-7)

    def test_unroll_batched(self):
        rv = self._make_discontinuous_track()
        batch = np.stack([rv, rv * 0.999, rv])
        out = np.asarray(rot.unroll_rotvec(batch))
        single = np.asarray(rot.unroll_rotvec(rv))
        np.testing.assert_allclose(out[0], single, atol=1e-7)


def test_scaler_roundtrip(tmp_path):
    from gesture_diffusion_tpu.ops import StandardScaler

    rng = np.random.default_rng(4)
    x = rng.normal(3.0, 2.5, size=(100, 7))
    x[:, 3] = 1.0  # constant channel
    sc = StandardScaler.fit(x)
    z = sc.transform(x)
    np.testing.assert_allclose(z.mean(0), 0.0, atol=1e-12)
    np.testing.assert_allclose(sc.inverse_transform(z), x, atol=1e-12)
    p = str(tmp_path / "scaler.npz")
    sc.save(p)
    sc2 = StandardScaler.load(p)
    np.testing.assert_allclose(sc2.mean, sc.mean)

    # sklearn interop (reference writes scaler.jl via joblib)
    from sklearn.preprocessing import StandardScaler as SkScaler
    import joblib

    skp = str(tmp_path / "scaler.jl")
    joblib.dump(SkScaler().fit(x), skp)
    sc3 = StandardScaler.load(skp)
    np.testing.assert_allclose(sc3.transform(x), SkScaler().fit(x).transform(x), atol=1e-9)


def test_quat_and_rotmat_to_rotvec_match_scipy(random_eulers):
    """Direct scipy oracle for the two converters the roundtrip suite only
    exercised indirectly (quat_to_rotvec, rotmat_to_rotvec)."""
    r = R.from_euler("XYZ", random_eulers, degrees=True)
    ref = r.as_rotvec()
    q = np.concatenate([r.as_quat()[:, 3:], r.as_quat()[:, :3]], axis=-1)
    np.testing.assert_allclose(
        np.asarray(rot.quat_to_rotvec(q)), ref, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(rot.rotmat_to_rotvec(r.as_matrix())), ref, atol=1e-5)


def test_rotmat_to_ortho6d_inverts_gram_schmidt(random_eulers):
    """rotmat_to_ortho6d is exact on orthonormal input (first two columns),
    so ortho6d_to_rotmat(rotmat_to_ortho6d(m)) == m."""
    m = R.from_euler("XYZ", random_eulers, degrees=True).as_matrix()
    o6 = np.asarray(rot.rotmat_to_ortho6d(m))
    assert o6.shape == (len(m), 6)
    np.testing.assert_allclose(
        np.asarray(rot.ortho6d_to_rotmat(o6)), m, atol=1e-6)


def test_unroll_log_rot_is_unroll_rotvec_alias():
    """Reference imports the (missing) unroll_log_rot name
    (datasets/dataset.py:8); our alias must stay behaviourally identical."""
    rng = np.random.default_rng(3)
    rv = rng.normal(0, 2, (17, 3))
    np.testing.assert_array_equal(
        np.asarray(rot.unroll_log_rot(rv)), np.asarray(rot.unroll_rotvec(rv)))

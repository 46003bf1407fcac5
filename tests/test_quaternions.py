"""Quaternion algebra (ops/quaternions.py) and pivots (ops/pivots.py) vs a
scipy oracle, plus semantic properties the reference class guarantees
(datasets/pymo/Quaternions.py, Pivots.py)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from gesture_diffusion_tpu.ops import pivots as piv
from gesture_diffusion_tpu.ops import quaternions as Q


def _wxyz(r: R) -> np.ndarray:
    q = r.as_quat()
    return np.concatenate([q[..., 3:], q[..., :3]], axis=-1)


def _same_rot(a, b, atol=1e-5):
    sign = np.sign(np.sum(np.asarray(a) * np.asarray(b), -1, keepdims=True))
    np.testing.assert_allclose(np.asarray(a) * sign, b, atol=atol)


@pytest.fixture(scope="module")
def rand():
    rng = np.random.default_rng(11)
    r0, r1 = R.random(40, random_state=1), R.random(40, random_state=2)
    return rng, _wxyz(r0), _wxyz(r1), r0, r1


class TestAlgebra:
    def test_mul_matches_scipy_composition(self, rand):
        _, q0, q1, r0, r1 = rand
        _same_rot(Q.qmul(q0, q1), _wxyz(r0 * r1))

    def test_rotate_matches_scipy_apply(self, rand):
        rng, q0, _, r0, _ = rand
        v = rng.normal(size=(40, 3))
        np.testing.assert_allclose(np.asarray(Q.qrotate(q0, v)),
                                   r0.apply(v), atol=1e-5)

    def test_inv_is_inverse(self, rand):
        _, q0, _, _, _ = rand
        _same_rot(Q.qmul(q0, Q.qinv(q0)), np.tile([1.0, 0, 0, 0], (40, 1)))

    def test_to_rotmat_and_back(self, rand):
        _, q0, _, r0, _ = rand
        m = np.asarray(Q.to_rotmat(q0))
        np.testing.assert_allclose(m, r0.as_matrix(), atol=1e-5)
        _same_rot(Q.from_rotmat(m), q0)

    def test_exp_log_roundtrip(self, rand):
        rng = rand[0]
        w = rng.normal(size=(30, 3))
        # half-angle vectors within the principal branch (|w| < pi/2)
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) \
            * rng.uniform(0.01, 1.5, (30, 1))
        np.testing.assert_allclose(np.asarray(Q.qlog(Q.qexp(w))), w, atol=1e-5)

    def test_angle_axis(self, rand):
        _, q0, _, r0, _ = rand
        ang, ax = Q.angle_axis(q0)
        rv = r0.as_rotvec()
        want_ang = np.linalg.norm(rv, axis=-1)
        got = np.asarray(ang)
        got_ax = np.asarray(ax)
        # angle_axis returns angle in [0, 2pi) for the stored pole
        flip = got > np.pi
        got = np.where(flip, 2 * np.pi - got, got)
        got_ax = np.where(flip[:, None], -got_ax, got_ax)
        np.testing.assert_allclose(got, want_ang, atol=1e-4)
        np.testing.assert_allclose(got_ax * got[:, None], rv, atol=1e-4)


class TestSlerpBetween:
    def test_slerp_endpoints_and_midpoint(self, rand):
        _, q0, q1, r0, r1 = rand
        np.testing.assert_allclose(np.asarray(Q.slerp(q0, q1, 0.0)), q0, atol=1e-5)
        _same_rot(Q.slerp(q0, q1, 1.0), q1)
        # midpoint: equal geodesic distance to both ends
        mid = np.asarray(Q.slerp(q0, q1, 0.5))
        rm = R.from_quat(np.concatenate([mid[:, 1:], mid[:, :1]], -1))
        d0 = (rm * r0.inv()).magnitude()
        d1 = (rm * r1.inv()).magnitude()
        np.testing.assert_allclose(d0, d1, atol=1e-4)

    def test_between_rotates_v0_onto_v1(self, rand):
        rng = rand[0]
        v0 = rng.normal(size=(30, 3))
        v1 = rng.normal(size=(30, 3))
        got = np.asarray(Q.qrotate(Q.between(v0, v1),
                                   v0 / np.linalg.norm(v0, axis=-1, keepdims=True)))
        np.testing.assert_allclose(
            got, v1 / np.linalg.norm(v1, axis=-1, keepdims=True), atol=1e-5)


class TestEuler:
    @pytest.mark.parametrize("order", ["xyz", "yzx", "zxy", "zyx"])
    def test_from_euler_intrinsic(self, rand, order):
        rng = rand[0]
        e = rng.uniform(-np.pi, np.pi, (30, 3))
        _same_rot(Q.from_euler(e, order, world=False),
                  _wxyz(R.from_euler(order.upper(), e)))

    def test_from_euler_world_is_extrinsic(self, rand):
        rng = rand[0]
        e = rng.uniform(-np.pi, np.pi, (30, 3))
        _same_rot(Q.from_euler(e, "xyz", world=True),
                  _wxyz(R.from_euler("xyz", e)))

    @pytest.mark.parametrize("order", ["xyz", "yzx"])
    def test_to_euler_roundtrip(self, rand, order):
        """xyz and yzx are the two orders the reference implements
        (Quaternions.py:225-232); ours generalises but must agree there."""
        _, q0, _, _, _ = rand
        e = np.asarray(Q.to_euler(q0, order))
        _same_rot(Q.from_euler(e, order), q0)

    def test_average_of_jittered_cluster(self, rand):
        rng = rand[0]
        base = _wxyz(R.random(1, random_state=5))[0]
        noise = rng.normal(scale=0.02, size=(50, 4))
        cluster = np.asarray(Q.qnormalize(base + noise))
        mean = np.asarray(Q.average(cluster))
        _same_rot(mean[None], base[None], atol=0.02)


class TestPivots:
    def test_wrap(self):
        ps = np.array([0.0, np.pi + 0.1, -np.pi - 0.1, 7.0])
        w = np.asarray(piv.wrap_angle(ps))
        assert np.all(np.abs(w) <= np.pi + 1e-9)
        np.testing.assert_allclose(np.cos(w), np.cos(ps), atol=1e-6)
        np.testing.assert_allclose(np.sin(w), np.sin(ps), atol=1e-6)

    def test_quaternion_roundtrip(self):
        rng = np.random.default_rng(2)
        ps = rng.uniform(-np.pi + 1e-3, np.pi - 1e-3, (25,))
        qs = piv.to_quaternions(ps)           # rotation about +y (xz plane)
        np.testing.assert_allclose(np.asarray(piv.from_quaternions(qs)),
                                   ps, atol=1e-5)

    def test_direction_roundtrip(self):
        rng = np.random.default_rng(3)
        ps = rng.uniform(-np.pi + 1e-3, np.pi - 1e-3, (25,))
        ds = piv.to_directions(ps)
        np.testing.assert_allclose(np.asarray(piv.from_directions(ds)),
                                   ps, atol=1e-6)

    def test_add_wraps(self):
        a = np.array([3.0]); b = np.array([1.0])
        np.testing.assert_allclose(np.asarray(piv.add(a, b)),
                                   [4.0 - 2 * np.pi], atol=1e-6)


class TestSmallHelpers:
    """Direct coverage for the helpers the algebra tests only used
    indirectly (ref Quaternions.py id/__abs__/dot/from_angle_axis)."""

    def test_qid(self):
        q = np.asarray(Q.qid((3, 2)))
        assert q.shape == (3, 2, 4)
        np.testing.assert_array_equal(q[..., 0], 1.0)
        np.testing.assert_array_equal(q[..., 1:], 0.0)
        np.testing.assert_array_equal(np.asarray(Q.qid()), [1, 0, 0, 0])

    def test_qabs_unifies_pole(self, rand):
        _, q0, _, r0, _ = rand
        flipped = np.where(np.arange(len(q0))[:, None] % 2 == 0, -q0, q0)
        a = np.asarray(Q.qabs(flipped))
        assert (a[:, 0] >= 0).all()
        _same_rot(a, q0)

    def test_qdot(self, rand):
        _, q0, q1, _, _ = rand
        np.testing.assert_allclose(np.asarray(Q.qdot(q0, q1)),
                                   np.sum(q0 * q1, -1), atol=1e-6)

    def test_from_angle_axis_matches_scipy(self):
        rng = np.random.default_rng(5)
        angle = rng.uniform(0, np.pi, 30)
        axis = rng.normal(0, 1, (30, 3))
        ours = np.asarray(Q.from_angle_axis(angle, axis))
        unit = axis / np.linalg.norm(axis, axis=-1, keepdims=True)
        ref = _wxyz(R.from_rotvec(unit * angle[:, None]))
        _same_rot(ours, ref)

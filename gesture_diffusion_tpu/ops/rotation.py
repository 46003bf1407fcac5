"""Batched 3-D rotation conversions as pure JAX ops.

Re-specifies the conversions the reference scatters across
``datasets/data_utils.py:19-115`` (scipy-based euler/rotmat/ortho-6D),
``datasets/pymo/rotation_tools.py:22-179`` (transforms3d-based expmap and
temporal unroll).  Everything here is shape-polymorphic over leading batch
dims, jit/vmap-friendly, and runs on TPU or host CPU.

Conventions (matching the reference / BVH BEAT data):
  * Euler order "XYZ" means *intrinsic* X-then-Y-then-Z, i.e. the composed
    matrix is  R = Rx(a) @ Ry(b) @ Rz(c)  (scipy ``Rotation.from_euler("XYZ")``).
  * Ortho-6D follows Zhou et al. eq. (14): the first two *columns* of R,
    flattened row-major as [m00, m01, m10, m11, m20, m21]
    (reference ``data_utils.py:30-44``).
  * "Exponential map" / log-rot is the rotation vector axis*angle in radians.

The temporal ``unroll`` (reference ``rotation_tools.py:25-49``) — a
sequential rewrite over discontinuity intervals — is reformulated here as a
data-parallel prefix-parity: a frame's representation is flipped iff an odd
number of swap points precede it.  This matches the reference semantics
exactly while vectorising over time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# euler <-> rotation matrix
# ---------------------------------------------------------------------------

_AXIS_INDEX = {"X": 0, "Y": 1, "Z": 2}


def _parse_order(order: str):
    """'XYZ'-style intrinsic Tait-Bryan order -> (i, j, k, sign).

    sign is +1 for even permutations of (0,1,2), -1 for odd — the
    Levi-Civita factor in the closed-form angle extraction.
    """
    idx = tuple(_AXIS_INDEX[a] for a in order.upper())
    if len(idx) != 3 or len(set(idx)) != 3:
        raise ValueError(f"order must be a permutation of XYZ, got {order!r}")
    i, j, k = idx
    sign = 1.0 if (j - i) % 3 == 1 else -1.0
    return i, j, k, sign


def _axis_rotmat(angle: jax.Array, axis: int) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    if axis == 0:
        rows = [[one, zero, zero], [zero, c, -s], [zero, s, c]]
    elif axis == 1:
        rows = [[c, zero, s], [zero, one, zero], [-s, zero, c]]
    else:
        rows = [[c, -s, zero], [s, c, zero], [zero, zero, one]]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def euler_to_rotmat(euler: jax.Array, degrees: bool = True,
                    order: str = "XYZ") -> jax.Array:
    """(..., 3) intrinsic euler angles -> (..., 3, 3) rotation matrices.

    order "XYZ" (the BVH/BEAT default) uses the analytic expansion
    R = Rx(a) @ Ry(b) @ Rz(c); any other permutation composes the three
    axis rotations (reference pymo supports per-joint channel orders,
    ``rotation_tools.py:99-117``).
    """
    e = jnp.deg2rad(euler) if degrees else euler
    a, b, c = e[..., 0], e[..., 1], e[..., 2]
    if order.upper() != "XYZ":
        i, j, k, _ = _parse_order(order)
        return _axis_rotmat(a, i) @ _axis_rotmat(b, j) @ _axis_rotmat(c, k)
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    # R = Rx(a) @ Ry(b) @ Rz(c), expanded analytically.
    row0 = jnp.stack([cb * cc, -cb * sc, sb], axis=-1)
    row1 = jnp.stack([ca * sc + sa * sb * cc, ca * cc - sa * sb * sc, -sa * cb], axis=-1)
    row2 = jnp.stack([sa * sc - ca * sb * cc, sa * cc + ca * sb * sc, ca * cb], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_euler(m: jax.Array, degrees: bool = True,
                    order: str = "XYZ") -> jax.Array:
    """(..., 3, 3) -> (..., 3) intrinsic euler angles in the given
    Tait-Bryan order.

    Closed form for R = R_i(a) @ R_j(b) @ R_k(c) with Levi-Civita sign s:
    b = asin(s * m[i,k]); a = atan2(-s*m[j,k], m[k,k]);
    c = atan2(-s*m[i,j], m[i,i]).  Gimbal-locked matrices (|m[i,k]| ~ 1)
    resolve with c = 0, matching scipy's choice of putting all twist into
    the first angle.
    """
    i, j, k, s = _parse_order(order)
    b = jnp.arcsin(jnp.clip(s * m[..., i, k], -1.0, 1.0))
    locked = jnp.abs(m[..., i, k]) > 1.0 - 1e-7
    a = jnp.where(
        locked,
        jnp.arctan2(s * m[..., k, j], m[..., j, j]),
        jnp.arctan2(-s * m[..., j, k], m[..., k, k]),
    )
    c = jnp.where(locked, 0.0, jnp.arctan2(-s * m[..., i, j], m[..., i, i]))
    e = jnp.stack([a, b, c], axis=-1)
    return jnp.rad2deg(e) if degrees else e


# ---------------------------------------------------------------------------
# ortho-6D (Zhou et al.)
# ---------------------------------------------------------------------------

def rotmat_to_ortho6d(m: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 6): first two columns, row-major interleaved."""
    return m[..., :, :2].reshape(*m.shape[:-2], 6)


def ortho6d_to_rotmat(o6: jax.Array) -> jax.Array:
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt on the two raw columns."""
    cols = o6.reshape(*o6.shape[:-1], 3, 2)
    x_raw, y_raw = cols[..., 0], cols[..., 1]
    x = x_raw / jnp.maximum(jnp.linalg.norm(x_raw, axis=-1, keepdims=True), _EPS)
    z = jnp.cross(x, y_raw)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), _EPS)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def euler_to_ortho6d(euler: jax.Array, degrees: bool = True) -> jax.Array:
    return rotmat_to_ortho6d(euler_to_rotmat(euler, degrees))


def ortho6d_to_euler(o6: jax.Array, degrees: bool = True) -> jax.Array:
    return rotmat_to_euler(ortho6d_to_rotmat(o6), degrees)


# ---------------------------------------------------------------------------
# quaternion bridge (scalar-first, used for stable log/exp maps)
# ---------------------------------------------------------------------------

def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) unit quaternion (w, x, y, z), w >= 0.

    Branchless Shepperd: build all four candidate quaternions and select the
    one seeded by the largest diagonal combination.
    """
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*component^2 (always >= 0).
    qw = jnp.stack([
        1.0 + tr,
        m[..., 2, 1] - m[..., 1, 2],
        m[..., 0, 2] - m[..., 2, 0],
        m[..., 1, 0] - m[..., 0, 1],
    ], axis=-1)
    qx = jnp.stack([
        m[..., 2, 1] - m[..., 1, 2],
        1.0 + m00 - m11 - m22,
        m[..., 0, 1] + m[..., 1, 0],
        m[..., 0, 2] + m[..., 2, 0],
    ], axis=-1)
    qy = jnp.stack([
        m[..., 0, 2] - m[..., 2, 0],
        m[..., 0, 1] + m[..., 1, 0],
        1.0 - m00 + m11 - m22,
        m[..., 1, 2] + m[..., 2, 1],
    ], axis=-1)
    qz = jnp.stack([
        m[..., 1, 0] - m[..., 0, 1],
        m[..., 0, 2] + m[..., 2, 0],
        m[..., 1, 2] + m[..., 2, 1],
        1.0 - m00 - m11 + m22,
    ], axis=-1)

    cases = jnp.stack([qw, qx, qy, qz], axis=-2)        # (..., 4 cases, 4)
    seeds = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                       1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(seeds, axis=-1)
    q = jnp.take_along_axis(cases, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_to_rotvec(q: jax.Array) -> jax.Array:
    """(..., 4) (w,x,y,z) -> (..., 3) rotation vector, angle in [0, pi]."""
    # canonicalize to the w >= 0 pole first: for w < 0 inputs (quaternion
    # double cover — scipy's as_quat is not sign-canonical) the raw formula
    # returns the long-way vector with angle in (pi, 2pi], breaking the
    # documented [0, pi] contract
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = q[..., 0]
    v = q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(vnorm, w)
    # scale = angle / sin(angle/2); Taylor for small angles: 2 + angle^2/12
    small = vnorm < 1e-6
    scale = jnp.where(small, 2.0 + angle * angle / 12.0,
                      angle / jnp.where(small, 1.0, vnorm))
    return v * scale[..., None]


def rotvec_to_rotmat(rv: jax.Array) -> jax.Array:
    """(..., 3) rotation vector -> (..., 3, 3) via Rodrigues."""
    theta = jnp.linalg.norm(rv, axis=-1, keepdims=True)
    small = theta < 1e-8
    axis = rv / jnp.where(small, 1.0, theta)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    t = theta[..., 0]
    c, s = jnp.cos(t), jnp.sin(t)
    C = 1.0 - c
    row0 = jnp.stack([c + x * x * C, x * y * C - z * s, x * z * C + y * s], axis=-1)
    row1 = jnp.stack([y * x * C + z * s, c + y * y * C, y * z * C - x * s], axis=-1)
    row2 = jnp.stack([z * x * C - y * s, z * y * C + x * s, c + z * z * C], axis=-1)
    m = jnp.stack([row0, row1, row2], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=m.dtype), m.shape)
    # First-order fallback for tiny angles keeps gradients clean.
    skew = _skew(rv)
    return jnp.where(small[..., None], eye + skew, m)


def _skew(v: jax.Array) -> jax.Array:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)


def rotmat_to_rotvec(m: jax.Array) -> jax.Array:
    return quat_to_rotvec(rotmat_to_quat(m))


# ---------------------------------------------------------------------------
# euler <-> expmap ("log_rot") and temporal unroll
# ---------------------------------------------------------------------------

def euler_to_rotvec(euler: jax.Array, degrees: bool = True) -> jax.Array:
    """Reference ``euler2log_rot`` (``data_utils.py:101-107``)."""
    return rotmat_to_rotvec(euler_to_rotmat(euler, degrees))


def rotvec_to_euler(rv: jax.Array, degrees: bool = True) -> jax.Array:
    """Reference ``log_rot2euler`` (``data_utils.py:110-115``)."""
    return rotmat_to_euler(rotvec_to_rotmat(rv), degrees)


def unroll_rotvec(rv: jax.Array) -> jax.Array:
    """Temporal expmap unroll over axis -2 (time), vectorised.

    Per-frame rotation vectors have a double cover: (axis, theta) and
    (-axis, 2*pi - theta) encode the same rotation.  The reference
    (``rotation_tools.py:25-49``) walks the track, flipping representation
    inside intervals bounded by "swap points" — frames where hopping to the
    alternative angle is closer than staying.  Flip state at frame t is the
    parity of the number of swap points strictly before t, which we compute
    with a cumulative sum instead of the reference's interval loop.

    :param rv: (..., T, 3) per-joint rotation-vector tracks.
    :return: (..., T, 3) unrolled tracks encoding identical rotations.
    """
    ang = jnp.linalg.norm(rv, axis=-1)                       # (..., T)
    alt = 2.0 * jnp.pi - ang
    safe = jnp.maximum(ang, _EPS)
    alt_rv = -rv / safe[..., None] * alt[..., None]          # flipped repr
    # Toggle where hopping to the flipped representation of frame t+1 is
    # closer (full vector distance — catches both the reference's
    # angle-jump cases and axis flips through pi that its angle-only
    # criterion misses, cf. rotation_tools.py:66 FIXME).
    d_stay = jnp.linalg.norm(rv[..., 1:, :] - rv[..., :-1, :], axis=-1)
    d_swap = jnp.linalg.norm(alt_rv[..., 1:, :] - rv[..., :-1, :], axis=-1)
    swap = (d_swap < d_stay).astype(jnp.int32)               # swap point at i
    # flips before frame t = sum(swap[0:t]); pad a zero for t=0.
    prefix = jnp.cumsum(swap, axis=-1)
    zeros = jnp.zeros_like(prefix[..., :1])
    flips = jnp.concatenate([zeros, prefix], axis=-1)        # (..., T)
    flip = (flips % 2).astype(bool)
    return jnp.where(flip[..., None], alt_rv, rv)


def unroll_log_rot(rv: jax.Array) -> jax.Array:
    """Alias matching the reference's (missing) ``unroll_log_rot`` import
    (``datasets/dataset.py:8``): per-joint (T, 3) track unroll."""
    return unroll_rotvec(rv)

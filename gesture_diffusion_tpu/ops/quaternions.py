"""Batched quaternion algebra as pure JAX ops.

Functional, shape-polymorphic replacement for the reference's ndarray-wrapper
class (``datasets/pymo/Quaternions.py:3-467``).  Quaternions are plain
(..., 4) arrays, scalar-first (w, x, y, z) — the same memory layout as the
reference — and every routine broadcasts over leading batch dims and is
jit/vmap-friendly (no data-dependent Python control flow).

Semantics parity notes (reference line cites):
  * ``qmul`` is the Hamilton product; the reference's ``__mul__``
    (``Quaternions.py:71-107``) computes exactly this despite its r/q
    variable naming.
  * ``qlog``/``qexp`` (``Quaternions.py:177-182, 352-364``) use the
    HALF-angle convention: log of a unit quaternion is axis * theta / 2.
    ``qlog`` unifies the pole first (w >= 0), as the reference's
    ``abs`` does (``Quaternions.py:142-148``).
  * ``slerp`` (``Quaternions.py:367-393``) takes the short path and falls
    back to lerp when the arc is tiny.
  * ``from_euler``/``to_euler`` (``Quaternions.py:216-273, 409-421``)
    support any intrinsic (world=False) or extrinsic (world=True)
    Tait-Bryan order; the reference hard-codes xyz / yzx for ``euler``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotation import rotmat_to_quat

_EPS = 1e-10

_AXES = {"x": 0, "y": 1, "z": 2}


def qid(shape=()) -> jax.Array:
    """Identity quaternion(s), (*shape, 4).  Ref ``Quaternions.id`` (:331)."""
    q = jnp.zeros(tuple(shape) + (4,))
    return q.at[..., 0].set(1.0)


def qmul(q: jax.Array, r: jax.Array) -> jax.Array:
    """Hamilton product q ⊗ r, (..., 4) each.  Ref ``__mul__`` (:71-107)."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rw, rx, ry, rz = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    return jnp.stack([
        qw * rw - qx * rx - qy * ry - qz * rz,
        qw * rx + qx * rw + qy * rz - qz * ry,
        qw * ry - qx * rz + qy * rw + qz * rx,
        qw * rz + qx * ry - qy * rx + qz * rw,
    ], axis=-1)


def qinv(q: jax.Array) -> jax.Array:
    """Conjugate (== inverse for unit quaternions).  Ref ``__neg__`` (:138)."""
    # canonicalize first: a float64 numpy input would otherwise request a
    # float64 constant under non-x64 jax and emit a truncation UserWarning
    q = jnp.asarray(q)
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qnormalize(q: jax.Array) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def qabs(q: jax.Array) -> jax.Array:
    """Unify to the w >= 0 pole.  Ref ``__abs__`` (:142-148)."""
    qn = qnormalize(q)
    return jnp.where(qn[..., :1] < 0, -qn, qn)


def qrotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4).

    Expansion of q ⊗ (0, v) ⊗ q* (ref ``__mul__`` vector branch, :110-112)
    without materialising the intermediate quaternions.
    """
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def qdot(q: jax.Array, r: jax.Array) -> jax.Array:
    return jnp.sum(q * r, axis=-1)


def qlog(q: jax.Array) -> jax.Array:
    """(..., 4) -> (..., 3) half-angle log map.  Ref ``log`` (:177-182)."""
    n = qabs(q)
    im = n[..., 1:]
    lens = jnp.linalg.norm(im, axis=-1)
    scale = jnp.arctan2(lens, n[..., 0]) / (lens + 1e-10)
    return im * scale[..., None]


def qexp(w: jax.Array) -> jax.Array:
    """(..., 3) half-angle vectors -> (..., 4).  Ref ``exp`` (:352-364)."""
    t = jnp.linalg.norm(w, axis=-1)
    safe_t = jnp.where(t == 0, 1e-3, t)            # ref pins ts==0 to 0.001
    ls = jnp.sin(safe_t) / safe_t
    q = jnp.concatenate([jnp.cos(safe_t)[..., None], w * ls[..., None]], axis=-1)
    return qnormalize(q)


def slerp(q0: jax.Array, q1: jax.Array, a) -> jax.Array:
    """Spherical interpolation along the short arc.  Ref ``slerp`` (:367-393).

    ``a`` broadcasts against the quaternion batch shape.
    """
    a = jnp.asarray(a)
    cos = jnp.sum(q0 * q1, axis=-1)
    neg = cos < 0.0
    cos = jnp.abs(cos)
    q1 = jnp.where(neg[..., None], -q1, q1)

    linear = (1.0 - cos) < 0.01
    omega = jnp.arccos(jnp.clip(jnp.where(linear, 0.0, cos), -1.0, 1.0))
    sinom = jnp.maximum(jnp.sin(omega), _EPS)
    w0 = jnp.where(linear, 1.0 - a, jnp.sin((1.0 - a) * omega) / sinom)
    w1 = jnp.where(linear, a, jnp.sin(a * omega) / sinom)
    return w0[..., None] * q0 + w1[..., None] * q1


def between(v0: jax.Array, v1: jax.Array) -> jax.Array:
    """Quaternion rotating v0 onto v1.  Ref ``between`` (:395-399)."""
    a = jnp.cross(v0, v1)
    w = jnp.sqrt(jnp.sum(v0**2, -1) * jnp.sum(v1**2, -1)) + jnp.sum(v0 * v1, -1)
    return qnormalize(jnp.concatenate([w[..., None], a], axis=-1))


def from_angle_axis(angle: jax.Array, axis: jax.Array) -> jax.Array:
    """Ref ``from_angle_axis`` (:401-406) — axis normalised with +1e-10."""
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-10)
    half = jnp.asarray(angle) / 2.0
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1)


def angle_axis(q: jax.Array):
    """(..., 4) -> (angles, axes).  Ref ``angle_axis`` (:290-299)."""
    n = qnormalize(q)
    s = jnp.sqrt(jnp.clip(1.0 - n[..., 0] ** 2, 0.0, None))
    s = jnp.where(s == 0, 1e-3, s)                 # ref pins s==0 to 0.001
    angles = 2.0 * jnp.arccos(jnp.clip(n[..., 0], -1.0, 1.0))
    return angles, n[..., 1:] / s[..., None]


def _axis_quat(angle: jax.Array, axis_idx: int) -> jax.Array:
    half = angle / 2.0
    parts = [jnp.cos(half)] + [jnp.zeros_like(half)] * 3
    parts[1 + axis_idx] = jnp.sin(half)
    return jnp.stack(parts, axis=-1)


def from_euler(es: jax.Array, order: str = "xyz", world: bool = False) -> jax.Array:
    """(..., 3) radians -> (..., 4).  Ref ``from_euler`` (:408-421).

    world=False (intrinsic): q = q_{order[0]} ⊗ q_{order[1]} ⊗ q_{order[2]};
    world=True reverses the composition.
    """
    q0 = _axis_quat(es[..., 0], _AXES[order[0].lower()])
    q1 = _axis_quat(es[..., 1], _AXES[order[1].lower()])
    q2 = _axis_quat(es[..., 2], _AXES[order[2].lower()])
    return qmul(q2, qmul(q1, q0)) if world else qmul(q0, qmul(q1, q2))


def to_rotmat(q: jax.Array) -> jax.Array:
    """(..., 4) -> (..., 3, 3).  Ref ``transforms`` (:302-325)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def from_rotmat(m: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4), w >= 0.  Ref ``from_transforms`` (:423-465)
    (ours uses the branchless Shepperd from ops.rotation)."""
    return rotmat_to_quat(m)


def to_euler(q: jax.Array, order: str = "xyz", degrees: bool = False) -> jax.Array:
    """(..., 4) -> (..., 3) intrinsic Tait-Bryan angles in the given order.

    Generalises the reference's hard-coded xyz / yzx branches
    (``Quaternions.py:216-273``) to all six distinct-axis orders via the
    rotation-matrix extraction in ops.rotation.
    """
    from .rotation import rotmat_to_euler
    return rotmat_to_euler(to_rotmat(qnormalize(q)), degrees=degrees, order=order.upper())


def average(qs: jax.Array) -> jax.Array:
    """Chordal L2 mean of a set of quaternions, (N, 4) -> (4,).

    Eigenvector formulation, as the reference's ``average`` (:276-288).
    """
    system = jnp.einsum("ni,nj->ij", qs, qs)
    _, v = jnp.linalg.eigh(system)
    return v[:, -1]          # eigenvector of the largest eigenvalue


def interpolate(qs: jax.Array, ws: jax.Array) -> jax.Array:
    """Weighted log-space blend.  Ref ``interpolate`` (:213-214)."""
    logs = qlog(qs)
    mean = jnp.sum(logs * ws[..., None], axis=0) / jnp.sum(ws)
    return qexp(mean)

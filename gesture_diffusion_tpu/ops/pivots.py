"""Planar pivot (heading) angles — functional port of the reference's
``datasets/pymo/Pivots.py:5-89`` ndarray wrapper.

A "pivot" is a rotation angle about the axis normal to a plane (default the
ground plane xz).  The reference wraps these in a class mainly to get
wrap-around-aware addition; here they are plain (...,)-shaped arrays in
radians plus a handful of pure functions, all jit/vmap-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quaternions import from_angle_axis, qrotate

_AXES = {"x": 0, "y": 1, "z": 2}


def wrap_angle(ps: jax.Array) -> jax.Array:
    """Wrap to (-pi, pi].  Ref ``normalized`` (:61-65), but O(1) instead of
    the reference's repeated +-2pi loop."""
    return jnp.arctan2(jnp.sin(ps), jnp.cos(ps))


def add(a: jax.Array, b: jax.Array) -> jax.Array:
    """Wrap-around-aware angle addition.  Ref ``__add__`` (:23)."""
    return wrap_angle(a + b)


def sub(a: jax.Array, b: jax.Array) -> jax.Array:
    """Ref ``__sub__`` (:24)."""
    return wrap_angle(a - b)


def from_directions(ds: jax.Array, plane: str = "xz") -> jax.Array:
    """(..., 3) direction vectors -> (...,) pivot angles.
    Ref ``from_directions`` (:84-88): atan2(component plane[0], plane[1])."""
    ys = ds[..., _AXES[plane[0]]]
    xs = ds[..., _AXES[plane[1]]]
    return jnp.arctan2(ys, xs)


def from_quaternions(qs: jax.Array, forward: str = "z", plane: str = "xz") -> jax.Array:
    """(..., 4) quaternions -> (...,) heading angles: rotate the forward unit
    vector, project onto the plane.  Ref ``from_quaternions`` (:78-82)."""
    d = jnp.zeros(qs.shape[:-1] + (3,), qs.dtype).at[..., _AXES[forward]].set(1.0)
    return from_directions(qrotate(qs, d), plane=plane)


def to_quaternions(ps: jax.Array, plane: str = "xz") -> jax.Array:
    """(...,) angles -> (..., 4) rotations about the plane normal.
    Ref ``quaternions`` (:48-53): the axis is all-ones with the two plane
    components zeroed (i.e. the remaining axis)."""
    axis = jnp.ones(jnp.shape(ps) + (3,))
    axis = axis.at[..., _AXES[plane[0]]].set(0.0)
    axis = axis.at[..., _AXES[plane[1]]].set(0.0)
    return from_angle_axis(ps, axis)


def to_directions(ps: jax.Array, plane: str = "xz") -> jax.Array:
    """(...,) angles -> (..., 3) unit directions in the plane.
    Ref ``directions`` (:55-59) (with its axis-indexing defect fixed: the
    reference indexes rows of the output instead of components)."""
    out = jnp.zeros(jnp.shape(ps) + (3,))
    out = out.at[..., _AXES[plane[0]]].set(jnp.sin(ps))
    out = out.at[..., _AXES[plane[1]]].set(jnp.cos(ps))
    return out


def interpolate(ps: jax.Array, ws: jax.Array, plane: str = "xz") -> jax.Array:
    """Weighted circular mean.  Ref ``interpolate`` (:67-69)."""
    dirs = jnp.sum(to_directions(ps, plane) * ws[..., None], axis=0)
    return from_directions(dirs[None], plane)[0]

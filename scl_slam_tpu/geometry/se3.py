"""Batched SE(3) operations on (R, t) pairs.

Poses are represented as a pair of arrays ``(R, t)`` with shapes
``[..., 3, 3]`` and ``[..., 3]`` — kept unpacked (structure-of-arrays) so XLA
can fuse freely and shardings stay simple. A stacked ``[..., 3, 4]`` or
``[..., 4, 4]`` convenience form is provided for I/O.

Capability parity: replaces GTSAM ``Pose3`` usage in the reference
(``include/distributedMapping.h:214-231, 693-698``): compose, between,
inverse, exp/log, transform of point clouds.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import so3


class Pose(NamedTuple):
    """Batched SE(3) element: rotation [..., 3, 3], translation [..., 3]."""

    R: jax.Array
    t: jax.Array

    @property
    def batch_shape(self):
        return self.t.shape[:-1]


def identity(batch_shape=(), dtype=jnp.float32) -> Pose:
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3), dtype=dtype)
    return Pose(R, t)


def compose(a: Pose, b: Pose) -> Pose:
    """a * b (apply b then a)."""
    R = a.R @ b.R
    t = jnp.einsum("...ij,...j->...i", a.R, b.t) + a.t
    return Pose(R, t)


def inverse(p: Pose) -> Pose:
    Rt = jnp.swapaxes(p.R, -1, -2)
    return Pose(Rt, -jnp.einsum("...ij,...j->...i", Rt, p.t))


def between(a: Pose, b: Pose) -> Pose:
    """Relative pose a^{-1} * b (GTSAM ``Pose3::between`` semantics,

    reference ``include/distributedMapping.h:693``)."""
    return compose(inverse(a), b)


def exp(xi: jax.Array) -> Pose:
    """se(3) exp: twist [..., 6] (omega, v) -> Pose."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3.exp(w)
    J = so3.left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", J, v)
    return Pose(R, t)


def log(p: Pose) -> jax.Array:
    """SE(3) log: Pose -> twist [..., 6] (omega, v)."""
    w = so3.log(p.R)
    Jinv = so3.left_jacobian_inv(w)
    v = jnp.einsum("...ij,...j->...i", Jinv, p.t)
    return jnp.concatenate([w, v], axis=-1)


def retract(p: Pose, xi: jax.Array) -> Pose:
    """Right-multiplicative retraction p * exp(xi) used by the GN solver.

    Re-orthonormalizes the result: repeated retractions are exactly the
    chained-composition pattern that drifts rotations off SO(3) in f32.
    """
    q = compose(p, exp(xi))
    return Pose(so3.orthonormalize(q.R), q.t)


def local(a: Pose, b: Pose) -> jax.Array:
    """log(a^{-1} b): the local coordinates of b around a."""
    return log(between(a, b))


def transform_points(p: Pose, pts: jax.Array) -> jax.Array:
    """Apply pose to points [..., N, 3] (replaces the reference's OpenMP

    ``transformPointCloud``, ``include/distributedMapping.h:234-253``)."""
    return jnp.einsum("...ij,...nj->...ni", p.R, pts) + p.t[..., None, :]


def adjoint(p: Pose) -> jax.Array:
    """SE(3) adjoint [..., 6, 6] mapping twists between frames."""
    zeros = jnp.zeros_like(p.R)
    top = jnp.concatenate([p.R, zeros], axis=-1)
    bottom = jnp.concatenate([so3.hat(p.t) @ p.R, p.R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def to_matrix(p: Pose) -> jax.Array:
    """Pose -> homogeneous [..., 4, 4]."""
    batch = p.t.shape[:-1]
    top = jnp.concatenate([p.R, p.t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=p.t.dtype), (*batch, 4)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(T: jax.Array) -> Pose:
    return Pose(T[..., :3, :3], T[..., :3, 3])


def from_xyzrpy(xyzrpy: jax.Array) -> Pose:
    """[..., 6] (x, y, z, roll, pitch, yaw) -> Pose.

    Mirrors the reference's ``PointPose6D`` storage
    (``include/distributedMapping.h:40-55``)."""
    return Pose(so3.from_euler(xyzrpy[..., 3:]), xyzrpy[..., :3])


def to_xyzrpy(p: Pose) -> jax.Array:
    return jnp.concatenate([p.t, so3.to_euler(p.R)], axis=-1)


def from_quat_trans(q: jax.Array, t: jax.Array) -> Pose:
    return Pose(so3.quat_to_matrix(q), t)


def to_quat_trans(p: Pose):
    return so3.matrix_to_quat(p.R), p.t


def stack(poses, axis=0) -> Pose:
    return Pose(
        jnp.stack([p.R for p in poses], axis=axis),
        jnp.stack([p.t for p in poses], axis=axis),
    )


def index(p: Pose, idx) -> Pose:
    return Pose(p.R[idx], p.t[idx])


def take(p: Pose, indices: jax.Array, axis=0) -> Pose:
    return Pose(
        jnp.take(p.R, indices, axis=axis),
        jnp.take(p.t, indices, axis=axis),
    )

"""Quaternion and rigid-pose math (pure JAX, differentiable).

Replaces the reference's dependency on ``roma.unitquat_to_rotmat``
(reference fit.py:548-550). Quaternions use the XYZW layout to match roma
and the saved ``pose.json`` format (reference fit.py:275-283).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def quat_identity(shape=()) -> Array:
    """Identity quaternion(s) [0, 0, 0, 1], broadcast to ``shape + (4,)``."""
    q = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)
    return jnp.broadcast_to(q, tuple(shape) + (4,))


def quat_normalize(q) -> Array:
    """Normalize quaternion(s) to unit norm along the last axis."""
    q = jnp.asarray(q, dtype=jnp.float32)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rotmat(q) -> Array:
    """Unit quaternion (XYZW) -> 3x3 rotation matrix, batched over leading dims.

    Matches roma's ``unitquat_to_rotmat`` convention used at reference
    fit.py:548-550; input is assumed unit-norm (not normalized here, like
    roma) so the post-step renormalization of the reference loop
    (fit.py:616-618) remains meaningful.
    """
    q = jnp.asarray(q, dtype=jnp.float32)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_multiply(q1, q2) -> Array:
    """Hamilton product of XYZW quaternions (batched)."""
    q1 = jnp.asarray(q1, dtype=jnp.float32)
    q2 = jnp.asarray(q2, dtype=jnp.float32)
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def rigid_from_pose(tvec, quat) -> Array:
    """4x4 rigid transform from translation (3,) + unit quaternion (4,)."""
    from fpc_diffrend_tpu.models.camera import rigid_transform

    return rigid_transform(tvec, quat_to_rotmat(quat))

"""Camera math: calibrated intrinsics/extrinsics -> OpenGL-convention matrices.

Conventions replicate the reference implementation exactly so that
``calibration/calibration.json`` (OpenCV convention: +x right, +y down,
+z forward) maps into the same OpenGL clip space the reference renders in
(reference camera.py:27-41 for the projection, camera.py:46-66 for the
modelview with its row sign flips, camera.py:11-23 for the clip transform).

All functions are pure and jit-safe; they accept numpy or jax arrays and
return jax arrays (float32).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def intrinsic_to_projection(intr, zn: float = 0.01, zf: float = 200.0) -> Array:
    """OpenGL projection matrix from a 3x3 pinhole intrinsic matrix.

    Mirrors reference camera.py:27-41: the focal/principal-point ratio sets
    the frustum half-angles (fx/cx, fy/cy), with standard GL depth terms.

    :param intr: 3x3 intrinsic matrix ([[fx,s,cx],[0,fy,cy],[0,0,1]]) in pixels.
    :param zn: near plane distance.
    :param zf: far plane distance.
    :return: (4, 4) float32 projection matrix.
    """
    intr = jnp.asarray(intr, dtype=jnp.float32)
    zn = jnp.float32(zn)
    zf = jnp.float32(zf)
    zero = jnp.float32(0.0)
    return jnp.stack(
        [
            jnp.stack([intr[0, 0] / intr[0, 2], zero, zero, zero]),
            jnp.stack([zero, intr[1, 1] / intr[1, 2], zero, zero]),
            jnp.stack([zero, zero, -(zf + zn) / (zf - zn), -(2.0 * zf * zn) / (zf - zn)]),
            jnp.stack([zero, zero, jnp.float32(-1.0), zero]),
        ]
    )


def extrinsic_to_modelview(rmat, tvec) -> Array:
    """OpenGL modelview matrix from OpenCV extrinsics.

    OpenCV cameras look down +z with +y down; OpenGL looks down -z with +y
    up. The conversion negates rows 1 and 2 of [R|t] (reference
    camera.py:46-66).

    :param rmat: 3x3 rotation matrix (world -> camera).
    :param tvec: translation, shape (3,), (3, 1) or (1, 3).
    :return: (4, 4) float32 modelview matrix.
    """
    rmat = jnp.asarray(rmat, dtype=jnp.float32).reshape(3, 3)
    tvec = jnp.asarray(tvec, dtype=jnp.float32).reshape(3, 1)
    rt = jnp.concatenate([rmat, tvec], axis=1)  # (3, 4)
    flip = jnp.array([[1.0], [-1.0], [-1.0]], dtype=jnp.float32)
    rt = rt * flip
    br = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=jnp.float32)
    return jnp.concatenate([rt, br], axis=0)


def transform_clip(mvp, pos) -> Array:
    """Transform vertex positions to homogeneous clip space.

    Reference camera.py:11-23 (without the leading batch dim — batching is
    done with vmap here).

    :param mvp: (4, 4) modelview-projection matrix.
    :param pos: (V, 3) vertex positions.
    :return: (V, 4) clip-space positions.
    """
    mvp = jnp.asarray(mvp, dtype=jnp.float32)
    pos = jnp.asarray(pos, dtype=jnp.float32)
    posw = jnp.concatenate([pos, jnp.ones((pos.shape[0], 1), dtype=pos.dtype)], axis=1)
    return posw @ mvp.T


def default_projection(xn: float = 1.0, xf: float = 50.0, x: float = 0.1) -> np.ndarray:
    """Simple symmetric frustum (reference camera.py:70-74)."""
    return np.array(
        [
            [xn / x, 0, 0, 0],
            [0, xn / -x, 0, 0],
            [0, 0, -(xf + xn) / (xf - xn), -(2 * xf * xn) / (xf - xn)],
            [0, 0, -1, 0],
        ],
        dtype=np.float32,
    )


def default_modelview(zoffset: float = -30.0) -> np.ndarray:
    """Identity view with a z offset (reference camera.py:79-83)."""
    m = np.eye(4, dtype=np.float32)
    m[2, 3] = zoffset
    return m


def rotate_x(a: float) -> np.ndarray:
    """Rotation about x (reference camera.py:98-103 convention)."""
    s, c = np.sin(a), np.cos(a)
    return np.array(
        [[1, 0, 0, 0], [0, c, s, 0], [0, -s, c, 0], [0, 0, 0, 1]], dtype=np.float32
    )


def rotate_y(a: float) -> np.ndarray:
    """Rotation about y (reference camera.py:88-93 convention)."""
    s, c = np.sin(a), np.cos(a)
    return np.array(
        [[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]], dtype=np.float32
    )


def translate(x: float, y: float, z: float) -> np.ndarray:
    """Translation matrix (reference camera.py:108-112)."""
    m = np.eye(4, dtype=np.float32)
    m[0, 3] = x
    m[1, 3] = y
    m[2, 3] = z
    return m


def rigid_transform(tvec, rotmat) -> Array:
    """Differentiable rigid transform from translation + rotation matrix.

    Equivalent of reference camera.py:128-132 (``rigid_grad``): builds the
    4x4 [R|t; 0 1] so gradients flow to both ``tvec`` and ``rotmat``.

    :param tvec: (3,) translation.
    :param rotmat: (3, 3) rotation.
    :return: (4, 4) float32 transform.
    """
    rotmat = jnp.asarray(rotmat, dtype=jnp.float32)
    tvec = jnp.asarray(tvec, dtype=jnp.float32).reshape(3, 1)
    rt = jnp.concatenate([rotmat, tvec], axis=1)
    br = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=jnp.float32)
    return jnp.concatenate([rt, br], axis=0)

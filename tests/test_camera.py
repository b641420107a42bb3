"""Camera math parity tests vs. hand-computed reference conventions."""

import numpy as np
import jax.numpy as jnp

from fpc_diffrend_tpu.models import camera, pose


INTR = np.array([[7000.0, 0.0, 600.0], [0.0, 7000.0, 800.0], [0.0, 0.0, 1.0]],
                dtype=np.float32)


def _ref_intrinsic_to_projection(intr, zn=0.01, zf=200.0):
    # transcription of reference camera.py:27-41
    return np.array(
        [[intr[0, 0] / intr[0, 2], 0, 0, 0],
         [0, intr[1, 1] / intr[1, 2], 0, 0],
         [0, 0, -(zf + zn) / (zf - zn), -(2 * zf * zn) / (zf - zn)],
         [0, 0, -1, 0]], dtype=np.float32)


def _ref_extrinsic_to_modelview(rmat, tvec):
    # transcription of reference camera.py:46-66
    rt = np.append(rmat, tvec, axis=1)
    br = np.array([0, 0, 0, 1], dtype=np.float32)
    mdv = np.vstack((rt, br))
    for r, c in [(1, 0), (1, 1), (1, 2), (2, 0), (2, 1), (2, 2), (1, 3), (2, 3)]:
        mdv[r, c] *= -1
    return mdv


def test_intrinsic_to_projection_matches_reference():
    got = np.asarray(camera.intrinsic_to_projection(INTR))
    want = _ref_intrinsic_to_projection(INTR)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_extrinsic_to_modelview_matches_reference(rng):
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    rmat = q.astype(np.float32)
    tvec = rng.normal(size=(3, 1)).astype(np.float32)
    got = np.asarray(camera.extrinsic_to_modelview(rmat, tvec))
    want = _ref_extrinsic_to_modelview(rmat, tvec)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_transform_clip():
    mvp = np.eye(4, dtype=np.float32)
    mvp[0, 3] = 2.0
    pos = np.array([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]], dtype=np.float32)
    clip = np.asarray(camera.transform_clip(mvp, pos))
    np.testing.assert_allclose(clip[0], [3.0, 2.0, 3.0, 1.0], rtol=1e-6)
    np.testing.assert_allclose(clip[1], [2.0, 0.0, 0.0, 1.0], rtol=1e-6)


def test_rigid_transform_composition():
    t = jnp.array([1.0, 2.0, 3.0])
    r = jnp.eye(3)
    m = np.asarray(camera.rigid_transform(t, r))
    want = np.eye(4, dtype=np.float32)
    want[:3, 3] = [1, 2, 3]
    np.testing.assert_allclose(m, want)


def test_quat_to_rotmat_identity_and_axes():
    np.testing.assert_allclose(
        np.asarray(pose.quat_to_rotmat(pose.quat_identity())), np.eye(3), atol=1e-7)
    # 90 deg about z: q = (0, 0, sin45, cos45), xyzw
    s = np.sin(np.pi / 4)
    q = jnp.array([0.0, 0.0, s, s])
    R = np.asarray(pose.quat_to_rotmat(q))
    want = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(R, want, atol=1e-6)


def test_quat_to_rotmat_is_rotation(rng):
    q = pose.quat_normalize(rng.normal(size=(5, 4)).astype(np.float32))
    R = np.asarray(pose.quat_to_rotmat(q))
    for i in range(5):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R[i]) > 0.99


def test_quat_multiply_matches_rotmat_product(rng):
    q1 = pose.quat_normalize(rng.normal(size=4).astype(np.float32))
    q2 = pose.quat_normalize(rng.normal(size=4).astype(np.float32))
    R12 = np.asarray(pose.quat_to_rotmat(pose.quat_multiply(q1, q2)))
    want = np.asarray(pose.quat_to_rotmat(q1)) @ np.asarray(pose.quat_to_rotmat(q2))
    np.testing.assert_allclose(R12, want, atol=1e-5)


def test_projection_pipeline_center_point():
    """A point on the camera axis projects to the principal point ray."""
    proj = np.asarray(camera.intrinsic_to_projection(INTR))
    # camera at origin looking down +z (opencv) -> after GL flip, -z
    mv = np.asarray(camera.extrinsic_to_modelview(np.eye(3, dtype=np.float32),
                                                  np.zeros((3, 1), np.float32)))
    mvp = proj @ mv
    p = np.array([[0.0, 0.0, 10.0]], dtype=np.float32)  # 10 units in front
    clip = np.asarray(camera.transform_clip(mvp, p))[0]
    ndc = clip[:3] / clip[3]
    np.testing.assert_allclose(ndc[:2], [0.0, 0.0], atol=1e-6)
    assert -1.0 < ndc[2] < 1.0

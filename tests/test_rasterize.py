"""Rasterizer correctness: coverage, depth, barycentrics, gradients."""

import numpy as np
import jax
import jax.numpy as jnp

import fpc_diffrend_tpu.ops.rasterize as r


def ndc_quad(z=0.5, w=1.0, scale=0.5):
    """Two triangles covering [-scale, scale]^2 at constant ndc depth z."""
    pos = np.array([
        [-scale, -scale, z, 1.0],
        [scale, -scale, z, 1.0],
        [scale, scale, z, 1.0],
        [-scale, scale, z, 1.0],
    ], dtype=np.float32) * np.array([w, w, w, w], dtype=np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    return jnp.asarray(pos), jnp.asarray(faces)


def test_coverage_center_quad():
    pos, faces = ndc_quad(scale=0.5)
    rast, _ = r.rasterize(pos, faces, (32, 32), impl="scan")
    ids = np.asarray(rast[..., 3])
    # center covered, corners background
    assert ids[16, 16] > 0
    assert ids[0, 0] == 0 and ids[31, 31] == 0
    # quad covers ndc [-.5,.5]^2 -> pixels 8..24 in each dim
    covered = (ids > 0)
    assert covered[8:24, 8:24].all()
    assert covered.sum() == 16 * 16


def test_ids_and_diagonal_split():
    pos, faces = ndc_quad(scale=1.0)  # full screen
    rast, _ = r.rasterize(pos, faces, (16, 16), impl="scan")
    ids = np.asarray(rast[..., 3])
    assert (ids > 0).all()
    # tri 0 = lower-right of the diagonal, tri 1 = upper-left
    assert ids[2, 13] == 1
    assert ids[13, 2] == 2


def test_barycentrics_interpolate_linearly():
    pos, faces = ndc_quad(scale=1.0)
    H = W = 64
    rast, _ = r.rasterize(pos, faces, (H, W), impl="scan")
    u = np.asarray(rast[..., 0])
    v = np.asarray(rast[..., 1])
    ids = np.asarray(rast[..., 3])
    # For tri 0 (verts ndc (-1,-1),(1,-1),(1,1)): attribute = u*a0+v*a1+(1-u-v)*a2.
    # Check a few pixels: reconstruct ndc x,y from (u,v) and compare to pixel center.
    ys, xs = np.nonzero(ids == 1)
    px = (xs + 0.5) / W * 2 - 1
    py = (ys + 0.5) / H * 2 - 1
    a = np.array([[-1, -1], [1, -1], [1, 1]], dtype=np.float64)
    rec = (u[ys, xs, None] * a[0] + v[ys, xs, None] * a[1]
           + (1 - u - v)[ys, xs, None] * a[2])
    np.testing.assert_allclose(rec[:, 0], px, atol=1e-4)
    np.testing.assert_allclose(rec[:, 1], py, atol=1e-4)


def test_depth_ordering():
    # near quad (z=-0.5) should beat far quad (z=0.5)
    near_pos, _ = ndc_quad(z=-0.5, scale=0.3)
    far_pos, _ = ndc_quad(z=0.5, scale=0.8)
    pos = jnp.concatenate([near_pos, far_pos], axis=0)
    faces = jnp.asarray(np.array(
        [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32))
    rast, _ = r.rasterize(pos, faces, (64, 64), impl="scan")
    ids = np.asarray(rast[..., 3])
    assert ids[32, 32] in (1, 2)      # near quad wins the center
    assert ids[32, 8] in (3, 4)       # far quad alone at the edge
    z = np.asarray(rast[..., 2])
    np.testing.assert_allclose(z[32, 32], -0.5, atol=1e-5)
    np.testing.assert_allclose(z[32, 8], 0.5, atol=1e-5)


def test_perspective_correct_barycentrics():
    """A triangle with differing w: (u, v) must be perspective-correct."""
    # vertex 0 at w=1, vertices 1,2 at w=4 (farther). Screen-space midpoint
    # between v0 and v1 must have u > 0.5 (nearer vertex dominates).
    pos = jnp.asarray(np.array([
        [-0.9, -0.9, 0.0, 1.0],
        [4 * 0.9, 4 * -0.9, 0.0, 4.0],
        [4 * 0.0, 4 * 0.9, 0.0, 4.0],
    ], dtype=np.float32))
    faces = jnp.asarray(np.array([[0, 1, 2]], np.int32))
    H = W = 65
    rast, _ = r.rasterize(pos, faces, (H, W), impl="scan")
    ids = np.asarray(rast[..., 3])
    u = np.asarray(rast[..., 0])
    # pixel near ndc (0, -0.9): screen midpoint of v0-v1 edge
    iy, ix = 3, 32
    assert ids[iy, ix] == 1
    assert u[iy, ix] > 0.6   # perspective-correct pulls toward near vertex
    # screen-space (non-perspective) bary would be ~0.5
    assert u[iy, ix] < 0.85


def test_position_gradients_match_finite_difference():
    """Analytic grad == FD with visibility ids held fixed.

    Like nvdiffrast, rasterize's gradient treats the discrete per-pixel
    triangle id as constant (coverage gradients come from antialias), so the
    finite-difference baseline must also hold ids fixed.
    """
    pos_np = np.array([
        [-0.8, -0.6, 0.2, 1.0],
        [0.7, -0.5, 0.2, 1.0],
        [0.1, 0.8, 0.2, 1.0],
    ], dtype=np.float32)
    faces = jnp.asarray(np.array([[0, 1, 2]], np.int32))
    H = W = 48

    idbuf = r.visibility_scan(jnp.asarray(pos_np), faces, H, W)

    def loss(p):
        u, v, z, mask = r.pixel_attributes(p, faces, idbuf, H, W)
        return (jnp.sum(u * 1.3) + jnp.sum(v * 0.7) + jnp.sum(z * 0.11))

    g = np.asarray(jax.grad(loss)(jnp.asarray(pos_np)))
    assert np.all(np.isfinite(g))

    eps = 1e-3
    for (i, j) in [(0, 0), (1, 1), (2, 0), (0, 3), (1, 3)]:
        pp = pos_np.copy(); pp[i, j] += eps
        pm = pos_np.copy(); pm[i, j] -= eps
        fd = (float(loss(jnp.asarray(pp))) - float(loss(jnp.asarray(pm)))) / (2 * eps)
        np.testing.assert_allclose(g[i, j], fd, rtol=2e-3, atol=1e-2)


def test_rast_db_matches_neighbor_differences():
    pos, faces = ndc_quad(scale=1.0, w=1.0)
    H = W = 32
    rast, db = r.rasterize(pos, faces, (H, W), impl="scan")
    u = np.asarray(rast[..., 0])
    db = np.asarray(db)
    # interior of tri 0: du/dx should match horizontal pixel difference
    ids = np.asarray(rast[..., 3])
    inside = (ids[:, :-1] == 1) & (ids[:, 1:] == 1)
    diff = u[:, 1:] - u[:, :-1]
    pred = 0.5 * (db[:, 1:, 0] + db[:, :-1, 0])
    np.testing.assert_allclose(diff[inside], pred[inside], atol=1e-4)


def test_degenerate_and_behind_camera_triangles_ignored():
    pos = jnp.asarray(np.array([
        [-0.5, -0.5, 0.0, 1.0],
        [0.5, -0.5, 0.0, 1.0],
        [0.0, 0.5, 0.0, 1.0],
        # behind-camera triangle (negative w)
        [-0.5, -0.5, 0.0, -1.0],
        [0.5, -0.5, 0.0, -1.0],
        [0.0, 0.5, 0.0, -1.0],
        # degenerate (zero area)
        [0.1, 0.1, 0.0, 1.0],
    ], dtype=np.float32))
    faces = jnp.asarray(np.array([[0, 1, 2], [3, 4, 5], [6, 6, 6]], np.int32))
    rast, _ = r.rasterize(pos, faces, (32, 32), impl="scan")
    ids = np.asarray(rast[..., 3])
    assert set(np.unique(ids)) <= {0.0, 1.0}

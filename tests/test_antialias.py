"""Antialias: silhouette blending behavior + coverage gradients."""

import numpy as np
import jax
import jax.numpy as jnp

import fpc_diffrend_tpu.ops.rasterize as r
from fpc_diffrend_tpu.data import obj as objlib
from fpc_diffrend_tpu.ops.antialias import antialias

import pytest

# interpret-mode Pallas kernel tests dominate suite runtime (round-4
# VERDICT #8): run with `pytest -m slow`; the default fast set keeps
# scan-path parity + golden coverage for every kernel.
pytestmark = pytest.mark.slow


def tri_scene(shift_x=0.0):
    pos = jnp.asarray(np.array([
        [-0.5 + shift_x, -0.5, 0.0, 1.0],
        [0.5 + shift_x, -0.5, 0.0, 1.0],
        [0.0 + shift_x, 0.5, 0.0, 1.0],
    ], dtype=np.float32))
    faces = np.array([[0, 1, 2]], np.int32)
    topo = objlib.build_topology(faces, 3)
    return pos, jnp.asarray(faces), jnp.asarray(topo.face_neighbors)


def render_flat(pos, faces, neighbors, H=64, W=64, fg=1.0, bg=0.0):
    rast, _ = r.rasterize(pos, faces, (H, W), impl="scan")
    color = jnp.where(rast[..., 3:] > 0, fg, bg)
    return antialias(color, rast, pos, faces, neighbors), rast


def test_antialias_blends_silhouette_pixels():
    pos, faces, neighbors = tri_scene()
    aa, rast = render_flat(pos, faces, neighbors)
    aa = np.asarray(aa)[..., 0]
    hard = np.asarray(jnp.where(rast[..., 3] > 0, 1.0, 0.0))
    # AA must produce fractional values near edges
    frac = (aa > 0.01) & (aa < 0.99)
    assert frac.sum() > 10
    # and leave interior/background untouched
    assert aa[32, 32] == 1.0
    assert aa[1, 1] == 0.0
    # AA only moves values toward the other side
    assert np.abs(aa - hard).max() <= 0.5 + 1e-6


def test_antialias_no_op_on_interior_edges():
    """Shared (interior) edges with equal shading must not change."""
    pos = jnp.asarray(np.array([
        [-0.8, -0.8, 0, 1], [0.8, -0.8, 0, 1], [0.8, 0.8, 0, 1], [-0.8, 0.8, 0, 1],
    ], dtype=np.float32))
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    topo = objlib.build_topology(faces, 4)
    H = W = 32
    rast, _ = r.rasterize(pos, jnp.asarray(faces), (H, W), impl="scan")
    color = jnp.ones((H, W, 1))
    aa = np.asarray(antialias(color, rast, pos, jnp.asarray(faces),
                              jnp.asarray(topo.face_neighbors)))
    # interior diagonal edge: same color both sides, and it's a shared edge
    # -> no blending anywhere inside; silhouette edges blend against... color
    # buffer is constant 1 everywhere (incl. background pixels), so even
    # silhouette pairs blend 1 with 1.
    np.testing.assert_allclose(aa, 1.0, atol=1e-6)


def test_antialias_coverage_gradient_sign_and_magnitude():
    """d(mean image)/d(translate x) ~ FD of the antialiased render."""
    H = W = 64
    _, faces, neighbors = tri_scene()

    def mean_img(shift):
        pos = tri_scene(0.0)[0]
        pos = pos.at[:, 0].add(shift * pos[:, 3])
        aa, _ = render_flat(pos, faces, neighbors, H, W)
        # weight by a ramp so pure translation changes the loss
        wmap = jnp.linspace(0.0, 1.0, W)[None, :, None]
        return jnp.mean(aa * wmap)

    g = float(jax.grad(mean_img)(0.0))
    # FD over a span larger than one pixel to average discreteness
    d = 2.0 / W
    fd = (float(mean_img(d)) - float(mean_img(-d))) / (2 * d)
    assert g != 0.0
    np.testing.assert_allclose(g, fd, rtol=0.25)


def test_antialias_gradient_flows_to_vertices():
    pos, faces, neighbors = tri_scene()

    def loss(p):
        aa, _ = render_flat(p, faces, neighbors)
        wmap = jnp.linspace(0.0, 1.0, 64)[None, :, None]
        return jnp.sum(aa * wmap)

    g = np.asarray(jax.grad(loss)(pos))
    assert np.isfinite(g).all()
    # x-coordinates must receive gradient (silhouette motion)
    assert np.abs(g[:, 0]).max() > 0


def test_compact_antialias_matches_full():
    """Compacted path == full-grid path (values and gradients)."""
    import jax

    pos, faces, neighbors = tri_scene(0.07)
    H = W = 64
    rast, _ = r.rasterize(pos, faces, (H, W), impl="scan")
    color = jnp.where(rast[..., 3:] > 0, 0.9, 0.1)

    from fpc_diffrend_tpu.ops.antialias import antialias as aa_fn

    full = aa_fn(color, rast, pos, faces, neighbors)
    compact = aa_fn(color, rast, pos, faces, neighbors, max_pairs=1024)
    np.testing.assert_allclose(np.asarray(compact), np.asarray(full),
                               atol=1e-6)

    def loss(p, fn_kwargs):
        aa = aa_fn(color, rast, p, faces, neighbors, **fn_kwargs)
        wmap = jnp.linspace(0.0, 1.0, W)[None, :, None]
        return jnp.sum(aa * wmap)

    g_full = jax.grad(lambda p: loss(p, {}))(pos)
    g_compact = jax.grad(lambda p: loss(p, {"max_pairs": 1024}))(pos)
    np.testing.assert_allclose(np.asarray(g_compact), np.asarray(g_full),
                               atol=1e-5)


def test_compact_antialias_cap_overflow_drops_gracefully():
    pos, faces, neighbors = tri_scene()
    H = W = 64
    rast, _ = r.rasterize(pos, faces, (H, W), impl="scan")
    color = jnp.where(rast[..., 3:] > 0, 1.0, 0.0)
    from fpc_diffrend_tpu.ops.antialias import antialias as aa_fn

    # absurdly small cap: still finite, no crash, partial AA
    out = aa_fn(color, rast, pos, faces, neighbors, max_pairs=4)
    assert np.isfinite(np.asarray(out)).all()


def _winner_planes(pos, faces, neighbors, rast, H, W):
    """Build the fused kernel's winner payload planes from scan outputs."""
    from fpc_diffrend_tpu.ops.rasterize import screen_vertices

    sv = screen_vertices(pos, W, H)
    tri = sv[faces][:, :, :2].reshape(faces.shape[0], 6)     # (T, 6)
    ids = rast[..., 3].astype(jnp.int32) - 1
    safe = jnp.maximum(ids, 0)
    verts_img = jnp.where((ids >= 0)[..., None], tri[safe], 0.0)
    neigh_img = jnp.where((ids >= 0)[..., None],
                          neighbors[safe].astype(jnp.float32), -1.0)
    return verts_img, neigh_img


def test_fused_antialias_matches_gather_antialias():
    """antialias_fused (winner-plane formulation) == antialias, values and
    vertex gradients, on a multi-triangle occlusion scene."""
    from fpc_diffrend_tpu.ops.antialias import antialias_fused

    rng = np.random.default_rng(3)
    quads = []
    faces_all = []
    base = 0
    for (cx, cy, z, s) in [(-0.2, 0.0, 0.2, 0.55), (0.25, 0.1, -0.3, 0.4),
                           (0.0, -0.3, 0.0, 0.3)]:
        pos = np.array([
            [cx - s, cy - s, z, 1], [cx + s, cy - s, z, 1],
            [cx + s, cy + s, z, 1], [cx - s, cy + s, z, 1]], np.float32)
        quads.append(pos)
        faces_all.append(np.array([[0, 1, 2], [0, 2, 3]], np.int32) + base)
        base += 4
    pos = jnp.asarray(np.concatenate(quads))
    faces = np.concatenate(faces_all)
    topo = objlib.build_topology(faces, pos.shape[0])
    neighbors = jnp.asarray(topo.face_neighbors)
    faces = jnp.asarray(faces)
    H = W = 96
    tex_colors = jnp.asarray(
        rng.uniform(0.2, 1.0, size=(faces.shape[0],)).astype(np.float32))

    def color_of(rast):
        ids = rast[..., 3].astype(jnp.int32) - 1
        return jnp.where((ids >= 0)[..., None],
                         tex_colors[jnp.maximum(ids, 0)][..., None], 0.1)

    def out_gather(p):
        rast, _ = r.rasterize(p, faces, (H, W), impl="scan")
        color = color_of(rast)
        return antialias(color, rast, p, faces, neighbors)

    def out_fused(p):
        rast, _ = r.rasterize(p, faces, (H, W), impl="scan")
        color = color_of(rast)
        verts_img, neigh_img = _winner_planes(p, faces, neighbors, rast,
                                              H, W)
        return antialias_fused(color, rast, verts_img, neigh_img)

    np.testing.assert_allclose(np.asarray(out_fused(pos)),
                               np.asarray(out_gather(pos)), atol=1e-6)

    gimg = jnp.asarray(rng.normal(size=(H, W, 1)).astype(np.float32))
    g_gather = jax.grad(lambda p: jnp.sum(out_gather(p) * gimg))(pos)
    g_fused = jax.grad(lambda p: jnp.sum(out_fused(p) * gimg))(pos)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_gather),
                               rtol=1e-4, atol=1e-5)


def test_pallas_antialias_matches_fused():
    """antialias_payload_pallas (tile-stencil kernel, interpret mode) ==
    antialias_fused: values, color gradients, and the payload screen-corner
    gradients vs the verts_img gradients of the XLA formulation."""
    from fpc_diffrend_tpu.ops.antialias import antialias_fused
    from fpc_diffrend_tpu.ops.pallas.antialias_tpu import (
        antialias_payload_pallas)
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import N_PAYLOAD

    rng = np.random.default_rng(7)
    quads, faces_all, base = [], [], 0
    for (cx, cy, z, s) in [(-0.2, 0.0, 0.2, 0.55), (0.25, 0.1, -0.3, 0.4),
                           (0.0, -0.3, 0.0, 0.3)]:
        pos = np.array([
            [cx - s, cy - s, z, 1], [cx + s, cy - s, z, 1],
            [cx + s, cy + s, z, 1], [cx - s, cy + s, z, 1]], np.float32)
        quads.append(pos)
        faces_all.append(np.array([[0, 1, 2], [0, 2, 3]], np.int32) + base)
        base += 4
    pos = jnp.asarray(np.concatenate(quads))
    faces = np.concatenate(faces_all)
    topo = objlib.build_topology(faces, pos.shape[0])
    neighbors = jnp.asarray(topo.face_neighbors)
    faces = jnp.asarray(faces)
    H, W = 72, 136   # off-tile-grid width exercises the pad/edge masks
    tex_colors = jnp.asarray(
        rng.uniform(0.2, 1.0, size=(faces.shape[0],)).astype(np.float32))

    rast, _ = r.rasterize(pos, faces, (H, W), impl="scan")
    ids = rast[..., 3].astype(jnp.int32) - 1
    color0 = jnp.where((ids >= 0)[..., None],
                       tex_colors[jnp.maximum(ids, 0)][..., None], 0.1)
    verts_img0, neigh_img0 = _winner_planes(pos, faces, neighbors, rast,
                                            H, W)

    def payload_of(verts_img):
        pay = jnp.zeros((N_PAYLOAD, H, W), jnp.float32)
        pay = pay.at[2].set(rast[..., 2])
        pay = pay.at[5:11].set(jnp.moveaxis(verts_img, -1, 0))
        pay = pay.at[11:14].set(jnp.moveaxis(neigh_img0, -1, 0))
        return pay

    def out_fused(color, verts_img):
        return antialias_fused(color, rast, verts_img, neigh_img0)

    def out_pallas(color, verts_img):
        return antialias_payload_pallas(color, ids, payload_of(verts_img),
                                        interpret=True)

    np.testing.assert_allclose(
        np.asarray(out_pallas(color0, verts_img0)),
        np.asarray(out_fused(color0, verts_img0)), atol=1e-6)

    gimg = jnp.asarray(rng.normal(size=(H, W, 1)).astype(np.float32))

    def loss(fn):
        return lambda c, v: jnp.sum(fn(c, v) * gimg)

    gc_f, gv_f = jax.grad(loss(out_fused), argnums=(0, 1))(color0, verts_img0)
    gc_p, gv_p = jax.grad(loss(out_pallas), argnums=(0, 1))(color0,
                                                            verts_img0)
    np.testing.assert_allclose(np.asarray(gc_p), np.asarray(gc_f),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_f),
                               rtol=1e-5, atol=1e-6)

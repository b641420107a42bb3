"""Mesh regularizer tests: analytic values on simple meshes + grad checks."""

import numpy as np
import jax
import jax.numpy as jnp

from fpc_diffrend_tpu.data import obj as objlib
from fpc_diffrend_tpu.ops import mesh_ops


def quad_mesh():
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], dtype=np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    topo = objlib.build_topology(faces, 4)
    return verts, faces, topo


def test_edge_loss_values():
    verts, faces, topo = quad_mesh()
    # edges: 4 of length 1, diagonal sqrt(2)
    loss = float(mesh_ops.mesh_edge_loss(jnp.asarray(verts), jnp.asarray(topo.edges), 0.0))
    want = (4 * 1.0 + 2.0) / 5.0
    np.testing.assert_allclose(loss, want, rtol=1e-6)
    loss_t = float(mesh_ops.mesh_edge_loss(jnp.asarray(verts), jnp.asarray(topo.edges), 1.0))
    want_t = (4 * 0.0 + (np.sqrt(2) - 1) ** 2) / 5.0
    np.testing.assert_allclose(loss_t, want_t, rtol=1e-6)


def test_laplacian_flat_quad_nonzero_boundary():
    verts, faces, topo = quad_mesh()
    lap = np.asarray(mesh_ops.uniform_laplacian(
        jnp.asarray(verts), jnp.asarray(topo.neighbor_src),
        jnp.asarray(topo.neighbor_dst), jnp.asarray(topo.degree)))
    # vertex 0 neighbors: 1,2,3 -> mean (2/3, 2/3, 0); lap = that - (0,0,0)
    np.testing.assert_allclose(lap[0], [2 / 3, 2 / 3, 0], rtol=1e-5)
    # vertex 1 neighbors: 0,2 -> mean (.5,.5,0) - (1,0,0)
    np.testing.assert_allclose(lap[1], [-0.5, 0.5, 0], rtol=1e-5)


def test_normal_consistency_flat_vs_bent():
    verts, faces, topo = quad_mesh()
    args = (jnp.asarray(faces), jnp.asarray(topo.edge_face_pairs))
    flat = float(mesh_ops.mesh_normal_consistency(jnp.asarray(verts), *args))
    np.testing.assert_allclose(flat, 0.0, atol=1e-6)

    bent = verts.copy()
    bent[3, 2] = 1.0  # fold the second triangle up
    bent_loss = float(mesh_ops.mesh_normal_consistency(jnp.asarray(bent), *args))
    assert bent_loss > 0.1


def test_losses_are_differentiable():
    verts, faces, topo = quad_mesh()
    verts = jnp.asarray(verts) + 0.01  # avoid degenerate zero-norm points

    def total(v):
        return (mesh_ops.mesh_edge_loss(v, jnp.asarray(topo.edges), 0.1)
                + mesh_ops.mesh_laplacian_smoothing(
                    v, jnp.asarray(topo.neighbor_src),
                    jnp.asarray(topo.neighbor_dst), jnp.asarray(topo.degree)) ** 2
                + mesh_ops.mesh_normal_consistency(
                    v, jnp.asarray(faces), jnp.asarray(topo.edge_face_pairs)))

    g = jax.grad(total)(verts)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_edge_loss_finite_difference():
    verts, faces, topo = quad_mesh()
    v = jnp.asarray(verts) * 1.3 + 0.05
    f = lambda vv: mesh_ops.mesh_edge_loss(vv, jnp.asarray(topo.edges), 0.3)
    g = np.asarray(jax.grad(f)(v))
    eps = 1e-3
    for (i, j) in [(0, 0), (2, 1), (3, 2)]:
        vp = v.at[i, j].add(eps)
        vm = v.at[i, j].add(-eps)
        fd = (float(f(vp)) - float(f(vm))) / (2 * eps)
        np.testing.assert_allclose(g[i, j], fd, atol=1e-3)


def test_padded_laplacian_matches_segment(rng):
    """The scatter-free padded-neighbor-table Laplacian must equal the
    segment-sum formulation in both value and gradient."""
    import jax

    from fpc_diffrend_tpu.data import obj as objlib

    n = 7
    ys, xs = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n),
                         indexing="ij")
    verts = np.stack([xs, ys, 0.3 * rng.normal(size=xs.shape)],
                     -1).reshape(-1, 3).astype(np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    topo = objlib.build_topology(np.asarray(faces, np.int32), verts.shape[0])

    v = jnp.asarray(verts)

    def seg(v):
        return mesh_ops.mesh_laplacian_smoothing(
            v, jnp.asarray(topo.neighbor_src), jnp.asarray(topo.neighbor_dst),
            jnp.asarray(topo.degree))

    def pad(v):
        return mesh_ops.mesh_laplacian_smoothing_padded(
            v, jnp.asarray(topo.nbr_idx), jnp.asarray(topo.nbr_mask),
            jnp.asarray(topo.degree))

    np.testing.assert_allclose(np.asarray(pad(v)), np.asarray(seg(v)),
                               rtol=1e-6)
    gs = jax.grad(seg)(v)
    gp = jax.grad(pad)(v)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                               rtol=1e-5, atol=1e-7)

    # the padded-table VJP must contain no scatter in its HLO
    hlo = jax.jit(jax.grad(pad)).lower(v).as_text()
    assert "scatter" not in hlo

"""Mesh regularizer losses as static-shape segment sums (pure JAX).

TPU-native replacements for the PyTorch3D CUDA losses used by the reference
(fit.py:16-19, 579-582): ``mesh_edge_loss``, ``mesh_laplacian_smoothing``
(uniform) and ``mesh_normal_consistency``. The reference rebuilds a
PyTorch3D ``Meshes`` structure every iteration (fit.py:578); here all
adjacency is precomputed once (data/obj.py:build_topology) so each loss is a
fixed-shape gather + segment-sum that XLA fuses into the training step.

Semantics follow PyTorch3D's definitions (means over edges / vertices /
adjacent-face pairs) so the loss weights from the reference configs
(main.py:37-40) transfer directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def edge_lengths(verts3: Array, edges: Array) -> Array:
    """(E,) edge lengths for (V, 3) verts and (E, 2) edge indices.

    Epsilon inside the sqrt: zero-length edges (duplicated vertices, e.g.
    closed-mesh pole caps) must not produce NaN gradients.
    """
    d = verts3[edges[:, 0]] - verts3[edges[:, 1]]
    return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)


def mesh_edge_loss(verts3: Array, edges: Array, target_length: float = 0.0) -> Array:
    """Mean squared deviation of edge lengths from a target.

    PyTorch3D ``mesh_edge_loss`` semantics (reference use: fit.py:580 with
    target 0.1): mean over edges of (||e|| - target)^2.
    """
    l = edge_lengths(verts3, edges)
    return jnp.mean((l - target_length) ** 2)


def uniform_laplacian(verts3: Array, neighbor_src: Array, neighbor_dst: Array,
                      degree: Array) -> Array:
    """Uniform Laplacian: (mean of neighbors) - vertex, shape (V, 3).

    Replaces PyTorch3D's sparse-matrix uniform Laplacian; ``neighbor_*`` are
    the precomputed directed edge lists (data/obj.py:MeshTopology).
    """
    n_vertices = verts3.shape[0]
    sums = jax.ops.segment_sum(verts3[neighbor_dst], neighbor_src,
                               num_segments=n_vertices)
    deg = jnp.maximum(degree, 1.0)[:, None]
    return sums / deg - verts3


@jax.custom_vjp
def neighbor_sum(verts3: Array, nbr_idx: Array, nbr_mask: Array) -> Array:
    """Sum of each vertex's neighbors' values, scatter-free both ways.

    ``nbr_idx``/``nbr_mask`` are the padded (V, max_degree) neighbor table
    (data/obj.py:build_topology). The undirected adjacency matrix is
    symmetric, so this operation is self-adjoint: its VJP is the SAME
    padded-gather sum applied to the cotangent. XLA autodiff of a
    segment_sum formulation instead emits an image-of-the-mesh-sized
    scatter-add (~450M floats/s on TPU); this keeps both directions on
    the gather path.
    """
    return jnp.sum(jnp.where(nbr_mask[..., None], verts3[nbr_idx], 0.0),
                   axis=1)


def _neighbor_sum_fwd(verts3, nbr_idx, nbr_mask):
    return neighbor_sum(verts3, nbr_idx, nbr_mask), (nbr_idx, nbr_mask)


def _neighbor_sum_bwd(res, g):
    nbr_idx, nbr_mask = res
    gv = jnp.sum(jnp.where(nbr_mask[..., None], g[nbr_idx], 0.0), axis=1)
    return gv, None, None


neighbor_sum.defvjp(_neighbor_sum_fwd, _neighbor_sum_bwd)


def uniform_laplacian_padded(verts3: Array, nbr_idx: Array, nbr_mask: Array,
                             degree: Array) -> Array:
    """:func:`uniform_laplacian` on the padded neighbor table (same
    values, no scatters in forward or backward)."""
    deg = jnp.maximum(degree, 1.0)[:, None]
    return neighbor_sum(verts3, nbr_idx, nbr_mask) / deg - verts3


def mesh_laplacian_smoothing_padded(verts3: Array, nbr_idx: Array,
                                    nbr_mask: Array, degree: Array) -> Array:
    """:func:`mesh_laplacian_smoothing` via the padded neighbor table."""
    lap = uniform_laplacian_padded(verts3, nbr_idx, nbr_mask, degree)
    return jnp.mean(jnp.sqrt(jnp.sum(lap * lap, axis=-1) + 1e-12))


def mesh_laplacian_smoothing(verts3: Array, neighbor_src: Array,
                             neighbor_dst: Array, degree: Array) -> Array:
    """Mean over vertices of the L2 norm of the uniform Laplacian.

    PyTorch3D ``mesh_laplacian_smoothing(method='uniform')`` semantics
    (reference use: fit.py:581, squared and weighted in the loss).
    """
    lap = uniform_laplacian(verts3, neighbor_src, neighbor_dst, degree)
    # sqrt is non-differentiable at 0 (flat regions); add tiny eps like
    # pytorch3d's norm backward clamp.
    return jnp.mean(jnp.sqrt(jnp.sum(lap * lap, axis=-1) + 1e-12))


def face_normals(verts3: Array, faces: Array, normalized: bool = True) -> Array:
    """(T, 3) face normals via the winding cross product."""
    v0 = verts3[faces[:, 0]]
    v1 = verts3[faces[:, 1]]
    v2 = verts3[faces[:, 2]]
    n = jnp.cross(v1 - v0, v2 - v0)
    if normalized:
        n = n / jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    return n


def mesh_normal_consistency(verts3: Array, faces: Array,
                            edge_face_pairs: Array) -> Array:
    """Mean over adjacent-face pairs of 1 - cos(n_a, n_b).

    PyTorch3D ``mesh_normal_consistency`` semantics for consistently wound
    meshes (reference use: fit.py:582): penalizes dihedral angles across
    every manifold interior edge (pairs precomputed in
    data/obj.py:build_topology).
    """
    n = face_normals(verts3, faces, normalized=False)
    na = n[edge_face_pairs[:, 0]]
    nb = n[edge_face_pairs[:, 1]]
    # epsilon inside each sqrt: degenerate faces (zero-area pole caps)
    # must not produce NaN gradients through the norm at zero
    norm_a = jnp.sqrt(jnp.sum(na * na, axis=-1) + 1e-12)
    norm_b = jnp.sqrt(jnp.sum(nb * nb, axis=-1) + 1e-12)
    cos = jnp.sum(na * nb, axis=-1) / (norm_a * norm_b)
    return jnp.mean(1.0 - cos)

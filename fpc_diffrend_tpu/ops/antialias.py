"""Analytic silhouette-edge antialiasing (nvdiffrast ``dr.antialias``).

Replaces the CUDA antialias kernel used at reference fit.py:160 — the op
that creates the *only* gradient path from pixel coverage to vertex
positions at silhouettes. The algorithm follows nvdiffrast's formulation
(Laine et al. 2020, "Modular Primitives for High-Performance Differentiable
Rendering", §3.4):

For every horizontally / vertically adjacent pixel pair whose triangle ids
differ, find the edge of the closer ("occluder") triangle that crosses the
segment between the two pixel centers. If that edge is not shared with the
other pixel's triangle (i.e. it is a visual discontinuity, checked against
precomputed ``face_neighbors`` — the role of nvdiffrast's topology hash),
compute the crossing position xi in [0, 1] along the segment and blend:

  delta = xi - 0.5
  delta > 0:  pixel q gets  delta * (c_p - c_q)
  delta < 0:  pixel p gets -delta * (c_q - c_p)

xi is a differentiable function of the occluder's clip-space vertices, so
autodiff yields the analytic coverage gradient; all discrete decisions
(pair mask, occluder choice, edge choice) are fixed booleans.

Everything is (H, W)-shaped vectorized arithmetic + gathers — no scatter,
no data-dependent shapes — so XLA fuses it into the surrounding pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fpc_diffrend_tpu.ops.rasterize import screen_vertices, _edge_fn

Array = jnp.ndarray


def _pair_blend(color_a, color_b, rast_a, rast_b, centers_a, centers_b,
                tri_screen, face_neighbors):
    """Compute blend deltas for one set of adjacent pixel pairs.

    All inputs are aligned arrays over the pair grid (shape (..., )):
      color_a/b   (..., C) colors of the two pixels
      rast_a/b    (..., 4) rasterizer outputs
      centers_a/b (..., 2) pixel center coordinates
      tri_screen  (T, 3, 2) screen-space triangle vertices (differentiable)
      face_neighbors (T, 3) neighbor face per edge slot
    Returns (delta_a, delta_b): color deltas to add to each side.
    """
    id_a = rast_a[..., 3].astype(jnp.int32) - 1   # -1 = background
    id_b = rast_b[..., 3].astype(jnp.int32) - 1
    differs = id_a != id_b

    # Depth with background pushed to +inf so any triangle occludes it.
    z_a = jnp.where(id_a >= 0, rast_a[..., 2], jnp.inf)
    z_b = jnp.where(id_b >= 0, rast_b[..., 2], jnp.inf)
    a_is_occluder = z_a <= z_b
    occ_id = jnp.where(a_is_occluder, id_a, id_b)
    other_id = jnp.where(a_is_occluder, id_b, id_a)
    valid = differs & (occ_id >= 0)
    occ_safe = jnp.maximum(occ_id, 0)

    tv = tri_screen[occ_safe]                      # (..., 3, 2)
    neigh = face_neighbors[occ_safe]               # (..., 3)

    pax, pay = centers_a[..., 0], centers_a[..., 1]
    pbx, pby = centers_b[..., 0], centers_b[..., 1]

    best_xi = jnp.zeros(z_a.shape, jnp.float32)
    best_score = jnp.full(z_a.shape, jnp.inf)
    found = jnp.zeros(z_a.shape, bool)
    for j in range(3):
        va = tv[..., j, :]
        vb = tv[..., (j + 1) % 3, :]
        f_a = _edge_fn(va[..., 0], va[..., 1], vb[..., 0], vb[..., 1], pax, pay)
        f_b = _edge_fn(va[..., 0], va[..., 1], vb[..., 0], vb[..., 1], pbx, pby)
        crossing = (f_a * f_b) < 0.0
        # Edge is shared (continuous surface) only if its neighbor face
        # exists and is the other pixel's triangle; everything else —
        # boundary edges, background on the other side — is a silhouette.
        shared = (neigh[..., j] >= 0) & (neigh[..., j] == other_id)
        silhouette = ~shared
        ok = crossing & silhouette
        denom = f_a - f_b
        xi = f_a / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
        score = jnp.abs(xi - 0.5)
        better = ok & (score < best_score)
        best_xi = jnp.where(better, xi, best_xi)
        best_score = jnp.where(better, score, best_score)
        found = found | ok

    valid = valid & found
    delta = jnp.clip(best_xi - 0.5, -0.5, 0.5)
    delta = jnp.where(valid, delta, 0.0)[..., None]

    diff = color_a - color_b
    delta_b = jnp.where(delta > 0, delta * diff, 0.0)
    delta_a = jnp.where(delta < 0, -delta * (-diff), 0.0)
    return delta_a, delta_b


def _pair_blend_planes(color_a, color_b, rast_a, rast_b, verts_a, verts_b,
                       neigh_a, neigh_b, centers_a, centers_b):
    """_pair_blend with the occluder's geometry supplied as per-pixel
    image planes (the fused rasterizer's winner payload) instead of
    per-pair triangle gathers — fully elementwise, TPU-friendly.

    verts_* are (..., 6) = (x0, y0, x1, y1, x2, y2) screen corners of each
    pixel's winning triangle; neigh_* are (..., 3) neighbor-face ids (as
    floats, -1 = open edge).
    """
    id_a = rast_a[..., 3].astype(jnp.int32) - 1   # -1 = background
    id_b = rast_b[..., 3].astype(jnp.int32) - 1
    differs = id_a != id_b

    z_a = jnp.where(id_a >= 0, rast_a[..., 2], jnp.inf)
    z_b = jnp.where(id_b >= 0, rast_b[..., 2], jnp.inf)
    a_is_occluder = z_a <= z_b
    occ_id = jnp.where(a_is_occluder, id_a, id_b)
    other_id = jnp.where(a_is_occluder, id_b, id_a).astype(jnp.float32)
    valid = differs & (occ_id >= 0)

    sel = a_is_occluder[..., None]
    tv = jnp.where(sel, verts_a, verts_b)          # (..., 6)
    neigh = jnp.where(sel, neigh_a, neigh_b)       # (..., 3)

    pax, pay = centers_a[..., 0], centers_a[..., 1]
    pbx, pby = centers_b[..., 0], centers_b[..., 1]

    best_xi = jnp.zeros(z_a.shape, jnp.float32)
    best_score = jnp.full(z_a.shape, jnp.inf)
    found = jnp.zeros(z_a.shape, bool)
    for j in range(3):
        k = (j + 1) % 3
        vax, vay = tv[..., 2 * j], tv[..., 2 * j + 1]
        vbx, vby = tv[..., 2 * k], tv[..., 2 * k + 1]
        f_a = _edge_fn(vax, vay, vbx, vby, pax, pay)
        f_b = _edge_fn(vax, vay, vbx, vby, pbx, pby)
        crossing = (f_a * f_b) < 0.0
        shared = (neigh[..., j] >= 0.0) & (neigh[..., j] == other_id)
        silhouette = ~shared
        ok = crossing & silhouette
        denom = f_a - f_b
        xi = f_a / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
        score = jnp.abs(xi - 0.5)
        better = ok & (score < best_score)
        best_xi = jnp.where(better, xi, best_xi)
        best_score = jnp.where(better, score, best_score)
        found = found | ok

    valid = valid & found
    delta = jnp.clip(best_xi - 0.5, -0.5, 0.5)
    delta = jnp.where(valid, delta, 0.0)[..., None]

    diff = color_a - color_b
    delta_b = jnp.where(delta > 0, delta * diff, 0.0)
    delta_a = jnp.where(delta < 0, -delta * (-diff), 0.0)
    return delta_a, delta_b


def antialias_fused(color: Array, rast: Array, verts_img: Array,
                    neigh_img: Array) -> Array:
    """Antialias from the fused rasterizer's winner payload — elementwise.

    The production TPU path: no triangle gathers, no pair compaction, no
    scatters (pair deltas land via slice-adds); gradients flow to the
    vertex planes (reduced onto triangles by the Pallas gradient kernel)
    and to ``color``. Exact — every adjacent pixel pair is evaluated.

    :param color: (H, W, C) shaded image.
    :param rast: (H, W, 4) rasterizer output.
    :param verts_img: (H, W, 6) winning triangle's screen corners.
    :param neigh_img: (H, W, 3) winning triangle's neighbor-face ids.
    :return: (H, W, C) antialiased image.
    """
    height, width = color.shape[0], color.shape[1]
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    cx = jnp.broadcast_to(xs[None, :], (height, width))
    cy = jnp.broadcast_to(ys[:, None], (height, width))
    centers = jnp.stack([cx, cy], axis=-1)             # (H, W, 2)

    out = color

    # Horizontal pairs: (y, x) vs (y, x+1)
    da, db = _pair_blend_planes(
        color[:, :-1], color[:, 1:], rast[:, :-1], rast[:, 1:],
        verts_img[:, :-1], verts_img[:, 1:],
        neigh_img[:, :-1], neigh_img[:, 1:],
        centers[:, :-1], centers[:, 1:])
    out = out.at[:, :-1].add(da)
    out = out.at[:, 1:].add(db)

    # Vertical pairs: (y, x) vs (y+1, x)
    da, db = _pair_blend_planes(
        color[:-1, :], color[1:, :], rast[:-1, :], rast[1:, :],
        verts_img[:-1, :], verts_img[1:, :],
        neigh_img[:-1, :], neigh_img[1:, :],
        centers[:-1, :], centers[1:, :])
    out = out.at[:-1, :].add(da)
    out = out.at[1:, :].add(db)

    return out


def antialias(color: Array, rast: Array, pos_clip: Array, faces: Array,
              face_neighbors: Array, max_pairs: int | None = None) -> Array:
    """Antialias silhouette edges of a rendered image.

    :param color: (H, W, C) shaded image.
    :param rast: (H, W, 4) rasterizer output for the same view.
    :param pos_clip: (V, 4) clip-space vertices (gradient target).
    :param faces: (T, 3) int32 triangle indices.
    :param face_neighbors: (T, 3) int32 per-edge adjacent face (or -1),
        from data.obj.build_topology.
    :param max_pairs: when set, use the compacted path: gather only the
        pixel pairs whose triangle ids differ (O(silhouette length), far
        fewer than 2*H*W) up to this static cap per direction. Pairs
        beyond the cap are dropped — size it generously (the default
        full-grid path is exact but does per-pair math and, in the
        backward pass, scatter-adds for every pixel).
    :return: (H, W, C) antialiased image.
    """
    height, width = color.shape[0], color.shape[1]
    sv = screen_vertices(pos_clip, width, height)      # (V, 3) differentiable
    tri_screen = sv[faces][:, :, :2]                   # (T, 3, 2)

    if max_pairs is not None:
        return _antialias_compact(color, rast, tri_screen, face_neighbors,
                                  max_pairs)

    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    cx = jnp.broadcast_to(xs[None, :], (height, width))
    cy = jnp.broadcast_to(ys[:, None], (height, width))
    centers = jnp.stack([cx, cy], axis=-1)             # (H, W, 2)

    out = color

    # Horizontal pairs: (y, x) vs (y, x+1)
    da, db = _pair_blend(
        color[:, :-1], color[:, 1:], rast[:, :-1], rast[:, 1:],
        centers[:, :-1], centers[:, 1:], tri_screen, face_neighbors)
    out = out.at[:, :-1].add(da)
    out = out.at[:, 1:].add(db)

    # Vertical pairs: (y, x) vs (y+1, x)
    da, db = _pair_blend(
        color[:-1, :], color[1:, :], rast[:-1, :], rast[1:, :],
        centers[:-1, :], centers[1:, :], tri_screen, face_neighbors)
    out = out.at[:-1, :].add(da)
    out = out.at[1:, :].add(db)

    return out


def _antialias_compact(color, rast, tri_screen, face_neighbors,
                       max_pairs: int):
    """Compacted antialias: per-pair math only at id discontinuities.

    The pair mask is discrete (computed from ids under stop_gradient
    semantics), so compaction does not change gradients — it only skips
    pairs whose delta is structurally zero.
    """
    height, width = color.shape[0], color.shape[1]
    ids = rast[..., 3].astype(jnp.int32)
    out = color

    for direction in ("h", "v"):
        if direction == "h":
            differs = ids[:, :-1] != ids[:, 1:]
            pw = width - 1
            n = height * pw
        else:
            differs = ids[:-1, :] != ids[1:, :]
            pw = width
            n = (height - 1) * width

        # top_k compaction: ~3x faster than jnp.nonzero on TPU. Priorities
        # put true entries in (0, 1] (ascending index order) and false
        # entries below -1, so `v > 0` flags real pairs.
        k = min(max_pairs, n)
        dflat = differs.reshape(-1)
        idxf = jnp.arange(n, dtype=jnp.float32) * (1.0 / n)
        pri = jnp.where(dflat, 1.0 - idxf, -1.0 - idxf)
        v, flat_idx = jax.lax.top_k(pri, k)
        valid = v > 0.0
        safe = jnp.minimum(flat_idx, n - 1)
        ay = safe // pw
        ax = safe % pw
        if direction == "h":
            by, bx = ay, ax + 1
        else:
            by, bx = ay + 1, ax

        ca = color[ay, ax]
        cb = color[by, bx]
        ra = rast[ay, ax]
        rb = rast[by, bx]
        centers_a = jnp.stack([ax.astype(jnp.float32) + 0.5,
                               ay.astype(jnp.float32) + 0.5], axis=-1)
        centers_b = jnp.stack([bx.astype(jnp.float32) + 0.5,
                               by.astype(jnp.float32) + 0.5], axis=-1)
        da, db = _pair_blend(ca, cb, ra, rb, centers_a, centers_b,
                             tri_screen, face_neighbors)
        da = jnp.where(valid[:, None], da, 0.0)
        db = jnp.where(valid[:, None], db, 0.0)
        out = out.at[ay, ax].add(da)
        out = out.at[by, bx].add(db)

    return out

"""Differentiable triangle rasterization (TPU-native).

Replaces nvdiffrast's ``dr.rasterize`` (reference fit.py:151; CUDA/OpenGL
z-buffered rasterizer with an analytic backward kernel) with a design that
exploits how JAX/XLA differentiates:

  1. **Visibility** — the discrete z-buffered "which triangle wins each
     pixel" resolve. Not differentiable and doesn't need to be; computed by
     a Pallas tile kernel on TPU (ops/pallas/rasterize_tpu.py) or a
     chunk-scanned XLA fallback (any backend), both returning an int32
     triangle-id buffer.

  2. **Barycentric recompute** — given the winning ids, the perspective-
     correct barycentrics (u, v), depth and screen-space derivatives are
     recomputed in pure JAX directly from the clip-space vertices. This
     chain is differentiable by construction, so ``jax.grad`` produces
     exactly the analytic position gradients nvdiffrast implements by hand
     in its backward CUDA kernel (holding the discrete ids fixed, which is
     also what nvdiffrast does).

Output layout matches nvdiffrast: ``rast[..., 0:4] = (u, v, z_ndc,
triangle_id + 1)`` with id 0 = background, and ``rast_db[..., 0:4] =
(du/dx, du/dy, dv/dx, dv/dy)`` in pixels. Image row 0 is the *bottom* row
(OpenGL convention), which is why the reference flips images vertically at
the boundaries (fit.py:532, render_result.py:144) — we keep that convention
for parity.

Conventions:
  * pixel (ix, iy) has center (ix + 0.5, iy + 0.5) in screen space
  * screen x = (x_clip / w + 1) / 2 * W;   y = (y_clip / w + 1) / 2 * H
  * both triangle windings are rasterized (nvdiffrast default)
  * triangles with any vertex at w <= eps are discarded (no near-plane
    clipping; the face-capture scenes never straddle the camera plane)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_W_EPS = 1e-9
_AREA_EPS = 1e-12


# ----------------------------------------------------------------------------
# Triangle setup
# ----------------------------------------------------------------------------

def screen_vertices(pos_clip: Array, width: int, height: int) -> Array:
    """Clip-space (V, 4) -> screen-space (V, 3) = (sx, sy, z_ndc).

    Differentiable; guards w with a tiny epsilon (invalid triangles are
    masked out elsewhere).
    """
    w = pos_clip[:, 3:4]
    safe_w = jnp.where(jnp.abs(w) > _W_EPS, w, _W_EPS)
    ndc = pos_clip[:, :3] / safe_w
    sx = (ndc[:, 0] + 1.0) * (0.5 * width)
    sy = (ndc[:, 1] + 1.0) * (0.5 * height)
    return jnp.stack([sx, sy, ndc[:, 2]], axis=1)


def _tri_screen(pos_clip: Array, faces: Array, width: int, height: int):
    """Gather per-triangle screen coords and validity.

    Returns (p (T, 3, 2) screen xy, zndc (T, 3), w (T, 3), valid (T,)).
    """
    sv = screen_vertices(pos_clip, width, height)  # (V, 3)
    w_all = pos_clip[:, 3]
    p = sv[faces][:, :, :2]          # (T, 3, 2)
    zndc = sv[faces][:, :, 2]        # (T, 3)
    w = w_all[faces]                 # (T, 3)
    valid = jnp.all(w > _W_EPS, axis=1)
    return p, zndc, w, valid


def _edge_fn(ax, ay, bx, by, px, py):
    """Signed parallelogram area of (b - a) x (p - a)."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


# ----------------------------------------------------------------------------
# Visibility: XLA fallback (chunk-scanned z-buffer)
# ----------------------------------------------------------------------------

def visibility_scan(pos_clip: Array, faces: Array, height: int, width: int,
                    chunk: int = 8) -> Array:
    """Winning triangle id per pixel via a scanned z-buffered full-image test.

    Exact but brute-force (O(T · H · W)); used as the reference
    implementation for tests and small scenes. The Pallas tile kernel is
    the production path on TPU.

    :return: (H, W) int32; -1 = background, else triangle index.
    """
    T = faces.shape[0]
    pad = (-T) % chunk
    p, zndc, w, valid = _tri_screen(pos_clip, faces, width, height)
    if pad:
        p = jnp.concatenate([p, jnp.zeros((pad, 3, 2), p.dtype)], axis=0)
        zndc = jnp.concatenate([zndc, jnp.zeros((pad, 3), zndc.dtype)], axis=0)
        w = jnp.concatenate([w, jnp.ones((pad, 3), w.dtype)], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)

    px = jnp.arange(width, dtype=jnp.float32) + 0.5
    py = jnp.arange(height, dtype=jnp.float32) + 0.5
    px = px[None, :]                 # (1, W)
    py = py[:, None]                 # (H, 1)

    n_chunks = (T + pad) // chunk
    p = p.reshape(n_chunks, chunk, 3, 2)
    zndc = zndc.reshape(n_chunks, chunk, 3)
    valid = valid.reshape(n_chunks, chunk)
    tri_ids = jnp.arange(T + pad, dtype=jnp.int32).reshape(n_chunks, chunk)
    tri_ids = jnp.where(jnp.arange(T + pad).reshape(n_chunks, chunk) < T,
                        tri_ids, -1)

    init = (jnp.full((height, width), jnp.inf, jnp.float32),
            jnp.full((height, width), -1, jnp.int32))

    def body(carry, xs):
        zbuf, idbuf = carry
        pc, zc, validc, idsc = xs
        for k in range(chunk):
            tri = pc[k]              # (3, 2)
            e0 = _edge_fn(tri[1, 0], tri[1, 1], tri[2, 0], tri[2, 1], px, py)
            e1 = _edge_fn(tri[2, 0], tri[2, 1], tri[0, 0], tri[0, 1], px, py)
            e2 = _edge_fn(tri[0, 0], tri[0, 1], tri[1, 0], tri[1, 1], px, py)
            area = _edge_fn(tri[0, 0], tri[0, 1], tri[1, 0], tri[1, 1],
                            tri[2, 0], tri[2, 1])
            ok = (validc[k] & (jnp.abs(area) > _AREA_EPS) & (idsc[k] >= 0))
            inv_area = jnp.where(jnp.abs(area) > _AREA_EPS,
                         1.0 / jnp.where(jnp.abs(area) > _AREA_EPS,
                                         area, 1.0), 0.0)
            l0 = e0 * inv_area
            l1 = e1 * inv_area
            l2 = e2 * inv_area
            covered = (l0 >= 0) & (l1 >= 0) & (l2 >= 0) & ok
            z = l0 * zc[k, 0] + l1 * zc[k, 1] + l2 * zc[k, 2]
            closer = covered & (z < zbuf)
            zbuf = jnp.where(closer, z, zbuf)
            idbuf = jnp.where(closer, idsc[k], idbuf)
        return (zbuf, idbuf), None

    (zbuf, idbuf), _ = jax.lax.scan(body, init, (p, zndc, valid, tri_ids))
    return idbuf


# ----------------------------------------------------------------------------
# Differentiable barycentric recompute
# ----------------------------------------------------------------------------

def pixel_attributes(pos_clip: Array, faces: Array, idbuf: Array,
                     height: int, width: int,
                     with_db: bool = False):
    """Perspective-correct (u, v, z) per pixel from winning triangle ids.

    Fully differentiable w.r.t. ``pos_clip`` (ids held fixed). This is the
    gradient path equivalent to nvdiffrast's rasterize backward.

    :param idbuf: (H, W) int32 winning triangle index, -1 = background.
    :param with_db: also return (du/dx, du/dy, dv/dx, dv/dy).
    :return: (u, v, z, mask[, db]) with shapes (H, W) and db (H, W, 4).
    """
    ids = jnp.maximum(idbuf, 0)
    mask = idbuf >= 0

    p, zndc, w, _ = _tri_screen(pos_clip, faces, width, height)
    tp = p[ids]                      # (H, W, 3, 2)
    tz = zndc[ids]                   # (H, W, 3)
    tw = w[ids]                      # (H, W, 3)

    px = jnp.broadcast_to(jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5,
                          (height, width))
    py = jnp.broadcast_to(jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5,
                          (height, width))

    ax, ay = tp[..., 0, 0], tp[..., 0, 1]
    bx, by = tp[..., 1, 0], tp[..., 1, 1]
    cx, cy = tp[..., 2, 0], tp[..., 2, 1]

    area = _edge_fn(ax, ay, bx, by, cx, cy)
    inv_area = jnp.where(jnp.abs(area) > _AREA_EPS,
                         1.0 / jnp.where(jnp.abs(area) > _AREA_EPS,
                                         area, 1.0), 0.0)
    l0 = _edge_fn(bx, by, cx, cy, px, py) * inv_area
    l1 = _edge_fn(cx, cy, ax, ay, px, py) * inv_area
    l2 = _edge_fn(ax, ay, bx, by, px, py) * inv_area

    # Perspective correction: weights lambda_i / w_i, renormalized.
    iw = 1.0 / tw                    # (H, W, 3)
    d0 = l0 * iw[..., 0]
    d1 = l1 * iw[..., 1]
    d2 = l2 * iw[..., 2]
    denom = d0 + d1 + d2
    inv_denom = jnp.where(jnp.abs(denom) > _AREA_EPS,
                          1.0 / jnp.where(jnp.abs(denom) > _AREA_EPS,
                                          denom, 1.0), 0.0)
    u = d0 * inv_denom
    v = d1 * inv_denom

    z = l0 * tz[..., 0] + l1 * tz[..., 1] + l2 * tz[..., 2]

    u = jnp.where(mask, u, 0.0)
    v = jnp.where(mask, v, 0.0)
    z = jnp.where(mask, z, 0.0)

    if not with_db:
        return u, v, z, mask

    # Screen-space derivatives of the *perspective-correct* (u, v).
    # lambda_i are affine in (px, py):
    dl0_dx = -(cy - by) * inv_area
    dl0_dy = (cx - bx) * inv_area
    dl1_dx = -(ay - cy) * inv_area
    dl1_dy = (ax - cx) * inv_area
    dl2_dx = -(by - ay) * inv_area
    dl2_dy = (bx - ax) * inv_area

    dd0_dx = dl0_dx * iw[..., 0]
    dd1_dx = dl1_dx * iw[..., 1]
    dd2_dx = dl2_dx * iw[..., 2]
    dd0_dy = dl0_dy * iw[..., 0]
    dd1_dy = dl1_dy * iw[..., 1]
    dd2_dy = dl2_dy * iw[..., 2]
    ddenom_dx = dd0_dx + dd1_dx + dd2_dx
    ddenom_dy = dd0_dy + dd1_dy + dd2_dy

    du_dx = (dd0_dx - u * ddenom_dx) * inv_denom
    du_dy = (dd0_dy - u * ddenom_dy) * inv_denom
    dv_dx = (dd1_dx - v * ddenom_dx) * inv_denom
    dv_dy = (dd1_dy - v * ddenom_dy) * inv_denom

    db = jnp.stack([du_dx, du_dy, dv_dx, dv_dy], axis=-1)
    db = jnp.where(mask[..., None], db, 0.0)
    return u, v, z, mask, db


# ----------------------------------------------------------------------------
# Fused pixel evaluation with a Pallas backward (TPU production grad path)
# ----------------------------------------------------------------------------

def _pixel_db_from_data(data: Array, idbuf: Array, height: int, width: int):
    """(H, W, 4) perspective-correct bary pixel derivatives from records.

    dlambda_i/dx = a_i, dlambda_i/dy = b_i (the edge-plane coefficients),
    so no extra per-pixel geometry is needed. Differentiable through the
    record gather (the gradient path only activates under mip filtering).
    """
    ids = jnp.maximum(idbuf, 0)
    mask = idbuf >= 0
    rec = data[ids]
    px = jnp.broadcast_to(jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5,
                          (height, width))
    py = jnp.broadcast_to(jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5,
                          (height, width))
    l0 = rec[..., 0] * px + rec[..., 1] * py + rec[..., 2]
    l1 = rec[..., 3] * px + rec[..., 4] * py + rec[..., 5]
    l2 = rec[..., 6] * px + rec[..., 7] * py + rec[..., 8]
    w0, w1, w2 = rec[..., 13], rec[..., 14], rec[..., 15]
    iw0 = 1.0 / jnp.where(jnp.abs(w0) > _W_EPS, w0, 1.0)
    iw1 = 1.0 / jnp.where(jnp.abs(w1) > _W_EPS, w1, 1.0)
    iw2 = 1.0 / jnp.where(jnp.abs(w2) > _W_EPS, w2, 1.0)
    d0, d1, d2 = l0 * iw0, l1 * iw1, l2 * iw2
    denom = d0 + d1 + d2
    inv_denom = jnp.where(jnp.abs(denom) > _AREA_EPS,
                          1.0 / jnp.where(jnp.abs(denom) > _AREA_EPS,
                                          denom, 1.0), 0.0)
    u = d0 * inv_denom
    v = d1 * inv_denom
    dd0_dx = rec[..., 0] * iw0
    dd1_dx = rec[..., 3] * iw1
    dd2_dx = rec[..., 6] * iw2
    dd0_dy = rec[..., 1] * iw0
    dd1_dy = rec[..., 4] * iw1
    dd2_dy = rec[..., 7] * iw2
    ddenom_dx = dd0_dx + dd1_dx + dd2_dx
    ddenom_dy = dd0_dy + dd1_dy + dd2_dy
    du_dx = (dd0_dx - u * ddenom_dx) * inv_denom
    du_dy = (dd0_dy - u * ddenom_dy) * inv_denom
    dv_dx = (dd1_dx - v * ddenom_dx) * inv_denom
    dv_dy = (dd1_dy - v * ddenom_dy) * inv_denom
    db = jnp.stack([du_dx, du_dy, dv_dx, dv_dy], axis=-1)
    return jnp.where(mask[..., None], db, 0.0)


def _zero_ct(x):
    import numpy as np

    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def rasterize_fused(data, aux, bins, height: int, width: int,
                    interpret: bool, pair_cap: int | None = None,
                    padded: bool = False):
    """Fully fused rasterization: one Pallas pass yields the winning-id
    buffer and a (N_PAYLOAD, H, W) payload [u v z tu tv x0 y0 x1 y1 x2 y2
    n0 n1 n2] with no per-pixel gathers; the backward is the Pallas
    gradient kernel. ``data`` (T, 16 triangle records) and ``aux``
    (T, 16 aux records from pallas.rasterize_tpu.aux_records) are the
    differentiable inputs; the primal only reads them through the
    (stop-gradient) bins.

    :param padded: return outputs in the kernel's tile-padded (ph, pw)
        layout instead of slicing to (height, width) — the plane-major
        production pipeline stays padded end to end (texture, antialias,
        composite) and slices once at the very end, and the backward then
        receives padded cotangents the gradient kernel consumes directly.
        Pad pixels behave like background (entry/id = -1 except covered
        pad slack, whose cotangents are identically zero)."""
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
        fused_rasterize_from_bins)

    idbuf, payload, _entry, _extra = fused_rasterize_from_bins(
        bins, height, width, interpret, padded=padded)
    return idbuf, payload


def _rasterize_fused_fwd(data, aux, bins, height, width, interpret,
                         pair_cap=None, padded=False):
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
        fused_rasterize_from_bins)

    # Keep the backward's inputs (entry, u, v, extra — 11 image planes) in
    # their PADDED kernel layout: the gradient kernel consumes (ph, pw)
    # planes, and slicing here only to re-pad there costs two full HBM
    # copies per plane at 1600x1200 (pw 1200 -> 1280).
    idbuf_p, payload_p, entry_p, extra_p = fused_rasterize_from_bins(
        bins, height, width, interpret, padded=True)
    if padded:
        idbuf, payload = idbuf_p, payload_p
    else:
        idbuf = idbuf_p[:height, :width]
        payload = payload_p[:, :height, :width]
    res = (entry_p, payload_p[0], payload_p[1], extra_p, bins,
           data.shape[0])
    return (idbuf, payload), res


def _rasterize_fused_bwd(height, width, interpret, pair_cap, padded, res,
                         cts):
    from fpc_diffrend_tpu.ops.pallas.raster_grad_tpu import pixel_grad_pallas

    entry, u, v, extra, bins, n_tris = res
    _gid, gpayload = cts
    grad_data, grad_aux = pixel_grad_pallas(
        bins, entry, u, v, extra, gpayload, n_tris, height, width,
        pair_cap=pair_cap, interpret=interpret)
    return (grad_data, grad_aux, jax.tree.map(_zero_ct, bins))


rasterize_fused.defvjp(_rasterize_fused_fwd, _rasterize_fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def rasterize_texture_fused(data, aux, tex, bins, height: int, width: int,
                            interpret: bool, pair_cap: int | None = None):
    """Fused rasterize + interpolate + bilinear wrap texture in ONE Pallas
    pass (padded plane-major outputs): (idbuf_p, payload_p, colour_planes).

    The forward samples the VMEM-resident texture at the resolved (tu, tv)
    inside the raster kernel's dense phase-B pass — no separate texture
    kernel dispatch, no XLA-side patch-origin prep, no texc HBM roundtrip.
    The backward composes the texture planes backward (colour cotangents
    -> gtex + uv-plane cotangents) with the Pallas gradient kernel."""
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
        fused_rasterize_from_bins)

    idbuf, payload, _entry, _extra, colour = fused_rasterize_from_bins(
        bins, height, width, interpret, padded=True, tex=tex)
    return idbuf, payload, colour


def _rasterize_texture_fused_fwd(data, aux, tex, bins, height, width,
                                 interpret, pair_cap=None):
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
        fused_rasterize_from_bins)

    idbuf, payload, entry, extra, colour = fused_rasterize_from_bins(
        bins, height, width, interpret, padded=True, tex=tex)
    res = (entry, payload[0], payload[1], extra, bins, data.shape[0],
           tex, payload[3], payload[4])
    return (idbuf, payload, colour), res


def _rasterize_texture_fused_bwd(height, width, interpret, pair_cap, res,
                                 cts):
    from fpc_diffrend_tpu.ops.pallas.raster_grad_tpu import pixel_grad_pallas
    from fpc_diffrend_tpu.ops.pallas.texture_tpu import (
        texture_planes_bwd_impl)

    entry, u, v, extra, bins, n_tris, tex, tu, tv = res
    _gid, gpayload, gcolour = cts
    gtex, gtu, gtv = texture_planes_bwd_impl(
        tex, tu, tv, height, width, "wrap", interpret, tuple(gcolour))
    gpayload = gpayload.at[3].add(gtu).at[4].add(gtv)
    grad_data, grad_aux = pixel_grad_pallas(
        bins, entry, u, v, extra, gpayload, n_tris, height, width,
        pair_cap=pair_cap, interpret=interpret)
    return (grad_data, grad_aux, gtex, jax.tree.map(_zero_ct, bins))


rasterize_texture_fused.defvjp(_rasterize_texture_fused_fwd,
                               _rasterize_texture_fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def rasterize_texture_aa_fused(data, aux, tex, bins, height: int,
                               width: int, interpret: bool,
                               pair_cap: int | None = None):
    """Rasterize + interpolate + texture + ANTIALIAS in one Pallas pass.

    Extends :func:`rasterize_texture_fused` with the silhouette antialias
    blend evaluated inside the same kernel (FPC_AA_FUSE): boundary pairs
    ride VMEM carries and two small side outputs, folded back XLA-side —
    the packed-plane build and 3x neighbor reads of the separate AA
    kernel (reference fit.py:160 / Laine et al. §3.4) vanish from the
    forward. Returns (idbuf_p, payload_p, colour_planes (pre-AA),
    aa_planes) — all padded plane-major.

    The backward reuses the separate AA backward kernel on planes
    repacked from the residuals: the pair blend is symmetric in its two
    sides, so the left/top-anchored backward reconstructs exactly the
    gradients of the right/bottom-anchored forward.
    """
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
        fused_rasterize_from_bins)

    idbuf, payload, _entry, _extra, colour, aa = fused_rasterize_from_bins(
        bins, height, width, interpret, padded=True, tex=tex, aa=True)
    return idbuf, payload, colour, aa


def _rasterize_texture_aa_fused_fwd(data, aux, tex, bins, height, width,
                                    interpret, pair_cap=None):
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
        fused_rasterize_from_bins)

    idbuf, payload, entry, extra, colour, aa = fused_rasterize_from_bins(
        bins, height, width, interpret, padded=True, tex=tex, aa=True)
    res = (entry, payload[0], payload[1], extra, bins, data.shape[0],
           tex, payload[3], payload[4], idbuf, payload, colour)
    return (idbuf, payload, colour, aa), res


def _rasterize_texture_aa_fused_bwd(height, width, interpret, pair_cap,
                                    res, cts):
    from fpc_diffrend_tpu.ops.pallas.antialias_tpu import (
        _pack_planes, aa_planes_bwd_from_packed)
    from fpc_diffrend_tpu.ops.pallas.raster_grad_tpu import pixel_grad_pallas
    from fpc_diffrend_tpu.ops.pallas.texture_tpu import (
        texture_planes_bwd_impl)

    (entry, u, v, extra, bins, n_tris, tex, tu, tv, idbuf, payload,
     colour) = res
    _gid, gpayload, gcolour, gaa = cts
    ph, pw = idbuf.shape

    # Antialias backward: the kernel-output cotangent equals the full
    # aa-image cotangent (the XLA side-delta folds are identity adds), so
    # the separate left/top-anchored AA backward over repacked planes
    # yields the exact pair gradients.
    packed = _pack_planes(colour, idbuf, payload)
    gcol_aa, _, gpay_aa = aa_planes_bwd_from_packed(
        packed, jnp.stack(gaa), height, width, len(colour), ph, pw,
        payload.shape[0], interpret)
    gpayload = gpayload + gpay_aa
    gcolour = tuple(gc + ga for gc, ga in zip(gcolour, gcol_aa))

    gtex, gtu, gtv = texture_planes_bwd_impl(
        tex, tu, tv, height, width, "wrap", interpret, gcolour)
    gpayload = gpayload.at[3].add(gtu).at[4].add(gtv)
    grad_data, grad_aux = pixel_grad_pallas(
        bins, entry, u, v, extra, gpayload, n_tris, height, width,
        pair_cap=pair_cap, interpret=interpret)
    return (grad_data, grad_aux, gtex, jax.tree.map(_zero_ct, bins))


rasterize_texture_aa_fused.defvjp(_rasterize_texture_aa_fused_fwd,
                                  _rasterize_texture_aa_fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def rasterize_texture_sepaa(data, aux, tex, bins, height: int, width: int,
                            interpret: bool, pair_cap: int | None = None):
    """Rasterize+texture kernel followed by the SEPARATE antialias kernel,
    under ONE custom VJP (FPC_AA_COMBINED).

    Functionally identical to rasterize_texture_fused +
    antialias_planes_pallas (the round-3 default pipeline), but the
    payload and pre-AA colour planes never cross a custom-VJP boundary:
    the backward feeds the AA kernel's corner cotangents and the texture
    backward's uv cotangents straight into one 11-plane stack for the
    gradient kernel — the (N_PAYLOAD, ph, pw) zeros+set gpayload, its
    at[].add copies and the [:N_GPL] slice (the ~8 ms 'AA interface
    glue' in the round-4b device trace) disappear from the graph.

    :return: (idbuf_p (ph, pw) i32, aa (C, ph, pw) antialiased planes,
              pre-background-composite).
    """
    from fpc_diffrend_tpu.ops.pallas.antialias_tpu import (
        _aa_fwd_from_packed, _pack_planes)
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
        fused_rasterize_from_bins)

    idbuf, payload, _entry, _extra, colour = fused_rasterize_from_bins(
        bins, height, width, interpret, padded=True, tex=tex)
    ph, pw = idbuf.shape
    packed = _pack_planes(colour, idbuf, payload)
    aa = _aa_fwd_from_packed(packed, len(colour), height, width,
                             interpret)[:, :ph, :pw]
    return idbuf, aa


def _rasterize_texture_sepaa_fwd(data, aux, tex, bins, height, width,
                                 interpret, pair_cap=None):
    from fpc_diffrend_tpu.ops.pallas.antialias_tpu import (
        _aa_fwd_from_packed, _pack_planes)
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
        fused_rasterize_from_bins)

    idbuf, payload, entry, extra, colour = fused_rasterize_from_bins(
        bins, height, width, interpret, padded=True, tex=tex)
    ph, pw = idbuf.shape
    packed = _pack_planes(colour, idbuf, payload)
    aa = _aa_fwd_from_packed(packed, len(colour), height, width,
                             interpret)[:, :ph, :pw]
    res = (entry, payload[0], payload[1], extra, bins, data.shape[0],
           tex, payload[3], payload[4], packed)
    return (idbuf, aa), res


def _rasterize_texture_sepaa_bwd(height, width, interpret, pair_cap, res,
                                 cts):
    from fpc_diffrend_tpu.ops.pallas.antialias_tpu import aa_planes_bwd_core
    from fpc_diffrend_tpu.ops.pallas.raster_grad_tpu import pixel_grad_pallas
    from fpc_diffrend_tpu.ops.pallas.texture_tpu import (
        texture_planes_bwd_impl)

    entry, u, v, extra, bins, n_tris, tex, tu, tv, packed = res
    _gid, gaa = cts
    ph, pw = entry.shape
    C = packed.shape[0] - 11

    gcolour, gverts = aa_planes_bwd_core(packed, gaa, height, width, C,
                                         ph, pw, interpret)
    gtex, gtu, gtv = texture_planes_bwd_impl(
        tex, tu, tv, height, width, "wrap", interpret, gcolour)
    # the gradient kernel's 11 cotangent planes in payload order
    # [gu gv gz gtu gtv g(x0..y2)]: u/v/z get no cotangent (payload
    # never escapes this op; AA differentiates only corners + colour)
    gpl = jnp.concatenate([jnp.zeros((3, ph, pw), jnp.float32),
                           gtu[None], gtv[None], gverts])
    grad_data, grad_aux = pixel_grad_pallas(
        bins, entry, u, v, extra, gpl, n_tris, height, width,
        pair_cap=pair_cap, interpret=interpret)
    return (grad_data, grad_aux, gtex, jax.tree.map(_zero_ct, bins))


rasterize_texture_sepaa.defvjp(_rasterize_texture_sepaa_fwd,
                               _rasterize_texture_sepaa_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def rasterize_texture_sepaa_stacked(data_s, aux_s, tex, bins,
                                    sample_ph: int, height: int, width: int,
                                    interpret: bool,
                                    pair_cap: int | None = None):
    """Stacked-batch rasterize+texture + separate AA under ONE custom VJP
    (FPC_BATCH=stack): the B samples render as one (B*sample_ph, pw)
    vertically stacked image through a single pass of each kernel —
    no vmap, so no per-sample while loops or dynamic-slice glue
    (round-4b trace item 3d; see rasterize_tpu.bin_scene_stacked).

    :param data_s / aux_s: (B, T, 16) SHIFTED stacked records from
        bin_scene_stacked (differentiable; the y-shift's chain rule back
        to local records is applied by autodiff upstream).
    :param sample_ph: per-sample padded row pitch (pad_resolution height).
    :param height / width: per-sample REAL resolution.
    :return: (idbuf (B*sample_ph, pw) i32, aa (C, B*sample_ph, pw)
              antialiased planes, pre-background-composite).
    """
    out, _res = _rasterize_texture_sepaa_stacked_fwd(
        data_s, aux_s, tex, bins, sample_ph, height, width, interpret,
        pair_cap)
    return out


def _rasterize_texture_sepaa_stacked_fwd(data_s, aux_s, tex, bins,
                                         sample_ph, height, width,
                                         interpret, pair_cap=None):
    from fpc_diffrend_tpu.ops.pallas.antialias_tpu import (
        _aa_fwd_from_packed, _pack_planes)
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
        fused_rasterize_from_bins)

    B = data_s.shape[0]
    stacked_h = B * sample_ph
    idbuf, payload, entry, extra, colour = fused_rasterize_from_bins(
        bins, stacked_h, width, interpret, padded=True, tex=tex)
    ph, pw = idbuf.shape
    packed = _pack_planes(colour, idbuf, payload)
    aa = _aa_fwd_from_packed(packed, len(colour), height, width,
                             interpret, sample_ph=sample_ph)[:, :ph, :pw]
    res = (entry, payload[0], payload[1], extra, bins,
           data_s.shape[0] * data_s.shape[1],
           tex, payload[3], payload[4], packed)
    return (idbuf, aa), res


def _rasterize_texture_sepaa_stacked_bwd(sample_ph, height, width,
                                         interpret, pair_cap, res, cts):
    from fpc_diffrend_tpu.ops.pallas.antialias_tpu import aa_planes_bwd_core
    from fpc_diffrend_tpu.ops.pallas.raster_grad_tpu import pixel_grad_pallas
    from fpc_diffrend_tpu.ops.pallas.texture_tpu import (
        texture_planes_bwd_impl)

    entry, u, v, extra, bins, n_tris, tex, tu, tv, packed = res
    _gid, gaa = cts
    ph, pw = entry.shape
    B = ph // sample_ph
    T = n_tris // B
    C = packed.shape[0] - 11

    gcolour, gverts = aa_planes_bwd_core(packed, gaa, height, width, C,
                                         ph, pw, interpret,
                                         sample_ph=sample_ph)
    gtex, gtu, gtv = texture_planes_bwd_impl(
        tex, tu, tv, ph, width, "wrap", interpret, gcolour)
    gpl = jnp.concatenate([jnp.zeros((3, ph, pw), jnp.float32),
                           gtu[None], gtv[None], gverts])
    cap = None if pair_cap is None else B * pair_cap
    grad_data, grad_aux = pixel_grad_pallas(
        bins, entry, u, v, extra, gpl, n_tris, ph, width,
        pair_cap=cap, interpret=interpret, stacked=True)
    return (grad_data.reshape(B, T, 16), grad_aux.reshape(B, T, 16),
            gtex, jax.tree.map(_zero_ct, bins))


rasterize_texture_sepaa_stacked.defvjp(_rasterize_texture_sepaa_stacked_fwd,
                                       _rasterize_texture_sepaa_stacked_bwd)


def rasterize_pallas_textured_sepaa_stacked(pos_clip_b: Array, faces: Array,
                                            uv, uv_idx, tex, face_neighbors,
                                            resolution,
                                            pair_cap: int | None = None,
                                            interpret: bool = False,
                                            inc=(None, None)):
    """Stacked-batch binning + fused render (the FPC_BATCH=stack entry).

    :param pos_clip_b: (B, V, 4) clip positions per (camera, frame) sample.
    :return: (idbuf (B*ph, pw) i32, aa (C, B*ph, pw) antialiased planes).
    """
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
        aux_records, bin_scene_stacked, pad_resolution)

    height, width = resolution
    faces = faces.astype(jnp.int32)
    vtx_inc, uv_inc = inc
    aux_b = jax.vmap(lambda pc: aux_records(
        uv, uv_idx.astype(jnp.int32), pc, faces, face_neighbors, height,
        width, vtx_inc=vtx_inc, uv_inc=uv_inc))(pos_clip_b)
    data_s, aux_s, bins = bin_scene_stacked(pos_clip_b, faces, height,
                                            width, aux_b,
                                            entry_cap=pair_cap,
                                            vtx_inc=vtx_inc)
    bins_sg = jax.tree.map(jax.lax.stop_gradient, bins)
    ph, _pw = pad_resolution(height, width)
    return rasterize_texture_sepaa_stacked(data_s, aux_s, tex, bins_sg,
                                           ph, height, width, interpret,
                                           pair_cap)


def _rasterize_pallas_textured_sepaa(pos_clip: Array, faces: Array, uv,
                                     uv_idx, tex, face_neighbors,
                                     resolution,
                                     pair_cap: int | None = None,
                                     interpret: bool = False,
                                     inc=(None, None)):
    """Binning + rasterize+texture kernel + separate AA kernel under one
    custom VJP (FPC_AA_COMBINED pipeline entry).

    :return: (idbuf_p (ph, pw) i32, aa (C, ph, pw) antialiased planes).
    """
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
        aux_records, bin_scene)

    height, width = resolution
    faces = faces.astype(jnp.int32)
    vtx_inc, uv_inc = inc
    aux = aux_records(uv, uv_idx.astype(jnp.int32), pos_clip, faces,
                      face_neighbors, height, width, vtx_inc=vtx_inc,
                      uv_inc=uv_inc)
    data, bins = bin_scene(pos_clip, faces, height, width,
                           aux=jax.lax.stop_gradient(aux),
                           entry_cap=pair_cap, vtx_inc=vtx_inc)
    bins_sg = jax.tree.map(jax.lax.stop_gradient, bins)
    return rasterize_texture_sepaa(data, aux, tex, bins_sg, height, width,
                                   interpret, pair_cap)


def _rasterize_pallas_textured(pos_clip: Array, faces: Array, uv, uv_idx,
                               tex, face_neighbors, resolution,
                               pair_cap: int | None = None,
                               interpret: bool = False,
                               inc=(None, None)):
    """Binning + the fully fused rasterize+texture pass (padded layout).

    :return: (idbuf_p (ph, pw) i32, payload_p (N_PAYLOAD, ph, pw),
              colour_planes tuple of C (ph, pw))
    """
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
        aux_records, bin_scene)

    height, width = resolution
    faces = faces.astype(jnp.int32)
    vtx_inc, uv_inc = inc
    aux = aux_records(uv, uv_idx.astype(jnp.int32), pos_clip, faces,
                      face_neighbors, height, width, vtx_inc=vtx_inc,
                      uv_inc=uv_inc)
    data, bins = bin_scene(pos_clip, faces, height, width,
                           aux=jax.lax.stop_gradient(aux),
                           entry_cap=pair_cap, vtx_inc=vtx_inc)
    bins_sg = jax.tree.map(jax.lax.stop_gradient, bins)
    return rasterize_texture_fused(data, aux, tex, bins_sg, height, width,
                                   interpret, pair_cap)


def _rasterize_pallas_textured_aa(pos_clip: Array, faces: Array, uv, uv_idx,
                                  tex, face_neighbors, resolution,
                                  pair_cap: int | None = None,
                                  interpret: bool = False,
                                  inc=(None, None)):
    """Binning + the fused rasterize+texture+antialias pass (FPC_AA_FUSE).

    :return: (idbuf_p (ph, pw) i32, aa_planes tuple of C (ph, pw) —
              antialiased, pre-background-composite)
    """
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
        aux_records, bin_scene)

    height, width = resolution
    faces = faces.astype(jnp.int32)
    vtx_inc, uv_inc = inc
    aux = aux_records(uv, uv_idx.astype(jnp.int32), pos_clip, faces,
                      face_neighbors, height, width, vtx_inc=vtx_inc,
                      uv_inc=uv_inc)
    data, bins = bin_scene(pos_clip, faces, height, width,
                           aux=jax.lax.stop_gradient(aux),
                           entry_cap=pair_cap, vtx_inc=vtx_inc)
    bins_sg = jax.tree.map(jax.lax.stop_gradient, bins)
    idbuf, _payload, _colour, aa = rasterize_texture_aa_fused(
        data, aux, tex, bins_sg, height, width, interpret, pair_cap)
    return idbuf, aa


def _rasterize_pallas_padded(pos_clip: Array, faces: Array, uv, uv_idx,
                             face_neighbors, resolution,
                             pair_cap: int | None = None,
                             interpret: bool = False,
                             inc=(None, None)):
    """Fused rasterize for the padded plane-major pipeline.

    :return: (idbuf_p (ph, pw) i32, payload_p (N_PAYLOAD, ph, pw)) in the
        kernel's tile-padded layout (see rasterize_fused ``padded``).
    """
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
        aux_records, bin_scene)

    height, width = resolution
    faces = faces.astype(jnp.int32)
    vtx_inc, uv_inc = inc
    aux = aux_records(uv, uv_idx.astype(jnp.int32), pos_clip, faces,
                      face_neighbors, height, width, vtx_inc=vtx_inc,
                      uv_inc=uv_inc)
    data, bins = bin_scene(pos_clip, faces, height, width,
                           aux=jax.lax.stop_gradient(aux),
                           entry_cap=pair_cap, vtx_inc=vtx_inc)
    bins_sg = jax.tree.map(jax.lax.stop_gradient, bins)
    return rasterize_fused(data, aux, bins_sg, height, width, interpret,
                           pair_cap, True)


# ----------------------------------------------------------------------------
# Public API
# ----------------------------------------------------------------------------

def _rasterize_pallas_full(pos_clip: Array, faces: Array, uv, uv_idx,
                           face_neighbors, resolution, interpret: bool,
                           pair_cap: int | None = None):
    """Fused Pallas rasterize + interpolate + antialias-input planes.

    :return: (rast (H, W, 4), texc (H, W, 2), verts_img (H, W, 6),
              neigh_img (H, W, 3), data (T, 16), idbuf,
              payload (N_PAYLOAD, H, W))

    ``payload`` carries the same winner planes plane-major (the layout the
    Pallas antialias kernel consumes); verts_img/neigh_img are its
    channel-last views and fold away unused.
    """
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
        aux_records, bin_scene)

    height, width = resolution
    faces = faces.astype(jnp.int32)
    if uv is None:
        uv = jnp.zeros((1, 2), jnp.float32)
        uv_idx = jnp.zeros_like(faces)
    aux = aux_records(uv, uv_idx.astype(jnp.int32), pos_clip, faces,
                      face_neighbors, height, width)
    # pair_cap doubles as the bin-entry capacity: valid entries are a
    # sorted prefix, so capping here shrinks the record gather, the
    # gradient-kernel output and the segment fold together.
    data, bins = bin_scene(pos_clip, faces, height, width,
                           aux=jax.lax.stop_gradient(aux),
                           entry_cap=pair_cap)
    bins_sg = jax.tree.map(jax.lax.stop_gradient, bins)
    idbuf, payload = rasterize_fused(data, aux, bins_sg, height, width,
                                     interpret, pair_cap)
    mask = idbuf >= 0
    u, v, z = payload[0], payload[1], payload[2]
    idf = jnp.where(mask, (idbuf + 1).astype(jnp.float32), 0.0)
    rast = jnp.stack([u, v, z, idf], axis=-1)
    texc = jnp.stack([payload[3], payload[4]], axis=-1)
    verts_img = jnp.moveaxis(payload[5:11], 0, -1)
    neigh_img = jax.lax.stop_gradient(jnp.moveaxis(payload[11:14], 0, -1))
    return rast, texc, verts_img, neigh_img, data, idbuf, payload


@functools.partial(jax.jit, static_argnames=("resolution", "impl", "with_db",
                                             "interpret"))
def rasterize(pos_clip: Array, faces: Array, resolution: Tuple[int, int],
              impl: str = "auto", with_db: bool = True,
              interpret: bool = False):
    """Rasterize clip-space triangles; nvdiffrast-compatible output.

    :param pos_clip: (V, 4) float32 clip-space vertex positions.
    :param faces: (T, 3) int32 triangle vertex indices.
    :param resolution: (height, width).
    :param impl: visibility/gradient implementation:
        "pallas" — Pallas visibility kernel + Pallas gradient kernel
                   (production TPU path: pixel->triangle reductions happen
                   in-tile, no image-sized scatters in the backward);
        "scan"   — XLA reference path (any backend, autodiff gradients);
        "auto"   — pallas on TPU else scan.
    :param with_db: also return the (H, W, 4) bary-derivative image.
    :param interpret: run Pallas kernels in interpreter mode (testing).
    :return: rast (H, W, 4) = (u, v, z_ndc, tri_id + 1); optionally
             rast_db (H, W, 4) = (du/dx, du/dy, dv/dx, dv/dy).
    """
    height, width = resolution
    faces = faces.astype(jnp.int32)

    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "scan"

    if impl == "pallas":
        rast, _texc, _verts, _neigh, data, idbuf, _pay = _rasterize_pallas_full(
            pos_clip, faces, None, None, None, resolution, interpret)
        db = (_pixel_db_from_data(data, idbuf, height, width)
              if with_db else None)
        if with_db:
            return rast, db
        return rast
    elif impl == "scan":
        idbuf = visibility_scan(jax.lax.stop_gradient(pos_clip), faces,
                                height, width)
        if with_db:
            u, v, z, mask, db = pixel_attributes(pos_clip, faces, idbuf,
                                                 height, width, with_db=True)
        else:
            u, v, z, mask = pixel_attributes(pos_clip, faces, idbuf,
                                             height, width, with_db=False)
            db = None
    else:
        raise ValueError(f"unknown rasterize impl {impl!r}")

    idf = jnp.where(mask, (idbuf + 1).astype(jnp.float32), 0.0)
    rast = jnp.stack([u, v, z, idf], axis=-1)
    if with_db:
        return rast, db
    return rast


@functools.partial(jax.jit, static_argnames=("resolution", "impl",
                                             "interpret"))
def rasterize_with_uv(pos_clip: Array, faces: Array, uv: Array,
                      uv_idx: Array, resolution: Tuple[int, int],
                      impl: str = "auto", interpret: bool = False):
    """Rasterize + interpolate uv coordinates in one fused pass.

    The production path of the render pipeline: on the Pallas
    implementation the winning triangle's perspective-correct uv is
    resolved inside the visibility kernel (no per-pixel gathers in either
    direction); on the scan fallback it composes rasterize + interpolate.

    :return: (rast (H, W, 4), texc (H, W, 2))
    """
    height, width = resolution
    faces = faces.astype(jnp.int32)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "scan"

    if impl == "pallas":
        rast, texc, _verts, _neigh, _data, _idbuf, _pay = _rasterize_pallas_full(
            pos_clip, faces, uv, uv_idx, None, resolution, interpret)
        return rast, texc

    from fpc_diffrend_tpu.ops.interpolate import interpolate

    rast = rasterize(pos_clip, faces, resolution, impl=impl, with_db=False,
                     interpret=interpret)
    texc, _ = interpolate(uv, rast, uv_idx.astype(jnp.int32))
    return rast, texc

"""Pallas TPU visibility kernel: tile-binned z-buffered rasterization.

The production visibility path for ops/rasterize.py — the TPU-native
equivalent of nvdiffrast's CUDA rasterizer (reference fit.py:151), built
for the TPU execution model instead of a GPU pixel pipeline:

  * The image is divided into 8x128-pixel tiles — exactly one VPU register
    (8 sublanes x 128 lanes) — so each tile's z-buffer and id-buffer live
    in registers and every per-triangle op uses full lanes with no
    relayout at the output write.
  * Triangle setup runs in XLA: per-triangle normalized edge-plane
    coefficients (lambda_i = a_i x + b_i y + c_i) and a screen-space depth
    plane (z = zx x + zy y + zc), packed into 16-float records.
  * Binning runs in XLA: each triangle emits (tile, tri) pairs for a
    WINDOW_Y x WINDOW_X tile window anchored at its bbox (64px tall x
    256px wide in pixels); one int32 sort groups pairs by tile and
    searchsorted yields per-tile [start, end) ranges. Triangles too large
    for the window go to a small global list processed by every tile
    (close-up triangles are rare in the face-capture workload).
  * The kernel scalar-prefetches the bin offsets, streams its bin from HBM
    in fixed-size chunks via async DMA, and resolves coverage + depth with
    a few fused VPU ops per triangle.

Coverage rule matches ops/rasterize.py:visibility_scan: inside = all
normalized barycentrics >= 0 (both windings), depth = screen-linear ndc z,
z-range culled to [-1, 1], nearest-z wins.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

TILE_H = 8                # tile height in pixels (VPU sublanes)
TILE_W = 128              # tile width in pixels (VPU lanes)
WINDOW_Y = 4              # binning window in tiles (32 px tall)
WINDOW_X = 2              # binning window in tiles (256 px wide)
CHUNK = 128               # triangles DMA'd per bin chunk
MAX_GLOBAL = 1024         # cap for oversized-triangle global list
_AREA_EPS = 1e-12
_W_EPS = 1e-9


# ----------------------------------------------------------------------------
# XLA-side triangle setup and binning
# ----------------------------------------------------------------------------

def triangle_setup(pos_clip: Array, faces: Array, height: int, width: int):
    """Per-triangle screen records for the kernel.

    :return: (data (T, 16) f32, tile_bbox (T, 4) i32 = (tx0, ty0, tx1, ty1),
              valid (T,) bool)
    """
    w = pos_clip[:, 3]
    safe_w = jnp.where(jnp.abs(w) > _W_EPS, w, _W_EPS)
    ndc = pos_clip[:, :3] / safe_w[:, None]
    sx = (ndc[:, 0] + 1.0) * (0.5 * width)
    sy = (ndc[:, 1] + 1.0) * (0.5 * height)
    sz = ndc[:, 2]

    fx = sx[faces]            # (T, 3)
    fy = sy[faces]
    fz = sz[faces]
    fw = w[faces]

    x0, x1, x2 = fx[:, 0], fx[:, 1], fx[:, 2]
    y0, y1, y2 = fy[:, 0], fy[:, 1], fy[:, 2]

    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    valid = (jnp.all(fw > _W_EPS, axis=1)) & (jnp.abs(area) > _AREA_EPS)
    inv_area = jnp.where(valid, 1.0 / jnp.where(jnp.abs(area) > _AREA_EPS,
                                                area, 1.0), 0.0)

    # lambda_0(p) = E(v1, v2, p) / area: affine coefficients.
    def edge_coeffs(ax, ay, bx, by):
        a = -(by - ay) * inv_area
        b = (bx - ax) * inv_area
        c = (by - ay) * ax * inv_area - (bx - ax) * ay * inv_area
        return a, b, c

    a0, b0, c0 = edge_coeffs(x1, y1, x2, y2)
    a1, b1, c1 = edge_coeffs(x2, y2, x0, y0)
    a2, b2, c2 = edge_coeffs(x0, y0, x1, y1)

    # Screen-linear depth plane z(p) = zx x + zy y + zc from the three
    # vertex ndc depths: z = l0 z0 + l1 z1 + l2 z2.
    zx = a0 * fz[:, 0] + a1 * fz[:, 1] + a2 * fz[:, 2]
    zy = b0 * fz[:, 0] + b1 * fz[:, 1] + b2 * fz[:, 2]
    zc = c0 * fz[:, 0] + c1 * fz[:, 1] + c2 * fz[:, 2]

    # Invalid triangles: force coverage impossible (c = -1e30 keeps
    # lambda < 0 for every pixel).
    neg = jnp.float32(-1e30)
    c0 = jnp.where(valid, c0, neg)
    c1 = jnp.where(valid, c1, neg)
    c2 = jnp.where(valid, c2, neg)

    tri_id_f = jnp.arange(faces.shape[0], dtype=jnp.float32)
    # slots 13-15: the clip-space w of each vertex (used by the gradient
    # kernel for the perspective-correction chain).
    data = jnp.stack([a0, b0, c0, a1, b1, c1, a2, b2, c2, zx, zy, zc,
                      tri_id_f, fw[:, 0], fw[:, 1], fw[:, 2]], axis=1)

    xmin = jnp.minimum(jnp.minimum(x0, x1), x2)
    xmax = jnp.maximum(jnp.maximum(x0, x1), x2)
    ymin = jnp.minimum(jnp.minimum(y0, y1), y2)
    ymax = jnp.maximum(jnp.maximum(y0, y1), y2)
    gx = (width + TILE_W - 1) // TILE_W
    gy = (height + TILE_H - 1) // TILE_H
    tx0 = jnp.clip(jnp.floor(xmin / TILE_W).astype(jnp.int32), 0, gx - 1)
    tx1 = jnp.clip(jnp.floor(xmax / TILE_W).astype(jnp.int32), 0, gx - 1)
    ty0 = jnp.clip(jnp.floor(ymin / TILE_H).astype(jnp.int32), 0, gy - 1)
    ty1 = jnp.clip(jnp.floor(ymax / TILE_H).astype(jnp.int32), 0, gy - 1)
    # Off-screen cull
    on_screen = (xmax >= 0) & (xmin < width) & (ymax >= 0) & (ymin < height)
    valid = valid & on_screen
    tile_bbox = jnp.stack([tx0, ty0, tx1, ty1], axis=1)
    return data, tile_bbox, valid


class Bins(NamedTuple):
    """Tile-binned triangle records (see bin_triangles)."""

    sorted_data_t: Array    # (16, P) transposed records, tile-grouped
    bin_start: Array        # (n_tiles + 1,) i32 bin offsets into P
    global_data_t: Array    # (16, MAX_GLOBAL) oversized-triangle records
    n_global: Array         # (1,) i32
    sorted_tri: Array       # (P_raw,) i32 triangle index per sorted pair
    global_idx: Array       # (MAX_GLOBAL,) i32 triangle index per global row
    sorted_aux_t: Array     # (8, P) auxiliary per-triangle rows (uv corners)
    global_aux_t: Array     # (8, MAX_GLOBAL)


def uv_records(uv: Array, uv_idx: Array) -> Array:
    """(T, 8) per-triangle uv corners [u0 v0 u1 v1 u2 v2 0 0].

    Differentiable w.r.t. ``uv`` — the custom VJP chains interpolated-
    coordinate gradients through this gather.
    """
    corners = uv[uv_idx]                     # (T, 3, 2)
    flat = corners.reshape(-1, 6)
    pad = jnp.zeros((flat.shape[0], 2), flat.dtype)
    return jnp.concatenate([flat, pad], axis=1)


def bin_triangles(data: Array, tile_bbox: Array, valid: Array,
                  height: int, width: int,
                  aux: Array | None = None) -> "Bins":
    """Group triangles by tile via one int32 key sort."""
    T = data.shape[0]
    gx = (width + TILE_W - 1) // TILE_W
    gy = (height + TILE_H - 1) // TILE_H
    n_tiles = gx * gy
    K = WINDOW_Y * WINDOW_X

    tx0, ty0 = tile_bbox[:, 0], tile_bbox[:, 1]
    tx1, ty1 = tile_bbox[:, 2], tile_bbox[:, 3]
    wx = tx1 - tx0 + 1
    wy = ty1 - ty0 + 1
    fits = (wx <= WINDOW_X) & (wy <= WINDOW_Y)

    # (tile, tri) pair expansion over the window.
    k = jnp.arange(K, dtype=jnp.int32)
    dx = (k % WINDOW_X)[None, :]
    dy = (k // WINDOW_X)[None, :]
    tx = tx0[:, None] + dx
    ty = ty0[:, None] + dy
    pair_valid = (valid & fits)[:, None] & (dx < wx[:, None]) & (dy < wy[:, None])
    tile_ids = jnp.where(pair_valid, ty * gx + tx, n_tiles)

    # Pack (tile, tri) into one int32 key: tile * T + tri. Safe while
    # (n_tiles + 1) * T < 2^31.
    tri_ids = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[:, None],
                               tile_ids.shape)
    keys = (tile_ids * T + tri_ids).reshape(-1)
    keys = jnp.sort(keys)
    sorted_tile = keys // T
    sorted_tri = keys % T
    sorted_data = data[sorted_tri]
    # Pad so every CHUNK-sized DMA window starting inside the live region
    # stays in bounds, then store TRANSPOSED (16, P): the kernel DMAs
    # lane-aligned (16, CHUNK) column blocks (Mosaic requires 128-aligned
    # last-dim slices) and reads coefficients as vectors, never scalars.
    pad_rows = CHUNK + (-sorted_data.shape[0]) % CHUNK
    sorted_data = jnp.concatenate(
        [sorted_data, jnp.zeros((pad_rows, 16), sorted_data.dtype)], axis=0)
    sorted_data_t = sorted_data.T  # (16, P)

    counts = jnp.bincount(sorted_tile, length=n_tiles + 1)
    bin_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(counts[:n_tiles]).astype(jnp.int32)])

    # Global list: valid triangles too large for the window (fixed
    # MAX_GLOBAL rows; unused rows are zero).
    big = valid & ~fits
    big_idx = jnp.where(big, jnp.arange(T, dtype=jnp.int32), T)
    big_idx = jnp.concatenate(
        [big_idx, jnp.full((MAX_GLOBAL,), T, jnp.int32)])
    big_idx = jnp.sort(big_idx)[:MAX_GLOBAL]
    n_global = jnp.sum(big).astype(jnp.int32)
    n_global = jnp.minimum(n_global, MAX_GLOBAL)
    safe_big = jnp.minimum(big_idx, T - 1)
    global_data = jnp.where((big_idx < T)[:, None], data[safe_big], 0.0)
    global_data_t = global_data.T  # (16, MAX_GLOBAL)

    if aux is None:
        aux = jnp.zeros((T, 8), jnp.float32)
    sorted_aux = jax.lax.stop_gradient(aux)[sorted_tri]
    sorted_aux = jnp.concatenate(
        [sorted_aux, jnp.zeros((pad_rows, 8), sorted_aux.dtype)], axis=0)
    global_aux = jnp.where((big_idx < T)[:, None],
                           jax.lax.stop_gradient(aux)[safe_big], 0.0)

    return Bins(sorted_data_t=sorted_data_t, bin_start=bin_start,
                global_data_t=global_data_t, n_global=n_global.reshape(1),
                sorted_tri=sorted_tri, global_idx=big_idx,
                sorted_aux_t=sorted_aux.T, global_aux_t=global_aux.T)


# ----------------------------------------------------------------------------
# The kernel
# ----------------------------------------------------------------------------

def _visibility_kernel(gx: int,
                       # scalar prefetch
                       bin_start_ref, n_global_ref,
                       # inputs
                       sorted_data_hbm, global_data_hbm,
                       # outputs
                       id_out_ref, z_out_ref,
                       # scratch
                       chunk_vmem, global_vmem, dma_sem, global_sem):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tile_idx = ti * gx + tj

    start = bin_start_ref[tile_idx]
    end = bin_start_ref[tile_idx + 1]
    count = end - start
    n_global = n_global_ref[0]

    BIG = jnp.float32(3.0e38)
    zbuf0 = jnp.full((TILE_H, TILE_W), BIG)
    idbuf0 = jnp.full((TILE_H, TILE_W), jnp.float32(-1.0))

    # x along lanes (shared by all tile rows); record index along sublanes.
    x_row = (tj * TILE_W
             + jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1)
             ).astype(jnp.float32) + 0.5                       # (1, 128)
    rec_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)

    def process_chunk(vmem, rec_base, lo, hi, carry):
        """Resolve CHUNK records (from a (16, CHUNK) VMEM block) against the
        whole tile using only vector ops: per tile row, build
        (record, pixel) planes by broadcasting coefficient columns against
        the pixel-x row, mask coverage, and min-reduce depth over records.
        Records outside [lo, hi) are masked off.
        """
        zb, ib = carry
        at = vmem[:].T                                        # (CHUNK, 16)
        a0 = at[:, 0:1]; b0 = at[:, 1:2]; c0 = at[:, 2:3]
        a1 = at[:, 3:4]; b1 = at[:, 4:5]; c1 = at[:, 5:6]
        a2 = at[:, 6:7]; b2 = at[:, 7:8]; c2 = at[:, 8:9]
        zx = at[:, 9:10]; zy = at[:, 10:11]; zc = at[:, 11:12]
        tid = at[:, 12:13]                                    # (CHUNK, 1)
        rec = rec_base + rec_iota
        active = (rec >= lo) & (rec < hi)                     # (CHUNK, 1)

        z_rows = []
        id_rows = []
        for g in range(TILE_H):
            y = (ti * TILE_H + g).astype(jnp.float32) + 0.5   # scalar
            l0 = a0 * x_row + (b0 * y + c0)                   # (CHUNK, 128)
            l1 = a1 * x_row + (b1 * y + c1)
            l2 = a2 * x_row + (b2 * y + c2)
            z = zx * x_row + (zy * y + zc)
            covered = ((l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0)
                       & (z >= -1.0) & (z <= 1.0) & active)
            zm = jnp.where(covered, z, BIG)
            zmin = jnp.min(zm, axis=0, keepdims=True)          # (1, 128)
            idm = jnp.where(zm <= zmin, tid, BIG)
            idmin = jnp.min(idm, axis=0, keepdims=True)        # (1, 128)
            z_rows.append(zmin)
            id_rows.append(idmin)

        z_new = jnp.concatenate(z_rows, axis=0)                # (8, 128)
        id_new = jnp.concatenate(id_rows, axis=0)
        better = z_new < zb
        zb = jnp.where(better, z_new, zb)
        ib = jnp.where(better, id_new, ib)
        return zb, ib

    # ---- binned triangles, streamed in CHUNK-record column blocks ----
    first_chunk = start // CHUNK
    n_chunks = jnp.where(count > 0,
                         (end - 1) // CHUNK - first_chunk + 1, 0)

    def chunk_body(ci, carry):
        col0 = (first_chunk + ci) * CHUNK
        src = sorted_data_hbm.at[:, pl.ds(col0, CHUNK)]
        dma = pltpu.make_async_copy(src, chunk_vmem, dma_sem)
        dma.start()
        dma.wait()
        return process_chunk(chunk_vmem, col0, start, end, carry)

    carry = jax.lax.fori_loop(0, n_chunks, chunk_body, (zbuf0, idbuf0))

    # ---- global (oversized) triangles ----
    @pl.when(n_global > 0)
    def _():
        dma = pltpu.make_async_copy(global_data_hbm, global_vmem, global_sem)
        dma.start()
        dma.wait()

    def global_body(ci, carry):
        gvmem_block = global_vmem.at[:, pl.ds(ci * CHUNK, CHUNK)]
        return process_chunk(gvmem_block, ci * CHUNK, 0, n_global, carry)

    n_gchunks = (n_global + CHUNK - 1) // CHUNK
    zbuf, idbuf = jax.lax.fori_loop(0, n_gchunks, global_body, carry)

    id_out_ref[:] = jnp.where(zbuf < BIG, idbuf, -1.0).astype(jnp.int32)
    z_out_ref[:] = zbuf


# ----------------------------------------------------------------------------
# Public entry
# ----------------------------------------------------------------------------

def pad_resolution(height: int, width: int):
    ph = (height + TILE_H - 1) // TILE_H * TILE_H
    pw = (width + TILE_W - 1) // TILE_W * TILE_W
    return ph, pw


def bin_scene(pos_clip: Array, faces: Array, height: int, width: int,
              aux: Array | None = None):
    """Triangle setup + binning for a render target; shared between the
    visibility and gradient kernels.

    :param aux: optional (T, 8) per-triangle auxiliary rows (uv corners)
        carried alongside the records for the fused interpolation path.
    :return: (data (T, 16), Bins)
    """
    ph, pw = pad_resolution(height, width)
    data, tile_bbox, valid = triangle_setup(pos_clip, faces.astype(jnp.int32),
                                            height, width)
    bins = bin_triangles(data, tile_bbox, valid, ph, pw, aux=aux)
    return data, bins


def visibility_from_bins(bins: "Bins", height: int, width: int,
                         interpret: bool = False) -> Array:
    """(H, W) int32 winning triangle ids from precomputed bins."""
    ph, pw = pad_resolution(height, width)
    gy, gx = ph // TILE_H, pw // TILE_W
    sorted_data = bins.sorted_data_t
    bin_start = bins.bin_start
    global_data = bins.global_data_t
    n_global = bins.n_global

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gy, gx),
        in_specs=[
            # Force HBM: bins are streamed via manual DMA, and VMEM
            # placement would impose (8, 128) tiling on the 16-wide rows.
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j)),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j)),
        ],
        scratch_shapes=[
            pltpu.VMEM((16, CHUNK), jnp.float32),
            pltpu.VMEM((16, MAX_GLOBAL), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    idbuf, _zbuf = pl.pallas_call(
        functools.partial(_visibility_kernel, gx),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ph, pw), jnp.int32),
            jax.ShapeDtypeStruct((ph, pw), jnp.float32),
        ],
        interpret=interpret,
    )(bin_start, n_global, sorted_data, global_data)

    return idbuf[:height, :width]


@functools.partial(jax.jit, static_argnames=("height", "width"))
def raster_stats(pos_clip: Array, faces: Array, height: int, width: int):
    """Binning health counters (no-silent-caps check, jit-safe).

    :return: dict with n_valid_pairs (bin entries), n_global (oversized
        triangles in the global list), global_overflow (oversized
        triangles DROPPED past MAX_GLOBAL — must be 0 for a correct
        render), pair_cap_suggestion (min pair_cap preserving all
        gradients in the backward reduction).
    """
    ph, pw = pad_resolution(height, width)
    data, tile_bbox, valid = triangle_setup(pos_clip, faces.astype(jnp.int32),
                                            height, width)
    tx0, ty0, tx1, ty1 = (tile_bbox[:, 0], tile_bbox[:, 1],
                          tile_bbox[:, 2], tile_bbox[:, 3])
    wx = tx1 - tx0 + 1
    wy = ty1 - ty0 + 1
    fits = (wx <= WINDOW_X) & (wy <= WINDOW_Y)
    n_pairs = jnp.sum(jnp.where(valid & fits, wx * wy, 0))
    n_big = jnp.sum(valid & ~fits)
    return {
        "n_valid_pairs": n_pairs,
        "n_global": jnp.minimum(n_big, MAX_GLOBAL),
        "global_overflow": jnp.maximum(n_big - MAX_GLOBAL, 0),
        "pair_cap_suggestion": n_pairs,
    }


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "interpret"))
def visibility_pallas(pos_clip: Array, faces: Array, height: int, width: int,
                      interpret: bool = False) -> Array:
    """(H, W) int32 winning triangle ids; -1 = background.

    Drop-in replacement for ops.rasterize.visibility_scan, O(bin work)
    instead of O(T * H * W).
    """
    _, bins = bin_scene(pos_clip, faces, height, width)
    return visibility_from_bins(bins, height, width, interpret=interpret)


# ----------------------------------------------------------------------------
# Fused kernel: visibility + perspective-correct attributes in one pass
# ----------------------------------------------------------------------------

def _fused_kernel(gx: int,
                  bin_start_ref, n_global_ref,
                  sorted_data_hbm, global_data_hbm,
                  sorted_aux_hbm, global_aux_hbm,
                  id_out_ref, u_out_ref, v_out_ref, z_out_ref,
                  tu_out_ref, tv_out_ref,
                  chunk_vmem, aux_vmem, global_vmem, gaux_vmem,
                  dma_sem, aux_sem, global_sem, gaux_sem):
    """Like _visibility_kernel, but also resolves the winning record's
    perspective-correct barycentrics (u, v) AND interpolated uv
    coordinates (tu, tv) per pixel — forward rasterize + interpolate in
    one pass without any per-pixel record gather."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tile_idx = ti * gx + tj

    start = bin_start_ref[tile_idx]
    end = bin_start_ref[tile_idx + 1]
    count = end - start
    n_global = n_global_ref[0]

    BIG = jnp.float32(3.0e38)
    zbuf0 = jnp.full((TILE_H, TILE_W), BIG)
    idbuf0 = jnp.full((TILE_H, TILE_W), jnp.float32(-1.0))
    zero_img = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    x_row = (tj * TILE_W
             + jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1)
             ).astype(jnp.float32) + 0.5
    rec_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)

    def process_chunk(vmem, auxmem, rec_base, lo, hi, carry):
        zb, ib, ub, vb, tub, tvb = carry
        at = vmem[:].T
        a0 = at[:, 0:1]; b0 = at[:, 1:2]; c0 = at[:, 2:3]
        a1 = at[:, 3:4]; b1 = at[:, 4:5]; c1 = at[:, 5:6]
        a2 = at[:, 6:7]; b2 = at[:, 7:8]; c2 = at[:, 8:9]
        zx = at[:, 9:10]; zy = at[:, 10:11]; zc = at[:, 11:12]
        tid = at[:, 12:13]
        w0 = at[:, 13:14]; w1 = at[:, 14:15]; w2 = at[:, 15:16]
        iw0 = 1.0 / jnp.where(jnp.abs(w0) > 1e-9, w0, 1.0)
        iw1 = 1.0 / jnp.where(jnp.abs(w1) > 1e-9, w1, 1.0)
        iw2 = 1.0 / jnp.where(jnp.abs(w2) > 1e-9, w2, 1.0)
        uvt = auxmem[:].T
        cu0 = uvt[:, 0:1]; cv0 = uvt[:, 1:2]
        cu1 = uvt[:, 2:3]; cv1 = uvt[:, 3:4]
        cu2 = uvt[:, 4:5]; cv2 = uvt[:, 5:6]
        rec = rec_base + rec_iota
        active = (rec >= lo) & (rec < hi)

        z_rows = []; id_rows = []; u_rows = []; v_rows = []
        tu_rows = []; tv_rows = []
        for g in range(TILE_H):
            y = (ti * TILE_H + g).astype(jnp.float32) + 0.5
            l0 = a0 * x_row + (b0 * y + c0)
            l1 = a1 * x_row + (b1 * y + c1)
            l2 = a2 * x_row + (b2 * y + c2)
            z = zx * x_row + (zy * y + zc)
            covered = ((l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0)
                       & (z >= -1.0) & (z <= 1.0) & active)
            zm = jnp.where(covered, z, BIG)
            zmin = jnp.min(zm, axis=0, keepdims=True)
            idm = jnp.where(zm <= zmin, tid, BIG)
            idmin = jnp.min(idm, axis=0, keepdims=True)
            # winner-select: tids are unique within a bin, but the chunk
            # window may hold the same triangle binned for a neighboring
            # tile — require coverage (includes the active mask) so
            # exactly one row matches
            eq = ((tid == idmin) & covered).astype(jnp.float32)
            d0 = l0 * iw0
            d1 = l1 * iw1
            d2 = l2 * iw2
            rD = 1.0 / jnp.where(jnp.abs(d0 + d1 + d2) > 1e-12,
                                 d0 + d1 + d2, 1.0)
            up = d0 * rD
            vp = d1 * rD
            u_rows.append(jnp.sum(eq * up, axis=0, keepdims=True))
            v_rows.append(jnp.sum(eq * vp, axis=0, keepdims=True))
            # texc = u*c0 + v*c1 + (1-u-v)*c2
            tu = up * (cu0 - cu2) + vp * (cu1 - cu2) + cu2
            tv = up * (cv0 - cv2) + vp * (cv1 - cv2) + cv2
            tu_rows.append(jnp.sum(eq * tu, axis=0, keepdims=True))
            tv_rows.append(jnp.sum(eq * tv, axis=0, keepdims=True))
            z_rows.append(zmin)
            id_rows.append(idmin)

        z_new = jnp.concatenate(z_rows, axis=0)
        better = z_new < zb
        zb = jnp.where(better, z_new, zb)
        ib = jnp.where(better, jnp.concatenate(id_rows, axis=0), ib)
        ub = jnp.where(better, jnp.concatenate(u_rows, axis=0), ub)
        vb = jnp.where(better, jnp.concatenate(v_rows, axis=0), vb)
        tub = jnp.where(better, jnp.concatenate(tu_rows, axis=0), tub)
        tvb = jnp.where(better, jnp.concatenate(tv_rows, axis=0), tvb)
        return zb, ib, ub, vb, tub, tvb

    first_chunk = start // CHUNK
    n_chunks = jnp.where(count > 0,
                         (end - 1) // CHUNK - first_chunk + 1, 0)

    # Double-buffered bin streaming: prefetch chunk ci+1 while processing
    # ci (chunk_vmem/aux_vmem have a leading slot dim of 2).
    def data_dma(slot, ci):
        col0 = (first_chunk + ci) * CHUNK
        return pltpu.make_async_copy(
            sorted_data_hbm.at[:, pl.ds(col0, CHUNK)],
            chunk_vmem.at[slot], dma_sem.at[slot])

    def aux_dma(slot, ci):
        col0 = (first_chunk + ci) * CHUNK
        return pltpu.make_async_copy(
            sorted_aux_hbm.at[:, pl.ds(col0, CHUNK)],
            aux_vmem.at[slot], aux_sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        data_dma(0, 0).start()
        aux_dma(0, 0).start()

    def chunk_body(ci, carry):
        slot = jax.lax.rem(ci, 2)
        nxt = jax.lax.rem(ci + 1, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            data_dma(nxt, ci + 1).start()
            aux_dma(nxt, ci + 1).start()

        data_dma(slot, ci).wait()
        aux_dma(slot, ci).wait()
        col0 = (first_chunk + ci) * CHUNK
        return process_chunk(chunk_vmem.at[slot], aux_vmem.at[slot],
                             col0, start, end, carry)

    carry = jax.lax.fori_loop(
        0, n_chunks, chunk_body,
        (zbuf0, idbuf0, zero_img, zero_img, zero_img, zero_img))

    @pl.when(n_global > 0)
    def _():
        dma = pltpu.make_async_copy(global_data_hbm, global_vmem, global_sem)
        dma.start()
        adma = pltpu.make_async_copy(global_aux_hbm, gaux_vmem, gaux_sem)
        adma.start()
        dma.wait()
        adma.wait()

    def global_body(ci, carry):
        gblock = global_vmem.at[:, pl.ds(ci * CHUNK, CHUNK)]
        gaux = gaux_vmem.at[:, pl.ds(ci * CHUNK, CHUNK)]
        return process_chunk(gblock, gaux, ci * CHUNK, 0, n_global, carry)

    n_gchunks = (n_global + CHUNK - 1) // CHUNK
    zbuf, idbuf, ubuf, vbuf, tubuf, tvbuf = jax.lax.fori_loop(
        0, n_gchunks, global_body, carry)

    hit = zbuf < BIG
    id_out_ref[:] = jnp.where(hit, idbuf, -1.0).astype(jnp.int32)
    u_out_ref[:] = jnp.where(hit, ubuf, 0.0)
    v_out_ref[:] = jnp.where(hit, vbuf, 0.0)
    z_out_ref[:] = jnp.where(hit, zbuf, 0.0)
    tu_out_ref[:] = jnp.where(hit, tubuf, 0.0)
    tv_out_ref[:] = jnp.where(hit, tvbuf, 0.0)


def fused_rasterize_from_bins(bins: "Bins", height: int, width: int,
                              interpret: bool = False):
    """(idbuf, u, v, z, tu, tv) from precomputed bins — one kernel pass,
    no per-pixel gathers. (tu, tv) interpolate the aux uv-corner rows."""
    ph, pw = pad_resolution(height, width)
    gy, gx = ph // TILE_H, pw // TILE_W

    img = lambda: pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[img(), img(), img(), img(), img(), img()],
        scratch_shapes=[
            pltpu.VMEM((2, 16, CHUNK), jnp.float32),   # double-buffered
            pltpu.VMEM((2, 8, CHUNK), jnp.float32),    # double-buffered
            pltpu.VMEM((16, MAX_GLOBAL), jnp.float32),
            pltpu.VMEM((8, MAX_GLOBAL), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    idbuf, u, v, z, tu, tv = pl.pallas_call(
        functools.partial(_fused_kernel, gx),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ph, pw), jnp.int32),
            jax.ShapeDtypeStruct((ph, pw), jnp.float32),
            jax.ShapeDtypeStruct((ph, pw), jnp.float32),
            jax.ShapeDtypeStruct((ph, pw), jnp.float32),
            jax.ShapeDtypeStruct((ph, pw), jnp.float32),
            jax.ShapeDtypeStruct((ph, pw), jnp.float32),
        ],
        interpret=interpret,
    )(bins.bin_start, bins.n_global, bins.sorted_data_t, bins.global_data_t,
      bins.sorted_aux_t, bins.global_aux_t)

    return (idbuf[:height, :width], u[:height, :width],
            v[:height, :width], z[:height, :width],
            tu[:height, :width], tv[:height, :width])

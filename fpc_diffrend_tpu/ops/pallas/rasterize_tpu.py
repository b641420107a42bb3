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
    plane (z = zx x + zy y + zc), packed into a 32-float record together
    with auxiliary per-triangle data (uv corners, screen-space corner
    positions, neighbor-face ids) consumed by interpolation and the
    elementwise antialias pass.
  * Binning runs in XLA: each triangle emits (tile, tri) pairs for a
    WINDOW_Y x WINDOW_X tile window anchored at its bbox; since a
    triangle covers each tile at most once, every pair's grouped
    position comes from one key-sort over the pairs (_place_sort;
    FPC_BIN_IMPL=rank selects a sort-free running-count placement that
    trades runtime for compile time) and a cumsum yields per-tile
    [start, end) ranges. Triangles too
    large for the window go to a small global list loaded once into
    persistent VMEM and processed by every tile whose rows its
    32-record blocks overlap.
  * The kernel scalar-prefetches the bin offsets, streams its bin from HBM
    in 128-record chunks via double-buffered async DMA, and resolves
    coverage + depth with fused VPU ops. Within each chunk, 32-record
    sub-blocks outside the bin's live range are skipped with predicated
    execution — the chunk windows are 128-aligned while bins average a few
    dozen records, so this removes most of the padding work.

Coverage rule matches ops/rasterize.py:visibility_scan: inside = all
normalized barycentrics >= 0 (both windings), depth = screen-linear ndc z,
z-range culled to [-1, 1], nearest-z wins.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

TILE_H = 8                # tile height in pixels (VPU sublanes)
TILE_W = 128              # tile width in pixels (VPU lanes)
# Binning window in tiles. Triangles whose tile bbox exceeds the window
# go to the (MAX_GLOBAL-capped, overflow-counted) global list, so a
# smaller WINDOW_Y trades global-list pressure for a linearly shorter
# (tile, tri) pair list — the key sort over those pairs is the binning
# stage's dominant cost. The headline scene's triangles all fit 3 tile
# rows (~10 px tall), so FPC_WINDOW_Y=3 cuts sorted pairs 25% with zero
# spill; 4 is the safe default for unknown meshes. Env-tunable for A/B.
WINDOW_Y = int(os.environ.get("FPC_WINDOW_Y", "4"))   # tiles (8 px each)
WINDOW_X = 2              # binning window in tiles (256 px wide)
CHUNK = 128               # triangles DMA'd per bin chunk
# Predicated sub-block granularity within a chunk: bins average a few
# dozen records, so the phase-A waste is ~SUB/2 padded records per bin
# end; smaller SUB trades padding waste for more predication branches.
# Env override FPC_SUB for A/B tuning (must divide CHUNK, multiple of 8).
SUB = int(os.environ.get("FPC_SUB", "16"))
MAX_GLOBAL = 1024         # cap for oversized-triangle global list
REC = 32                  # floats per combined triangle record
# payload plane order emitted by the fused kernel (after the id plane)
N_PAYLOAD = 14            # u v z tu tv x0 y0 x1 y1 x2 y2 n0 n1 n2
_AREA_EPS = 1e-12
_W_EPS = 1e-9


# ----------------------------------------------------------------------------
# XLA-side triangle setup and binning
# ----------------------------------------------------------------------------

def _int_zero_ct(x):
    import numpy as np

    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, jax.dtypes.float0)


@jax.custom_vjp
def corner_gather(x: Array, idx: Array, inc_idx: Array, inc_mask: Array):
    """``x[idx]`` whose backward is a gather, not a scatter.

    XLA autodiff of a (T, 3) corner gather emits a scatter-add back onto
    the (V, C) source — measured ~15 ms/step at the headline workload
    (the fit's largest backward XLA-glue cost; TPU scatters run at
    ~450 Mfloat/s). With the static incidence table from
    data.obj.corner_incidence the backward instead gathers each target
    row's <= D cotangent slots and mask-sums them — pure gather + reduce.
    Accumulation order per vertex differs from the scatter (ulp-level).

    :param x: (V, C) source rows.
    :param idx: (T, 3) int32 corner indices.
    :param inc_idx / inc_mask: (V, D) incidence table for ``idx``.
    :return: (T, 3, C) gathered rows.
    """
    return x[idx]


def _corner_gather_fwd(x, idx, inc_idx, inc_mask):
    return x[idx], (idx, inc_idx, inc_mask)


def _corner_gather_bwd(res, ct):
    idx, inc_idx, inc_mask = res
    flat = ct.reshape(-1, ct.shape[-1])               # (T*3, C)
    rows = flat[inc_idx]                              # (V, D, C)
    gx = jnp.sum(jnp.where(inc_mask[..., None], rows, 0.0), axis=1)
    return (gx, _int_zero_ct(idx), _int_zero_ct(inc_idx),
            _int_zero_ct(inc_mask))


corner_gather.defvjp(_corner_gather_fwd, _corner_gather_bwd)


def triangle_setup(pos_clip: Array, faces: Array, height: int, width: int,
                   vtx_inc=None):
    """Per-triangle screen records for the kernel.

    :param vtx_inc: optional (inc_idx, inc_mask) incidence table for
        ``faces`` (data.obj.corner_incidence) — routes the backward
        through the gather-based corner_gather instead of XLA's
        scatter-add (values identical; see corner_gather).
    :return: (data (T, 16) f32, tile_bbox (T, 4) i32 = (tx0, ty0, tx1, ty1),
              valid (T,) bool)
    """
    w = pos_clip[:, 3]
    safe_w = jnp.where(jnp.abs(w) > _W_EPS, w, _W_EPS)
    ndc = pos_clip[:, :3] / safe_w[:, None]
    sx = (ndc[:, 0] + 1.0) * (0.5 * width)
    sy = (ndc[:, 1] + 1.0) * (0.5 * height)
    sz = ndc[:, 2]

    if vtx_inc is not None:
        fields = jnp.stack([sx, sy, sz, w], axis=1)       # (V, 4)
        ff = corner_gather(fields, faces, *vtx_inc)       # (T, 3, 4)
        fx, fy, fz, fw = ff[..., 0], ff[..., 1], ff[..., 2], ff[..., 3]
    else:
        fx = sx[faces]        # (T, 3)
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


def aux_records(uv: Array, uv_idx: Array, pos_clip: Array, faces: Array,
                face_neighbors: Array | None, height: int,
                width: int, vtx_inc=None, uv_inc=None) -> Array:
    """(T, 16) auxiliary rows: uv corners, screen corners, neighbor ids.

    Layout: [u0 v0 u1 v1 u2 v2 x0 y0 x1 y1 x2 y2 n0 n1 n2 0].
    Differentiable w.r.t. ``uv`` and ``pos_clip`` — the fused rasterize
    custom VJP chains interpolated-coordinate and antialias-vertex
    gradients back through these gathers.

    :param vtx_inc / uv_inc: optional incidence tables for ``faces`` /
        ``uv_idx`` (see corner_gather — gather-based backward).
    """
    T = faces.shape[0]
    if uv_inc is not None:
        corners = corner_gather(uv, uv_idx, *uv_inc).reshape(T, 6)
    else:
        corners = uv[uv_idx].reshape(T, 6)           # (T, 6)
    w = pos_clip[:, 3:4]
    safe_w = jnp.where(jnp.abs(w) > _W_EPS, w, _W_EPS)
    ndc = pos_clip[:, :2] / safe_w
    sx = (ndc[:, 0] + 1.0) * (0.5 * width)
    sy = (ndc[:, 1] + 1.0) * (0.5 * height)
    sv = jnp.stack([sx, sy], axis=1)                 # (V, 2)
    if vtx_inc is not None:
        verts = corner_gather(sv, faces, *vtx_inc).reshape(T, 6)
    else:
        verts = sv[faces].reshape(T, 6)              # (T, 6)
    if face_neighbors is None:
        neigh = jnp.full((T, 3), -1.0, jnp.float32)
    else:
        neigh = face_neighbors.astype(jnp.float32)
    pad = jnp.zeros((T, 1), jnp.float32)
    return jnp.concatenate([corners, verts, neigh, pad], axis=1)


def uv_records(uv: Array, uv_idx: Array) -> Array:
    """(T, 8) uv corner rows [u0 v0 u1 v1 u2 v2 0 0] (round-1 layout,
    kept for tests); prefer aux_records for the fused pipeline."""
    corners = uv[uv_idx]                     # (T, 3, 2)
    flat = corners.reshape(-1, 6)
    pad = jnp.zeros((flat.shape[0], 2), flat.dtype)
    return jnp.concatenate([flat, pad], axis=1)


class Bins(NamedTuple):
    """Tile-binned combined triangle records (see bin_triangles)."""

    sorted_rec_t: Array     # (REC, P) transposed records, tile-grouped
    bin_start: Array        # (n_tiles + 1,) i32 bin offsets into P
    global_rec_t: Array     # (REC, MAX_GLOBAL) oversized-triangle records
    n_global: Array         # (1,) i32
    sorted_tri: Array       # (P_raw,) i32 triangle index per sorted pair
    global_idx: Array       # (MAX_GLOBAL,) i32 triangle index per global row
    gblk_ty: Array          # (2, MAX_GLOBAL // SUB) i32 per-block tile-row
                            # [min, max] ranges for predicated skipping
    inv_pos: Array | None = None   # (T, K) i32 sorted position of each
                            # (tri, window-slot) pair (P = dropped); only
                            # built under FPC_FOLD_IMPL=gather


def _place_sort(tile_ids: Array, T: int, n_tiles: int, P: int,
                want_inv: bool = False):
    """Tile-grouped placement via one int32 key sort (round-1 path).

    Pack (tile, tri) into one key tile * T + tri (safe while
    (n_tiles + 1) * T < 2^31); ascending sort groups by tile with tri
    ascending inside each bin; the kept prefix of length P implements
    the entry cap.

    :param want_inv: also return the inverse permutation — the sorted
        position of each (tri, window-slot) pair, (T, K) i32 with dropped
        or invalid pairs at P — used by the gather-based gradient fold.
    """
    tri_ids = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[:, None],
                               tile_ids.shape)
    keys_flat = (tile_ids * T + tri_ids).reshape(-1)
    inv = None
    if want_inv:
        pair_idx = jnp.arange(keys_flat.shape[0], dtype=jnp.int32)
        keys_all, order = jax.lax.sort((keys_flat, pair_idx), num_keys=1)
        keys = keys_all[:P]
        inv = jnp.full((keys_flat.shape[0],), P, jnp.int32).at[
            order[:P]].set(jnp.arange(P, dtype=jnp.int32),
                           unique_indices=True).reshape(tile_ids.shape)
    else:
        keys = jnp.sort(keys_flat)[:P]
    sorted_tile = keys // T
    sorted_tri = keys % T
    # bin offsets from the sorted tile ids: bin_start[i] = #entries with
    # tile < i == searchsorted(sorted_tile, i). Identical to the previous
    # bincount+cumsum, but a 2k-query binary search instead of a P-sized
    # bincount — the bincount fusion was 6.3 ms/step in the device trace.
    bin_start = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    return sorted_tri, bin_start, inv


# ---------------------------------------------------------------------------
# Pallas counting-rank placement (FPC_BIN_IMPL=pallas)
# ---------------------------------------------------------------------------
#
# The (tile, tri) pair key-sort is the binning stage's dominant cost
# (~18 ms of the headline step through XLA's bitonic sort). The sorted
# position is derivable without sorting (see _place_rank), and the dense
# per-tile counting it needs maps perfectly onto kernel one-hot matmuls:
#
#   pass A: per-tile pair counts — for each 128-pair row, accumulate
#           onehot_a (NH, 128p) @ onehot_b^T (128p, 128b) into a VMEM
#           (NH, 128) counter plane (tile id factored as 128*a + b)
#   XLA:    exclusive cumsum of the counts -> bin_start (also an output)
#   pass B: positions — base[tile_p] and the running same-tile count are
#           read back from (NH, 128) planes with the transposed one-hot
#           contraction (no gathers), the within-row rank is a masked
#           pair-equality column sum, and the running counters advance by
#           the pass-A increment matmul
#
# One int32 scatter of the (unique) positions then builds sorted_tri, and
# the record gather proceeds as in the sort path. Output is bit-identical
# to _place_sort (natural pair order is tri-major, so within-bin order
# stays tri-ascending).

# Pair rows (chunks of 128) per kernel program. WARNING: larger values
# cut per-program dispatch overhead but the unrolled body grows linearly
# and 64 rows put the remote Mosaic compile into the stall class that
# wedges the single-chip attach (observed 2026-08-20; same class as
# FPC_AA_HALO / FPC_MT_GRAD=4). Keep 8 unless compile-testing first.
_PLACE_ROWS = int(os.environ.get("FPC_PLACE_ROWS", "8"))


def _tile_onehots(trow, NH):
    """(oh_a (NH, 128p), oh_b (128b, 128p)) for one (1, 128) f32 id row."""
    a = jnp.floor(trow / 128.0)
    b = trow - a * 128.0
    ia = jax.lax.broadcasted_iota(jnp.int32, (NH, TILE_W), 0).astype(
        jnp.float32)
    ib = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE_W), 0).astype(
        jnp.float32)
    return ((ia == a).astype(jnp.bfloat16), (ib == b).astype(jnp.bfloat16))


def _count_kernel(n_prog: int, NH: int, tiles_ref, counts_ref,
                  cnt_vmem):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        cnt_vmem[:] = jnp.zeros((NH, CHUNK), jnp.float32)

    for row in range(_PLACE_ROWS):
        trow = tiles_ref[row:row + 1, :]
        oh_a, oh_b = _tile_onehots(trow, NH)
        inc = jax.lax.dot_general(
            oh_a, oh_b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (NH, 128b)
        cnt_vmem[:] = cnt_vmem[:] + inc

    @pl.when(g == n_prog - 1)
    def _():
        counts_ref[...] = cnt_vmem[...]


def _plane_lookup(plane, oh_a, oh_b, NH):
    """plane[a_p, b_p] per pair: transposed one-hot contraction + a
    masked sublane reduction (no gathers). Values are integers up to ~P,
    so the bf16 contraction uses the 3-way split (error < 0.02; the
    caller rounds the final position)."""
    r = None
    for part in _split3_bf16(plane):
        f = jax.lax.dot_general(part, oh_b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        r = f if r is None else r + f                 # (NH, 128p)
    return jnp.sum(r * oh_a.astype(jnp.float32), axis=0,
                   keepdims=True)                     # (1, 128p)


def _place_kernel(n_prog: int, NH: int, base_ref, tiles_ref, pos_ref,
                  cnt_vmem):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        cnt_vmem[:] = jnp.zeros((NH, CHUNK), jnp.float32)

    rows = []
    lt = (jax.lax.broadcasted_iota(jnp.int32, (TILE_W, TILE_W), 0)
          < jax.lax.broadcasted_iota(jnp.int32, (TILE_W, TILE_W), 1)
          ).astype(jnp.float32)
    for row in range(_PLACE_ROWS):
        trow = tiles_ref[row:row + 1, :]
        oh_a, oh_b = _tile_onehots(trow, NH)
        # one fused lookup of (bin base + running count) — the two plane
        # lookups share one-hots, so their sum needs a single contraction
        off = _plane_lookup(base_ref[...] + cnt_vmem[...], oh_a, oh_b, NH)
        # within-row exclusive rank among equal tile ids
        eq = (trow == trow.reshape(TILE_W, 1)).astype(jnp.float32)
        rank = jnp.sum(eq * lt, axis=0, keepdims=True)   # (1, 128)
        rows.append(jnp.round(off + rank))
        inc = jax.lax.dot_general(
            oh_a, oh_b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        cnt_vmem[:] = cnt_vmem[:] + inc
    pos_ref[...] = jnp.concatenate(rows, axis=0)


def _place_pallas(tile_ids: Array, T: int, n_tiles: int, P: int,
                  interpret: bool = False):
    """Counting-rank placement via the two Pallas passes; output matches
    _place_sort exactly (same kept prefix, same within-bin order)."""
    K = tile_ids.shape[1]
    NP = T * K
    rows_pad = (-NP) % (_PLACE_ROWS * CHUNK)
    tiles_f = jnp.concatenate(
        [tile_ids.reshape(-1).astype(jnp.float32),
         jnp.full((rows_pad,), float(n_tiles), jnp.float32)])
    NR = tiles_f.shape[0] // CHUNK
    n_prog = NR // _PLACE_ROWS
    tiles2 = tiles_f.reshape(NR, CHUNK)
    NH = ((n_tiles + 1) + CHUNK - 1) // CHUNK
    NH = max(NH, 8)

    counts2 = pl.pallas_call(
        functools.partial(_count_kernel, n_prog, NH),
        grid=(n_prog,),
        in_specs=[pl.BlockSpec((_PLACE_ROWS, CHUNK), lambda g: (g, 0))],
        out_specs=pl.BlockSpec((NH, CHUNK), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((NH, CHUNK), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NH, CHUNK), jnp.float32)],
        interpret=interpret,
    )(tiles2)
    counts = counts2.reshape(-1).astype(jnp.int32)    # (NH * 128,)

    bin_start_full = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(counts[:n_tiles]).astype(jnp.int32)])
    bin_start = jnp.minimum(bin_start_full, P)
    base = bin_start_full.at[n_tiles].set(NP)         # sentinel -> dropped
    base2 = jnp.pad(base[:n_tiles + 1].astype(jnp.float32),
                    (0, NH * CHUNK - (n_tiles + 1)),
                    constant_values=float(NP)).reshape(NH, CHUNK)

    pos2 = pl.pallas_call(
        functools.partial(_place_kernel, n_prog, NH),
        grid=(n_prog,),
        in_specs=[pl.BlockSpec((NH, CHUNK), lambda g: (0, 0)),
                  pl.BlockSpec((_PLACE_ROWS, CHUNK), lambda g: (g, 0))],
        out_specs=pl.BlockSpec((_PLACE_ROWS, CHUNK), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((NR, CHUNK), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NH, CHUNK), jnp.float32)],
        interpret=interpret,
    )(base2, tiles2)
    pos = pos2.reshape(-1)[:NP].astype(jnp.int32)

    tri_ids = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[:, None], tile_ids.shape
    ).reshape(-1)
    sorted_tri = jnp.zeros(P, jnp.int32).at[pos].set(
        tri_ids, mode="drop", unique_indices=True)
    return sorted_tri, bin_start


_RANK_CHUNK = 256


def _place_rank(tile_ids: Array, T: int, n_tiles: int, P: int):
    """Sort-free tile-grouped placement (identical output to _place_sort).

    The sorted position of pair (t, k) is derivable without sorting:
    each triangle covers each tile at most once (its window slots are
    distinct tiles), so within bin tau the entries are exactly the
    covering triangles in ascending index order and

        pos(t, k) = bin_start[tau(t, k)] + #{t' < t : t' covers tau}.

    Both terms come from dense one-hot compare/reduce arithmetic — a
    lax.scan over triangle chunks carrying per-tile running counts —
    replacing the T*WINDOW-key sort whose XLA lowering dominated both
    the binning runtime and (on the remote-compile TPU attach) the
    compile time. One int32 scatter of unique positions places the
    triangle indices; entries past the cap land in a dropped slot, the
    same set the sort path's kept-prefix drops.
    """
    K = tile_ids.shape[1]
    ch = _RANK_CHUNK
    tpad = (T + ch - 1) // ch * ch
    tid = jnp.pad(tile_ids, ((0, tpad - T), (0, 0)),
                  constant_values=n_tiles)
    tgrid = jnp.arange(n_tiles + 1, dtype=jnp.int32)

    chunks = tid.reshape(-1, ch, K)

    def count_body(running, chunk):
        m = chunk[:, :, None] == tgrid                   # (ch, K, NT+1)
        return running + jnp.sum(m, axis=(0, 1), dtype=jnp.int32), None

    counts, _ = jax.lax.scan(count_body,
                             jnp.zeros(n_tiles + 1, jnp.int32), chunks)
    bin_start_full = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(counts[:n_tiles]).astype(jnp.int32)])
    # the kept prefix of the sorted order == positions < P
    bin_start = jnp.minimum(bin_start_full, P)
    # sentinel column (invalid pairs) -> out-of-bounds position; the
    # scatter's default drop mode discards it (as it does entries of
    # bins past the cap, whose base is already clamped to P)
    base = bin_start.at[n_tiles].set(P)

    def rank_body(running, chunk):
        m = chunk[:, :, None] == tgrid                   # (ch, K, NT+1)
        mt = jnp.any(m, axis=1)                          # (ch, NT+1)
        mti = mt.astype(jnp.int32)
        prefix = jnp.cumsum(mti, axis=0) - mti           # exclusive
        off = running[None, :] + prefix + base[None, :]  # (ch, NT+1)
        pos = jnp.sum(jnp.where(m, off[:, None, :], 0), axis=2)
        return running + jnp.sum(mti, axis=0), pos

    _, pos = jax.lax.scan(rank_body, jnp.zeros(n_tiles + 1, jnp.int32),
                          chunks)
    pos = pos.reshape(tpad, K)[:T].reshape(-1)
    tri_ids = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[:, None], tile_ids.shape
    ).reshape(-1)
    # all in-bounds positions are unique by construction; >= P drops
    sorted_tri = jnp.zeros(P, jnp.int32).at[pos].set(
        tri_ids, mode="drop", unique_indices=True)
    return sorted_tri, bin_start


def bin_triangles(data: Array, tile_bbox: Array, valid: Array,
                  height: int, width: int, aux: Array,
                  entry_cap: int | None = None) -> "Bins":
    """Group triangles into per-tile bins (key-sort placement by
    default; FPC_BIN_IMPL=rank selects the sort-free rank path, which
    compiles without the XLA sort but was measured ~3.5x slower at
    runtime on the 30k-tri/2000-tile workload — see BENCHMARKS.md).

    :param entry_cap: static bound on live bin entries. Valid entries are
        a sorted prefix, so slicing to the cap before the record gather
        shrinks the gather, the gradient-kernel output and the backward
        segment fold from T*WINDOW entries (~8x the live count) to the
        cap. Size it via ``raster_stats`` (fit.api.autotune_caps uses
        1.5x the measured count); entries beyond the cap would be dropped
        from the render, which the fit loop's periodic health check
        detects.
    """
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

    P = T * K
    if entry_cap is not None and entry_cap < P:
        cap = max(int(entry_cap), 1)
        cap = (cap + CHUNK - 1) // CHUNK * CHUNK
        P = min(cap, P)

    inv_pos = None
    bin_impl = os.environ.get("FPC_BIN_IMPL", "sort")
    if bin_impl == "rank":
        sorted_tri, bin_start = _place_rank(tile_ids, T, n_tiles, P)
    elif bin_impl == "pallas":
        sorted_tri, bin_start = _place_pallas(tile_ids, T, n_tiles, P)
    else:
        # the gather-based gradient fold needs the inverse permutation
        want_inv = os.environ.get("FPC_FOLD_IMPL", "segment") == "gather"
        sorted_tri, bin_start, inv_pos = _place_sort(tile_ids, T, n_tiles,
                                                     P, want_inv=want_inv)

    rec = jnp.concatenate([data, jax.lax.stop_gradient(aux)], axis=1)
    sorted_rec = rec[sorted_tri]
    # Pad so every CHUNK-sized DMA window starting inside the live region
    # stays in bounds, then store TRANSPOSED (REC, P): the kernel DMAs
    # lane-aligned (REC, CHUNK) column blocks (Mosaic requires 128-aligned
    # last-dim slices) and reads coefficients as vectors, never scalars.
    pad_rows = CHUNK + (-sorted_rec.shape[0]) % CHUNK
    sorted_rec = jnp.concatenate(
        [sorted_rec, jnp.zeros((pad_rows, REC), sorted_rec.dtype)], axis=0)
    sorted_rec_t = sorted_rec.T  # (REC, P)

    # Global list: valid triangles too large for the window (fixed
    # MAX_GLOBAL rows; unused rows are zero). FPC_GLOBAL_IMPL=scatter
    # replaces the T-key sort with a prefix-count + one unique scatter —
    # cheaper at runtime, but OPT-IN: the first baseline bench compiled
    # after making it the default stalled the remote attach inside the
    # binning compile unit (2026-08-20), and a fresh scatter shape is the
    # prime suspect (platform notes: XLA scatter remote-compiles are
    # slow and uncached across processes).
    big = valid & ~fits
    if os.environ.get("FPC_GLOBAL_IMPL", "sort") == "scatter":
        rank = jnp.cumsum(big.astype(jnp.int32)) - 1
        pos = jnp.where(big, rank, MAX_GLOBAL)
        big_idx = jnp.full((MAX_GLOBAL,), T, jnp.int32).at[pos].set(
            jnp.arange(T, dtype=jnp.int32), mode="drop",
            unique_indices=True)
    else:
        big_idx = jnp.where(big, jnp.arange(T, dtype=jnp.int32), T)
        big_idx = jnp.concatenate(
            [big_idx, jnp.full((MAX_GLOBAL,), T, jnp.int32)])
        big_idx = jnp.sort(big_idx)[:MAX_GLOBAL]
    n_global = jnp.sum(big).astype(jnp.int32)
    n_global = jnp.minimum(n_global, MAX_GLOBAL)
    safe_big = jnp.minimum(big_idx, T - 1)
    grow = (big_idx < T)[:, None]
    global_rec = jnp.where(grow, rec[safe_big], 0.0)
    global_rec_t = global_rec.T  # (REC, MAX_GLOBAL)

    # Per-CHUNK-record tile-row ranges of the global list so tiles can
    # skip blocks whose triangles can't touch their rows.
    g_ty0 = jnp.where(big_idx < T, ty0[safe_big], gy)
    g_ty1 = jnp.where(big_idx < T, ty1[safe_big], -1)
    blk_min = jnp.min(g_ty0.reshape(-1, CHUNK), axis=1)
    blk_max = jnp.max(g_ty1.reshape(-1, CHUNK), axis=1)
    gblk_ty = jnp.stack([blk_min, blk_max]).astype(jnp.int32)

    return Bins(sorted_rec_t=sorted_rec_t, bin_start=bin_start,
                global_rec_t=global_rec_t, n_global=n_global.reshape(1),
                sorted_tri=sorted_tri, global_idx=big_idx, gblk_ty=gblk_ty,
                inv_pos=inv_pos)


# ---------------------------------------------------------------------------
# Stacked-batch binning (FPC_BATCH=stack)
# ---------------------------------------------------------------------------
#
# vmap lowers each Pallas call to a batch-sized while loop (~8 ms of loop
# overhead + ~6 ms of per-sample dynamic-slice glue per headline step —
# round-4b device trace). Instead of batching the KERNELS, the B samples
# are stacked VERTICALLY into one (B*ph, pw) virtual image:
#
#   * each sample's triangle records are y-shifted into its band of the
#     stack (c' = c - dy*b per edge plane, zc' = zc - dy*zy, aux screen
#     y-corners + dy) — a differentiable XLA transform, so autodiff
#     unshifts the record gradients with no manual chain rule;
#   * ONE key sort with global tile keys (tile_g * T + tri) bins all
#     samples into a single compacted live prefix — bin_start /
#     chunk_schedule / the grad kernel's live-prefix masking all hold
#     verbatim, and the per-sample entry caps pool into one global cap;
#   * the oversized-triangle lists compact into one MAX_GLOBAL buffer:
#     after the y-shift a triangle of sample b is geometrically disjoint
#     from every other sample's rows, so cross-sample coverage tests in
#     the kernel are no-ops by construction.
#
# Every kernel then runs ONCE on the stacked image (grid (B*gy, pgx))
# with an unchanged body; the texture backward additionally accumulates
# gtex across the whole batch in its VMEM scratch (one flush instead of
# B HBM roundtrips + an XLA cross-batch sum).

def shift_records_stacked(data_b: Array, aux_b: Array, sample_ph: int):
    """Differentiable per-sample y-shift into the stacked frame.

    ``data_b``/``aux_b`` are the vmapped (B, T, 16) triangle_setup /
    aux_records outputs at LOCAL (per-sample) screen coordinates;
    sample b's pixels live at stacked rows [b*sample_ph, (b+1)*sample_ph).
    A plane l = a x + b y_l + c evaluated at y_g = y_l + dy needs
    c' = c - dy * b; screen-corner y values shift by +dy.
    """
    B = data_b.shape[0]
    dy = (jnp.arange(B, dtype=jnp.float32) * sample_ph)[:, None]
    d = data_b
    data_s = jnp.stack(
        [d[..., 0], d[..., 1], d[..., 2] - dy * d[..., 1],
         d[..., 3], d[..., 4], d[..., 5] - dy * d[..., 4],
         d[..., 6], d[..., 7], d[..., 8] - dy * d[..., 7],
         d[..., 9], d[..., 10], d[..., 11] - dy * d[..., 10],
         d[..., 12], d[..., 13], d[..., 14], d[..., 15]], axis=-1)
    a = aux_b
    aux_s = jnp.stack(
        [a[..., 0], a[..., 1], a[..., 2], a[..., 3], a[..., 4], a[..., 5],
         a[..., 6], a[..., 7] + dy, a[..., 8], a[..., 9] + dy,
         a[..., 10], a[..., 11] + dy,
         a[..., 12], a[..., 13], a[..., 14], a[..., 15]], axis=-1)
    return data_s, aux_s


def bin_scene_stacked(pos_clip_b: Array, faces: Array, height: int,
                      width: int, aux_b: Array, entry_cap: int | None = None,
                      vtx_inc=None):
    """Stacked-batch triangle setup + one-sort binning (see section note).

    :param pos_clip_b: (B, V, 4) clip positions per sample.
    :param aux_b: (B, T, 16) LOCAL aux records (aux_records per sample).
    :param entry_cap: per-sample cap; the stacked prefix cap is B x it
        (samples pool the slack).
    :return: (data_s (B, T, 16) shifted differentiable records,
              aux_s (B, T, 16) shifted aux, Bins over the stacked image —
              feed ``fused_rasterize_from_bins(bins, B*ph, width)``).
        Bins.sorted_tri carries STACKED triangle ids (b*T + t, one live
        prefix); Bins.global_idx likewise.
    """
    B, _, _ = pos_clip_b.shape
    T = faces.shape[0]
    ph, pw = pad_resolution(height, width)
    gx = pw // TILE_W
    gy_s = ph // TILE_H
    nt_s = gy_s * gx
    n_tiles = B * nt_s
    if (n_tiles + 1) * T >= (1 << 31):
        raise ValueError(
            f"stacked binning key overflow: {n_tiles + 1} tiles x {T} "
            "triangles exceeds int32 keys; use the vmapped path")

    data_b, bbox_b, valid_b = jax.vmap(
        lambda pc: triangle_setup(pc, faces, height, width,
                                  vtx_inc=vtx_inc))(pos_clip_b)
    data_s, aux_s = shift_records_stacked(data_b, aux_b, ph)

    tx0, ty0l = bbox_b[..., 0], bbox_b[..., 1]
    tx1, ty1l = bbox_b[..., 2], bbox_b[..., 3]
    row0 = (jnp.arange(B, dtype=jnp.int32) * gy_s)[:, None]
    ty0 = ty0l + row0
    ty1 = ty1l + row0
    wx = tx1 - tx0 + 1
    wy = ty1 - ty0 + 1
    fits = (wx <= WINDOW_X) & (wy <= WINDOW_Y)

    K = WINDOW_Y * WINDOW_X
    k = jnp.arange(K, dtype=jnp.int32)
    dx = (k % WINDOW_X)[None, None, :]
    dyk = (k // WINDOW_X)[None, None, :]
    tx = tx0[..., None] + dx
    ty = ty0[..., None] + dyk
    pair_valid = ((valid_b & fits)[..., None]
                  & (dx < wx[..., None]) & (dyk < wy[..., None]))
    tile_ids = jnp.where(pair_valid, ty * gx + tx, n_tiles)   # (B, T, K)

    P_s = T * K
    if entry_cap is not None and entry_cap < P_s:
        cap = max(int(entry_cap), 1)
        cap = (cap + CHUNK - 1) // CHUNK * CHUNK
        P_s = min(cap, P_s)
    P = B * P_s

    # one global sort: key = tile_g * T + tri_local groups by stacked
    # tile with tri ascending inside each bin (same invariant as
    # _place_sort; samples share one live prefix)
    tri_l = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[None, :, None], tile_ids.shape)
    keys = jnp.sort((tile_ids * T + tri_l).reshape(-1))[:P]
    sorted_tile = keys // T
    bin_start = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    # stacked triangle id b*T + t (dead entries -> sentinel B*T)
    b_of = jnp.clip(sorted_tile // nt_s, 0, B - 1)
    sorted_tri = jnp.where(sorted_tile < n_tiles,
                           b_of * T + keys % T, B * T)

    rec = jnp.concatenate(
        [jax.lax.stop_gradient(data_s), jax.lax.stop_gradient(aux_s)],
        axis=-1).reshape(B * T, REC)
    sorted_rec = rec[jnp.minimum(sorted_tri, B * T - 1)]
    pad_rows = CHUNK + (-sorted_rec.shape[0]) % CHUNK
    sorted_rec = jnp.concatenate(
        [sorted_rec, jnp.zeros((pad_rows, REC), sorted_rec.dtype)], axis=0)
    sorted_rec_t = sorted_rec.T                              # (REC, P+pad)

    # compacted global (oversized) list across samples
    big = valid_b & ~fits                                    # (B, T)
    gid = (jnp.arange(B, dtype=jnp.int32)[:, None] * T
           + jnp.arange(T, dtype=jnp.int32)[None, :])
    big_key = jnp.where(big, gid, B * T).reshape(-1)
    big_idx = jnp.sort(jnp.concatenate(
        [big_key, jnp.full((MAX_GLOBAL,), B * T, jnp.int32)]))[:MAX_GLOBAL]
    n_global = jnp.minimum(jnp.sum(big), MAX_GLOBAL).astype(jnp.int32)
    safe_big = jnp.minimum(big_idx, B * T - 1)
    grow = (big_idx < B * T)[:, None]
    global_rec_t = jnp.where(grow, rec[safe_big], 0.0).T

    ty0f = ty0.reshape(-1)
    ty1f = ty1.reshape(-1)
    g_ty0 = jnp.where(big_idx < B * T, ty0f[safe_big], B * gy_s)
    g_ty1 = jnp.where(big_idx < B * T, ty1f[safe_big], -1)
    blk_min = jnp.min(g_ty0.reshape(-1, CHUNK), axis=1)
    blk_max = jnp.max(g_ty1.reshape(-1, CHUNK), axis=1)
    gblk_ty = jnp.stack([blk_min, blk_max]).astype(jnp.int32)

    bins = Bins(sorted_rec_t=sorted_rec_t, bin_start=bin_start,
                global_rec_t=global_rec_t, n_global=n_global.reshape(1),
                sorted_tri=sorted_tri, global_idx=big_idx, gblk_ty=gblk_ty,
                inv_pos=None)
    return data_s, aux_s, bins


# ----------------------------------------------------------------------------
# The kernels
# ----------------------------------------------------------------------------

# FPC_GX pads the tile-column count up to the given value. The headline
# width 1600px pads to gx = 13 — a PRIME, so tiles_per_program silently
# degrades the grad/texture kernels' intended mt=8 amortization to mt=1
# (round-4 VERDICT weak #3). FPC_GX=14 buys mt=7 for +7.7% padded width;
# the pad tiles are empty (no bin entries, zero cotangents), so every
# kernel's empty-tile fast path skips their real work.
_GX_MIN = int(os.environ.get("FPC_GX", "0"))


def pad_resolution(height: int, width: int):
    ph = (height + TILE_H - 1) // TILE_H * TILE_H
    pw = (width + TILE_W - 1) // TILE_W * TILE_W
    if _GX_MIN:
        pw = max(pw, _GX_MIN * TILE_W)
    return ph, pw


def tiles_per_program(gx: int, kind: str = "fwd") -> int:
    """Horizontally adjacent tiles handled by one kernel program.

    Per-program dispatch + block-DMA issue overhead is ~comparable to a
    single tile's real work for the scatter-style kernels (grad,
    texture), so those cover several tiles per program. The fused
    forward kernel is measurably FASTER at one tile per program (its
    chunk-prefetch pipeline already hides dispatch, and wide output
    blocks cost VMEM); measured on v5e at the 1600x1200 bench.
    The returned count must divide the tile-column count. Env override
    ``FPC_MT_FWD`` / ``FPC_MT_GRAD`` / ``FPC_MT_TEX`` for tuning."""
    env = os.environ.get(f"FPC_MT_{kind.upper()}")
    prefer = {"fwd": 1, "grad": 8, "tex": 8}[kind]
    if env is not None:
        prefer = int(env)
    for cand in range(min(prefer, gx), 0, -1):
        if gx % cand == 0:
            return cand
    return 1


def chunk_schedule(bin_start: Array, n_cols: int, n_tiles: int):
    """Flattened (tile, chunk) DMA schedule for cross-tile prefetching.

    :param bin_start: (n_tiles + 1,) bin offsets.
    :param n_cols: total record columns (sorted_rec_t.shape[1]).
    :return: (sched_start (n_tiles + 1,) i32 — schedule index of each
        tile's first chunk, with the total count in the last slot;
        sched_col (S,) i32 — 128-aligned column offset of each scheduled
        chunk, S a static bound, entries past the live count clamped
        in-range).
    """
    start_t = bin_start[:-1]
    end_t = bin_start[1:]
    cnt = end_t - start_t
    fc = start_t // CHUNK
    nch = jnp.where(cnt > 0, (end_t - 1) // CHUNK - fc + 1, 0)
    sched_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(nch).astype(jnp.int32)])
    # static bound: every live chunk window plus one boundary per tile
    S = n_cols // CHUNK + n_tiles
    ks = jnp.arange(S, dtype=jnp.int32)
    t_of_k = jnp.searchsorted(sched_start, ks, side="right"
                              ).astype(jnp.int32) - 1
    t_safe = jnp.clip(t_of_k, 0, n_tiles - 1)
    col = (fc[t_safe] + ks - sched_start[t_safe]) * CHUNK
    sched_col = jnp.clip(col, 0, n_cols - CHUNK).astype(jnp.int32)
    return sched_start, sched_col


_BIG = 3.0e38

# extra per-pixel planes emitted for the backward kernel (the gradient
# pass needs the winner's perspective weights and uv-corner differences;
# emitting them here costs one HBM write and saves the backward from
# streaming any triangle records at all)
N_EXTRA = 8               # D iw0 iw1 iw2 du02 du12 dv02 dv12


# Phase-A inner-loop implementation (FPC_PHASEA):
#   argmin — per-block cross-sublane argmin + strict-less merge into the
#            (2, TILE_H, TILE_W) winner planes (round-3-proven default).
#   slots  — per-sublane winner slots in VMEM, one cross-slot reduction
#            per tile (~6 fewer vector ops per block row); identical
#            winners (see _phasea_block). Opt-in until chip-validated:
#            kernel-structure changes risk the remote-compile stall class.
_PHASEA = os.environ.get("FPC_PHASEA", "argmin")


def _phasea_block(at, rec_base, lo, hi, ti, x_row, slots, acc):
    """Phase-A inner loop for one (SUB, REC) record block.

    In ``slots`` mode, ``slots`` is the (2, TILE_H, SUB, TILE_W) VMEM
    accumulator: slot s of row g holds the best (z, bin-entry index)
    among the records this tile has streamed through sublane s (entry
    index exact in f32 below 2^24). Keeping winners PER SUBLANE SLOT
    removes the two cross-sublane reductions + strict-less merge the
    argmin mode pays per row per block (~6 vector ops); one reduction
    per tile row at the end of phase A (:func:`_phasea_finish`) recovers
    the exact same winner: the globally-lowest entry index with minimal
    z always survives in its slot, because same-slot updates are
    strict-less (earlier = lower index wins ties) and cross-slot ties
    are broken by the final lowest-index-among-minimal-z reduction.

    In ``argmin`` mode the block's candidates are reduced across
    sublanes per row (tie-break: lowest entry index) and strict-less
    merged into the (2, TILE_H, TILE_W) ``acc`` winner planes.

    Op-count choices (the kernel is VPU-issue bound): the live-range
    ``active`` mask folds into one c-coefficient bias instead of a
    per-row predicate; the (n, TILE_W) products a_i * x are hoisted out
    of the row loop (x is row-invariant — each row then costs one
    broadcast add per plane, bit-identical to the full evaluation);
    coverage is min3(l) >= 0.
    """
    a0 = at[:, 0:1]; b0 = at[:, 1:2]; c0 = at[:, 2:3]
    a1 = at[:, 3:4]; b1 = at[:, 4:5]; c1 = at[:, 5:6]
    a2 = at[:, 6:7]; b2 = at[:, 7:8]; c2 = at[:, 8:9]
    zx = at[:, 9:10]; zy = at[:, 10:11]; zc = at[:, 11:12]

    n = at.shape[0]
    rec_iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    rec = rec_base + rec_iota
    active = (rec >= lo) & (rec < hi)                     # (n, 1)
    rec_f = rec.astype(jnp.float32)
    # Out-of-range records: bias one edge plane to -inf — coverage then
    # fails for every pixel with no per-row mask op.
    c0 = jnp.where(active, c0, jnp.float32(-1e30))

    # Row 0 planes, then INCREMENTAL row updates (l(y+1) = l(y) + b): one
    # (n, 128) add per plane per row instead of re-evaluating the affine
    # form — the (n, 1) scalar-shaped ops cost full vector registers on
    # the VPU, so folding them away cuts phase A's issue count ~40%.
    # f32 drift over 7 accumulated adds is ~ulp-level; borderline
    # coverage pixels may differ from the exact evaluation at the same
    # rate the scan/pallas parity tests already allow.
    y0 = (ti * TILE_H).astype(jnp.float32) + 0.5          # scalar
    l0 = a0 * x_row + (b0 * y0 + c0)                      # (n, 128)
    l1 = a1 * x_row + (b1 * y0 + c1)
    l2 = a2 * x_row + (b2 * y0 + c2)
    z = zx * x_row + (zy * y0 + zc)

    z_rows, i_rows = [], []
    for g in range(TILE_H):
        covered = ((jnp.minimum(jnp.minimum(l0, l1), l2) >= 0.0)
                   & (z >= -1.0) & (z <= 1.0))
        zm = jnp.where(covered, z, _BIG)
        if _PHASEA == "slots":
            prev = slots[0, g]                             # (SUB, 128)
            better = zm < prev
            slots[1, g] = jnp.where(better, rec_f, slots[1, g])
            slots[0, g] = jnp.where(better, zm, prev)
        else:
            zmin = jnp.min(zm, axis=0, keepdims=True)      # (1, 128)
            # tie-break: lowest entry index == lowest triangle id
            im = jnp.where(zm <= zmin, rec_f, _BIG)
            z_rows.append(zmin)
            i_rows.append(jnp.min(im, axis=0, keepdims=True))
        if g + 1 < TILE_H:
            l0 = l0 + b0
            l1 = l1 + b1
            l2 = l2 + b2
            z = z + zy
    if _PHASEA != "slots":
        # strict-less z merge into the winner planes
        z_new = jnp.concatenate(z_rows, axis=0)            # (8, 128)
        i_new = jnp.concatenate(i_rows, axis=0)
        better = z_new < acc[0]
        acc[0] = jnp.where(better, z_new, acc[0])
        acc[1] = jnp.where(better, i_new, acc[1])


def _phasea_finish(slots, acc):
    """Per-tile cross-slot reduction of the phase-A winner slots into the
    (2, TILE_H, TILE_W) winner planes: minimal z, then the lowest entry
    index among slots tied at that z (the exact tie order of a strict
    per-record scan — see _phasea_block)."""
    z_rows, i_rows = [], []
    for g in range(TILE_H):
        zs = slots[0, g]                                   # (SUB, 128)
        zmin = jnp.min(zs, axis=0, keepdims=True)          # (1, 128)
        im = jnp.where(zs <= zmin, slots[1, g], _BIG)
        i_rows.append(jnp.min(im, axis=0, keepdims=True))
        z_rows.append(zmin)
    acc[0] = jnp.concatenate(z_rows, axis=0)
    acc[1] = jnp.concatenate(i_rows, axis=0)


def _split3_bf16(x):
    """f32 -> three bf16 planes with x ~= hi + mid + lo to ~2^-24 rel.

    A one-hot matmul against the three planes (one MXU pass each)
    reconstructs the f32 gather exactly to f32 precision at roughly half
    the cost of the multi-pass HIGHEST f32 emulation."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


# FPC_FWD_SPLITS=2 reconstructs phase-B record gathers from only the
# hi+mid bf16 planes (2 MXU passes per gather instead of 3): ~2^-17
# relative error on the gathered record fields — ~0.01 px on screen
# coordinates, ~0.008 texel on 1024^2 uv — instead of exact f32.
# OPT-IN: phase B is the fused forward kernel's dominant MXU cost, but
# the primal render is no longer bit-exact under this knob (parity test
# bounds the error; keep 3 for exactness).
_FWD_SPLITS = int(os.environ.get("FPC_FWD_SPLITS", "3"))

# FPC_PHASEB_SKIP=1 gates each phase-B chunk (and global block) on the
# tile's winner-entry range [min, max] resolved in phase A — chunks no
# pixel's winner falls into contribute an all-zero one-hot, so their
# gather matmuls are pure waste. Bit-identical output; opt-in until
# chip-validated (round-4 protocol).
_PHASEB_SKIP = os.environ.get("FPC_PHASEB_SKIP", "0") == "1"


def _split_fwd(x):
    return _split3_bf16(x)[:_FWD_SPLITS]


def _onehot_gather(parts, oh):
    """sum_i parts[i] @ oh with bf16 single-pass matmuls, f32 accumulate.

    :param parts: three (REC, CHUNK) bf16 planes from _split3_bf16.
    :param oh: (CHUNK, N) bf16 one-hot (exactly representable).
    """
    acc = None
    for p in parts:
        f = jax.lax.dot_general(p, oh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = f if acc is None else acc + f
    return acc


def _sched_dma(sched_col_ref, sorted_hbm, chunk_vmem, dma_sem, k):
    """DMA descriptor for the k-th scheduled bin chunk (4-slot rotation)."""
    col = pl.multiple_of(sched_col_ref[k], CHUNK)
    slot = jax.lax.rem(k, 4)
    return pltpu.make_async_copy(
        sorted_hbm.at[:, pl.ds(col, CHUNK)],
        chunk_vmem.at[slot], dma_sem.at[slot])


def _fused_kernel(gx: int, gy: int, mt: int, gbase: int, n_chan: int,
                  tex_geom, aa_geom, *refs):
    """Two-phase fused rasterization.

    Phase A streams the tile's bin and resolves only (depth, winning
    entry index) — the minimal per-record work. Phase B streams the bin a
    second time and *gathers* the winner's full 32-float record per pixel
    with one-hot MXU matmuls (records x one-hot -> per-pixel fields), then
    evaluates every payload plane densely once per tile. This keeps the
    per-record inner loop at ~15 VPU ops and moves all payload math off
    the (record x pixel) product entirely.

    Chunk DMAs are pipelined ACROSS tiles: most bins span one chunk, so a
    per-tile start->wait would expose the full HBM latency ~once per live
    tile. Instead the flattened (tile, chunk) schedule is precomputed
    XLA-side (sched_start/sched_col) and the consumer of schedule entry k
    starts entry k + 2 into a 4-slot rotation — entries k+1 and k+2 are
    always in flight while k is consumed, and a <=2-chunk bin's slots
    survive untouched through phase B (the cached path).

    With ``n_chan`` > 0 the kernel ALSO bilinear-samples an entire
    VMEM-resident texture at the resolved (tu, tv) — the texture stage
    fused into phase B's dense pass (wrap boundary; same hat-matmul math
    as texture_tpu, patch origins derived in-kernel from the tile's
    coordinate extrema). Extra refs: bg scalar-prefetch, tex HBM input,
    n_chan colour outputs, resident-texture scratch + its DMA semaphore.
    """
    aa = aa_geom is not None
    aa_refs = aah_ref = aav_ref = hA = vA = None
    if n_chan:
        (bin_start_ref, n_global_ref, gblk_ty_ref, sched_start_ref,
         sched_col_ref, bg_ref, sorted_hbm, global_hbm, tex_hbm,
         id_out_ref, entry_out_ref, payload_out_ref, extra_out_ref,
         *rest) = refs
        colour_refs = rest[:n_chan]
        rest = rest[n_chan:]
        if aa:
            aa_refs = rest[:n_chan]
            aah_ref, aav_ref = rest[n_chan], rest[n_chan + 1]
            rest = rest[n_chan + 2:]
        (chunk_vmem, global_vmem, acc, slots, fvm, bbuf_vmem, tex_vmem,
         *rest) = rest
        if aa:
            hA, vA = rest[0], rest[1]
            rest = rest[2:]
        dma_sem, bsem, global_sem, tex_sem = rest
    else:
        (bin_start_ref, n_global_ref, gblk_ty_ref, sched_start_ref,
         sched_col_ref, sorted_hbm, global_hbm,
         id_out_ref, entry_out_ref, payload_out_ref, extra_out_ref,
         chunk_vmem, global_vmem, acc, slots, fvm, bbuf_vmem,
         dma_sem, bsem, global_sem) = refs
        colour_refs = ()
        bg_ref = tex_vmem = tex_sem = tex_hbm = None

    ti = pl.program_id(0)
    pj = pl.program_id(1)
    n_global = n_global_ref[0]
    n_sched = sched_start_ref[gx * gy]

    # First program: load the (small) global-triangle list — and, in the
    # fused-texture mode, the whole texture — into persistent VMEM and
    # bootstrap the chunk prefetch pipeline.
    @pl.when((ti == 0) & (pj == 0))
    def _():
        if n_chan:
            tdma = pltpu.make_async_copy(tex_hbm, tex_vmem, tex_sem)
            tdma.start()

        @pl.when(n_global > 0)
        def _():
            dma = pltpu.make_async_copy(global_hbm, global_vmem, global_sem)
            dma.start()
            dma.wait()

        @pl.when(n_sched > 0)
        def _():
            _sched_dma(sched_col_ref, sorted_hbm, chunk_vmem, dma_sem,
                       0).start()

        @pl.when(n_sched > 1)
        def _():
            _sched_dma(sched_col_ref, sorted_hbm, chunk_vmem, dma_sem,
                       1).start()

        if n_chan:
            tdma.wait()

    # does any global (oversized) triangle block touch this tile row?
    any_glob = n_global < 0  # False, as a traced bool
    for gb in range(MAX_GLOBAL // CHUNK):
        any_glob = any_glob | ((gb * CHUNK < n_global)
                               & (gblk_ty_ref[0, gb] <= ti)
                               & (ti <= gblk_ty_ref[1, gb]))

    for sub in range(mt):
        cols = slice(sub * TILE_W, (sub + 1) * TILE_W)
        tj = pj * mt + sub
        tile_idx = ti * gx + tj
        start = bin_start_ref[tile_idx]
        end = bin_start_ref[tile_idx + 1]
        count = end - start
        s0 = sched_start_ref[tile_idx]
        work = (count > 0) | any_glob

        # fast path: empty tile — constant outputs, skip both phases
        @pl.when(jnp.logical_not(work))
        def _(cols=cols, tj=tj):
            id_out_ref[:, cols] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)
            entry_out_ref[:, cols] = jnp.full((TILE_H, TILE_W), -1.0)
            for i in range(N_PAYLOAD):
                payload_out_ref[i, :, cols] = jnp.zeros((TILE_H, TILE_W),
                                                        jnp.float32)
            for i in range(N_EXTRA):
                extra_out_ref[i, :, cols] = jnp.zeros((TILE_H, TILE_W),
                                                      jnp.float32)
            for c in range(n_chan):
                colour_refs[c][:, cols] = jnp.full((TILE_H, TILE_W),
                                                   bg_ref[c])
            if aa:
                _aa_empty_tile(ti, tj, cols, aa_geom[0], aa_geom[1],
                               n_chan, bg_ref, aa_refs, aah_ref, aav_ref,
                               hA, vA)

        @pl.when(work)
        def _do_tile(cols=cols, tj=tj, start=start, end=end, count=count,
                     s0=s0):
            _fused_tile_body(gx, gbase, ti, tj, cols, start, end, count,
                             n_global, gblk_ty_ref, sched_col_ref, s0,
                             n_sched, sorted_hbm,
                             id_out_ref, entry_out_ref, payload_out_ref,
                             extra_out_ref, chunk_vmem, global_vmem, acc,
                             slots, fvm, bbuf_vmem, dma_sem, bsem,
                             n_chan, tex_geom, tex_vmem, colour_refs,
                             aa_refs, aah_ref, aav_ref, hA, vA, aa_geom)


def _fused_tile_body(gx, gbase, ti, tj, cols, start, end, count, n_global,
                     gblk_ty_ref, sched_col_ref, s0, n_sched, sorted_hbm,
                     id_out_ref, entry_out_ref, payload_out_ref,
                     extra_out_ref, chunk_vmem, global_vmem, acc, slots,
                     fvm, bbuf_vmem, dma_sem, bsem,
                     n_chan=0, tex_geom=None, tex_vmem=None,
                     colour_refs=(), aa_refs=None, aah_ref=None,
                     aav_ref=None, hA=None, vA=None, aa_geom=None):
    """Both kernel phases + payload resolve for one non-empty tile
    (``cols`` = this sub-tile's lane slice of the program's block)."""
    # x along lanes (shared by all tile rows).
    x_row = (tj * TILE_W
             + jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1)
             ).astype(jnp.float32) + 0.5                       # (1, 128)

    if _PHASEA == "slots":
        # init the per-sublane winner slots: z = BIG, entry idx = BIG
        # (final reduction and downstream hit mask treat BIG as miss)
        slots[...] = jnp.full((2, TILE_H, SUB, TILE_W), _BIG)
    else:
        # init winner planes: z = BIG, entry idx = -1 (matches nothing)
        acc[0] = jnp.full((TILE_H, TILE_W), _BIG)
        acc[1] = jnp.full((TILE_H, TILE_W), -1.0)

    first_chunk = start // CHUNK
    n_chunks = jnp.where(count > 0,
                         (end - 1) // CHUNK - first_chunk + 1, 0)

    # ---- phase A: binned records, cross-tile prefetched streaming ----
    def chunk_a(ci, _):
        k = s0 + ci
        slot = jax.lax.rem(k, 4)
        _sched_dma(sched_col_ref, sorted_hbm, chunk_vmem, dma_sem, k).wait()
        col0 = (first_chunk + ci) * CHUNK
        at_full = chunk_vmem[slot].T                      # (CHUNK, REC)
        for sb in range(CHUNK // SUB):
            sub_base = col0 + sb * SUB

            @pl.when((sub_base < end) & (sub_base + SUB > start))
            def _():
                at = at_full[sb * SUB:(sb + 1) * SUB, :]
                _phasea_block(at, sub_base, start, end, ti, x_row, slots,
                              acc)

        @pl.when(k + 2 < n_sched)
        def _():
            _sched_dma(sched_col_ref, sorted_hbm, chunk_vmem, dma_sem,
                       k + 2).start()

        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_a, 0)

    # ---- phase A: global (oversized) triangles, row-range predicated ----
    for gb in range(MAX_GLOBAL // CHUNK):
        blk_min = gblk_ty_ref[0, gb]
        blk_max = gblk_ty_ref[1, gb]

        @pl.when((gb * CHUNK < n_global) & (blk_min <= ti)
                 & (ti <= blk_max))
        def _():
            at = global_vmem[:, pl.ds(gb * CHUNK, CHUNK)].T
            for sb in range(CHUNK // SUB):
                _phasea_block(at[sb * SUB:(sb + 1) * SUB, :],
                              gbase + gb * CHUNK + sb * SUB, gbase,
                              gbase + n_global, ti, x_row, slots, acc)

    if _PHASEA == "slots":
        _phasea_finish(slots, acc)
    acci = acc[1]                                          # (8, 128)
    if _PHASEB_SKIP:
        # winner-entry range: phase-B chunks outside it gather all-zero
        # one-hots — skip their matmuls entirely (bit-identical)
        hit_a = acc[0] < _BIG
        win_lo = jnp.min(jnp.where(hit_a, acci, _BIG))
        win_hi = jnp.max(jnp.where(hit_a, acci, -1.0))

    # ---- phase B: gather the winner's record per pixel (MXU one-hot) ----
    fvm[:] = jnp.zeros((TILE_H, REC, TILE_W), jnp.float32)

    # bins spanning <= 2 chunks (the typical case) are still resident in
    # the 4-slot rotation from phase A (in-flight prefetches k+1, k+2 land
    # in the other two slots) — skip the re-DMA entirely; longer bins
    # re-stream through a separate double buffer so the prefetch pipeline
    # is never disturbed.
    cached = n_chunks <= 2

    def bdma(bslot, ci):
        col0 = pl.multiple_of((first_chunk + ci) * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            sorted_hbm.at[:, pl.ds(col0, CHUNK)],
            bbuf_vmem.at[bslot], bsem.at[bslot])

    @pl.when((n_chunks > 0) & jnp.logical_not(cached))
    def _():
        bdma(0, 0).start()

    def chunk_b(ci, _):
        bslot = jax.lax.rem(ci, 2)

        @pl.when(jnp.logical_not(cached))
        def _():
            @pl.when(ci + 1 < n_chunks)
            def _():
                bdma(jax.lax.rem(ci + 1, 2), ci + 1).start()

            bdma(bslot, ci).wait()

        col0 = (first_chunk + ci) * CHUNK

        def gather_chunk(col0=col0, bslot=bslot, ci=ci):
            kslot = jax.lax.rem(s0 + ci, 4)
            chunk = jnp.where(cached, chunk_vmem[kslot],
                              bbuf_vmem[bslot])           # (REC, CHUNK)
            parts = _split_fwd(chunk)
            col_f = (col0
                     + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
                     ).astype(jnp.float32)
            for g in range(TILE_H):
                oh = (col_f == acci[g:g + 1, :]).astype(jnp.bfloat16)
                fvm[g] = fvm[g] + _onehot_gather(parts, oh)  # (REC, 128)

        if _PHASEB_SKIP:
            c0f = col0.astype(jnp.float32)

            @pl.when((c0f <= win_hi) & (c0f + CHUNK > win_lo))
            def _():
                gather_chunk()
        else:
            gather_chunk()
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_b, 0)

    # ---- phase B: global list ----
    for gb in range(MAX_GLOBAL // CHUNK):
        blk_min = gblk_ty_ref[0, gb]
        blk_max = gblk_ty_ref[1, gb]
        gcond = ((gb * CHUNK < n_global) & (blk_min <= ti)
                 & (ti <= blk_max))
        if _PHASEB_SKIP:
            g0 = float(gbase + gb * CHUNK)
            gcond = gcond & (g0 <= win_hi) & (g0 + CHUNK > win_lo)

        @pl.when(gcond)
        def _():
            gchunk = global_vmem[:, pl.ds(gb * CHUNK, CHUNK)]
            parts = _split_fwd(gchunk)
            col_f = (gbase + gb * CHUNK
                     + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
                     ).astype(jnp.float32)
            for g in range(TILE_H):
                oh = (col_f == acci[g:g + 1, :]).astype(jnp.bfloat16)
                fvm[g] = fvm[g] + _onehot_gather(parts, oh)

    # ---- dense payload evaluation from the gathered per-pixel records ----
    accz = acc[0]
    hit = accz < _BIG
    pay_rows = [[] for _ in range(N_PAYLOAD)]
    ext_rows = [[] for _ in range(N_EXTRA)]
    tid_rows = []
    for g in range(TILE_H):
        F = fvm[g]                                         # (REC, 128)
        f = lambda k: F[k:k + 1, :]                        # (1, 128)
        y = (ti * TILE_H + g).astype(jnp.float32) + 0.5
        l0 = f(0) * x_row + (f(1) * y + f(2))
        l1 = f(3) * x_row + (f(4) * y + f(5))
        l2 = f(6) * x_row + (f(7) * y + f(8))
        iw0 = 1.0 / jnp.where(jnp.abs(f(13)) > _W_EPS, f(13), 1.0)
        iw1 = 1.0 / jnp.where(jnp.abs(f(14)) > _W_EPS, f(14), 1.0)
        iw2 = 1.0 / jnp.where(jnp.abs(f(15)) > _W_EPS, f(15), 1.0)
        d0 = l0 * iw0
        d1 = l1 * iw1
        d2 = l2 * iw2
        D = d0 + d1 + d2
        rD = 1.0 / jnp.where(jnp.abs(D) > _AREA_EPS, D, 1.0)
        up = d0 * rD
        vp = d1 * rD
        du02 = f(16) - f(20)
        du12 = f(18) - f(20)
        dv02 = f(17) - f(21)
        dv12 = f(19) - f(21)
        tu = up * du02 + vp * du12 + f(20)
        tv = up * dv02 + vp * dv12 + f(21)

        pay_rows[0].append(up)
        pay_rows[1].append(vp)
        pay_rows[2].append(up)        # placeholder; z written from accz
        pay_rows[3].append(tu)
        pay_rows[4].append(tv)
        for q in range(6):
            pay_rows[5 + q].append(f(22 + q))
        for q in range(3):
            pay_rows[11 + q].append(f(28 + q))
        ext_rows[0].append(D)
        ext_rows[1].append(iw0)
        ext_rows[2].append(iw1)
        ext_rows[3].append(iw2)
        ext_rows[4].append(du02)
        ext_rows[5].append(du12)
        ext_rows[6].append(dv02)
        ext_rows[7].append(dv12)
        tid_rows.append(f(12))

    pay_planes = []
    for i in range(N_PAYLOAD):
        if i == 2:
            pay_planes.append(jnp.where(hit, accz, 0.0))
        else:
            pay_planes.append(jnp.concatenate(pay_rows[i], axis=0))
        payload_out_ref[i, :, cols] = pay_planes[i]
    for i in range(N_EXTRA):
        extra_out_ref[i, :, cols] = jnp.concatenate(ext_rows[i], axis=0)
    tidp = jnp.concatenate(tid_rows, axis=0)
    idp_f = jnp.where(hit, tidp, -1.0)
    id_out_ref[:, cols] = idp_f.astype(jnp.int32)
    entry_out_ref[:, cols] = jnp.where(hit, acci, -1.0)

    if n_chan:
        col_planes = _sample_tile(n_chan, tex_geom, tex_vmem, cols,
                                  pay_rows[3], pay_rows[4])
        for c in range(n_chan):
            colour_refs[c][:, cols] = col_planes[c]
        if aa_refs is not None:
            planes = ([idp_f, pay_planes[2]] + pay_planes[5:11]
                      + pay_planes[11:14] + col_planes)
            _aa_tile(ti, tj, cols, aa_geom[0], aa_geom[1], planes, n_chan,
                     aa_refs, aah_ref, aav_ref, hA, vA)


def _sample_tile(n_chan, tex_geom, tex_vmem, cols, tu_rows, tv_rows):
    """Fused-texture tail of the tile pass: bilinear wrap sampling of the
    resident texture at the tile's resolved uv — the same hat-matmul math
    as texture_tpu._fwd_kernel, with the patch/sub-patch origins derived
    in-kernel from the tile's coordinate extrema (the per-tile c0 and
    per-row t0r the separate path precomputes XLA-side). Background/miss
    pixels carry uv (0, 0) and sample the same value the separate path's
    background write produces (wrap sample at texel -0.5)."""
    from fpc_diffrend_tpu.ops.pallas.texture_tpu import (
        FWD_PRECISION, PATCH_W, SUB_H, _TEX_IMPL, _bilin_x, _wrow, _xsel)

    th, tw, he, we = tex_geom
    tu_t = jnp.concatenate(tu_rows, axis=0)               # (8, 128)
    tv_t = jnp.concatenate(tv_rows, axis=0)
    s = tu_t * tw - 0.5
    t = tv_t * th - 0.5
    s = s - jnp.floor(s / tw) * tw                        # mod(s, tw)
    t = t - jnp.floor(t / th) * th

    def remap(c, size):
        # wrap-seam fix (texture_tpu._seam_remap on one tile)
        mn = jnp.min(c)
        mx = jnp.max(c)
        shifted = jnp.where(c < 0.5 * size, c + size, c)
        mns = jnp.min(shifted)
        mxs = jnp.max(shifted)
        return jnp.where((mxs - mns) < (mx - mn), shifted, c)

    s = remap(s, tw)
    t = remap(t, th)
    t = jnp.clip(t, 0.0, he - 1.001)

    c0 = jnp.clip(((jnp.floor(jnp.min(s)).astype(jnp.int32) - 1)
                   // TILE_W) * TILE_W, 0, we - PATCH_W)
    ls = jnp.clip(s - c0.astype(jnp.float32), 0.0, PATCH_W - 1.001)
    c0 = pl.multiple_of(c0, TILE_W)

    col_rows = [[] for _ in range(n_chan)]
    for g in range(TILE_H):
        t_row = t[g:g + 1, :]
        t0r = jnp.clip((jnp.floor(jnp.min(t_row)).astype(jnp.int32)
                        // TILE_H) * TILE_H, 0, he - SUB_H)
        ltr = jnp.clip(t_row - t0r.astype(jnp.float32), 0.0, SUB_H - 1.001)
        t0r = pl.multiple_of(t0r, TILE_H)
        wy = _wrow(ltr, SUB_H)                            # (SUB_H, 128)
        if _TEX_IMPL == "onehot":
            oh0, fs = _xsel(ls[g:g + 1, :], PATCH_W)
        else:
            wx = _wrow(ls[g:g + 1, :], PATCH_W)           # (PW, 128)
        for c in range(n_chan):
            subp = tex_vmem[c, pl.ds(t0r, SUB_H), pl.ds(c0, PATCH_W)]
            if _TEX_IMPL == "onehot":
                b = _bilin_x(subp, oh0, fs)
            else:
                b = jnp.dot(subp, wx, preferred_element_type=jnp.float32,
                            precision=FWD_PRECISION)      # (SUB_H, 128)
            col_rows[c].append(jnp.sum(wy * b, axis=0, keepdims=True))
    return [jnp.concatenate(col_rows[c], axis=0) for c in range(n_chan)]


# ----------------------------------------------------------------------------
# Fused antialias tail (FPC_AA_FUSE)
# ----------------------------------------------------------------------------
#
# With the texture fused into phase B, every plane the silhouette
# antialias pass reads (id, z, screen corners, neighbor ids, colour) is
# already resolved in registers at the end of the tile body — evaluating
# the pair blend HERE removes the separate AA kernel's packed-plane
# build and its 3x neighbor-block HBM reads from the forward entirely.
# The separate kernel reads right/down neighbor blocks for the b-side of
# boundary pairs; the fused tail instead anchors boundary pairs at the
# RIGHT/BOTTOM tile, whose a-side (the previous tile's last column/row)
# arrives through VMEM carries (the TPU grid is sequential row-major).
# The a-side colour delta of a boundary pair belongs to the PREVIOUS
# tile's already-written output, so it is routed to two small side
# outputs (one lane per tile column / one row per tile row) that XLA
# folds back into the image; the backward reuses the separate AA
# backward kernel (the pair function is symmetric in its two sides, so
# anchor choice does not change totals — see ops/rasterize.py).

def _aa_lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)


def _aa_centers(ti, tj):
    x = (tj * TILE_W + _aa_lane_iota()).astype(jnp.float32) + 0.5
    y = (ti * TILE_H
         + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
         ).astype(jnp.float32) + 0.5
    return x, y


def _aa_tile(ti, tj, cols, height, width, planes, C,
             aa_refs, aah_ref, aav_ref, hA, vA):
    """Antialias one tile's resolved planes; see the section comment.

    :param planes: 11 + C lists of (TILE_H, TILE_W) planes in the packed
        AA order [id, z, x0 y0 x1 y1 x2 y2, n0 n1 n2, colour...]
        (antialias_tpu plane indices _ID/_Z/_V0/_N0/_C0).
    :param aah_ref: (C, TILE_H, 128) side output block shared by the tile
        row — lane j accumulates the a-side colour delta of the boundary
        pair between tiles (i, j-1) and (i, j).
    :param aav_ref: (C, TILE_H, bw) per-tile side block — row 0 carries
        the a-side delta of the boundary pair with the tile above.
    :param hA / vA: (NPL, TILE_H, 1) / (gx, NPL, 1, TILE_W) VMEM carries
        of the previous tile's last column / previous row band's last
        row (written by every tile, including empty ones).
    """
    from fpc_diffrend_tpu.ops.pallas.antialias_tpu import _pair_delta

    NPL = len(planes)
    x, y = _aa_centers(ti, tj)
    lane = _aa_lane_iota()
    row = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    acc = [planes[11 + c] for c in range(C)]

    # ---- horizontal: boundary pair with the left tile (carried a-side)
    aL = [hA[k] for k in range(NPL)]                       # (TILE_H, 1)
    bL = [p[:, :1] for p in planes]
    xb = (tj * TILE_W).astype(jnp.float32)
    yc = y[:, :1]
    daL, dbL = _pair_delta(aL, bL, xb - 0.5, yc, xb + 0.5, yc, C)
    gateL = (tj > 0) & (tj * TILE_W < width)

    # ---- horizontal: interior pairs (last lane's pair belongs to the
    # next tile — masked here, evaluated there via the carry)
    b_h = [jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1) for p in planes]
    m_h = ((x - 0.5) < width - 1) & (lane < TILE_W - 1)
    da, db = _pair_delta(planes, b_h, x, y, x + 1.0, y, C)
    for c in range(C):
        dbm = jnp.where(m_h, db[c], 0.0)
        fill = jnp.where(gateL, dbL[c], 0.0)
        acc[c] = (acc[c] + jnp.where(m_h, da[c], 0.0)
                  + jnp.concatenate([fill, dbm[:, :-1]], axis=1))

    # a-side boundary delta -> side accumulator lane tj (zeroed at the
    # start of each tile row; the block index is constant along the row)
    oh_lane = (lane[:1, :] == tj).astype(jnp.float32)      # (1, TILE_W)

    @pl.when(tj == 0)
    def _():
        for c in range(C):
            aah_ref[c] = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    for c in range(C):
        aah_ref[c] = aah_ref[c] + jnp.where(gateL, daL[c], 0.0) * oh_lane

    # ---- vertical: boundary pair with the tile above (carried a-side)
    aT = [vA[tj, k] for k in range(NPL)]                   # (1, TILE_W)
    bT = [p[:1, :] for p in planes]
    yb = (ti * TILE_H).astype(jnp.float32)
    xr = x[:1, :]
    daT, dbT = _pair_delta(aT, bT, xr, yb - 0.5, xr, yb + 0.5, C)
    gateT = (ti > 0) & (ti * TILE_H < height)

    # ---- vertical: interior pairs
    b_v = [jnp.concatenate([p[1:, :], p[-1:, :]], axis=0) for p in planes]
    m_v = ((y - 0.5) < height - 1) & (row < TILE_H - 1)
    da, db = _pair_delta(planes, b_v, x, y, x, y + 1.0, C)
    zero7 = jnp.zeros((TILE_H - 1, TILE_W), jnp.float32)
    for c in range(C):
        dbm = jnp.where(m_v, db[c], 0.0)
        fill = jnp.where(gateT, dbT[c], 0.0)
        acc[c] = (acc[c] + jnp.where(m_v, da[c], 0.0)
                  + jnp.concatenate([fill, dbm[:-1, :]], axis=0))
        aa_refs[c][:, cols] = acc[c]
        aav_ref[c, :, cols] = jnp.concatenate(
            [jnp.where(gateT, daT[c], 0.0), zero7], axis=0)

    # ---- carries for the right neighbor / the tile below
    for k in range(NPL):
        hA[k] = planes[k][:, -1:]
        vA[tj, k] = planes[k][-1:, :]


def _aa_empty_tile(ti, tj, cols, height, width, C, bg_ref,
                   aa_refs, aah_ref, aav_ref, hA, vA):
    """Fused-AA handling for the empty-tile fast path: the tile's own
    planes are the background constants (id -1, z/corners/neighbors 0 —
    exactly the payload zeros the fast path writes), so interior pairs
    are identically zero and only the two boundary pairs + carries
    remain."""
    from fpc_diffrend_tpu.ops.pallas.antialias_tpu import _pair_delta

    NPL = 11 + C

    def const_planes(shape):
        p = [jnp.full(shape, -1.0)] + [jnp.zeros(shape, jnp.float32)
                                       for _ in range(10)]
        return p + [jnp.full(shape, bg_ref[c]) for c in range(C)]

    lane = _aa_lane_iota()
    y = (ti * TILE_H
         + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
         ).astype(jnp.float32) + 0.5

    # horizontal boundary (left tile covered, this side background)
    aL = [hA[k] for k in range(NPL)]
    bL = const_planes((TILE_H, 1))
    xb = (tj * TILE_W).astype(jnp.float32)
    yc = y[:, :1]
    daL, dbL = _pair_delta(aL, bL, xb - 0.5, yc, xb + 0.5, yc, C)
    gateL = (tj > 0) & (tj * TILE_W < width)

    @pl.when(tj == 0)
    def _():
        for c in range(C):
            aah_ref[c] = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    oh_lane = (lane[:1, :] == tj).astype(jnp.float32)
    for c in range(C):
        aah_ref[c] = aah_ref[c] + jnp.where(gateL, daL[c], 0.0) * oh_lane

    # vertical boundary
    aT = [vA[tj, k] for k in range(NPL)]
    bT = const_planes((1, TILE_W))
    yb = (ti * TILE_H).astype(jnp.float32)
    xr = (tj * TILE_W + lane[:1, :]).astype(jnp.float32) + 0.5
    daT, dbT = _pair_delta(aT, bT, xr, yb - 0.5, xr, yb + 0.5, C)
    gateT = (ti > 0) & (ti * TILE_H < height)

    zero7 = jnp.zeros((TILE_H - 1, TILE_W), jnp.float32)
    zcol = jnp.zeros((TILE_H, TILE_W - 1), jnp.float32)
    for c in range(C):
        fillL = jnp.where(gateL, dbL[c], 0.0)
        fillT = jnp.where(gateT, dbT[c], 0.0)
        aa_refs[c][:, cols] = (
            jnp.full((TILE_H, TILE_W), bg_ref[c])
            + jnp.concatenate([fillL, zcol], axis=1)
            + jnp.concatenate([fillT, zero7], axis=0))
        aav_ref[c, :, cols] = jnp.concatenate(
            [jnp.where(gateT, daT[c], 0.0), zero7], axis=0)

    colh = const_planes((TILE_H, 1))
    colv = const_planes((1, TILE_W))
    for k in range(NPL):
        hA[k] = colh[k]
        vA[tj, k] = colv[k]


# ----------------------------------------------------------------------------
# Public entry
# ----------------------------------------------------------------------------

def bin_scene(pos_clip: Array, faces: Array, height: int, width: int,
              aux: Array | None = None, entry_cap: int | None = None,
              vtx_inc=None):
    """Triangle setup + binning for a render target; shared between the
    visibility and gradient kernels.

    :param aux: optional (T, 16) auxiliary rows (see aux_records).
    :param entry_cap: see bin_triangles.
    :param vtx_inc: optional faces incidence table (see corner_gather).
    :return: (data (T, 16), Bins)
    """
    ph, pw = pad_resolution(height, width)
    data, tile_bbox, valid = triangle_setup(pos_clip, faces.astype(jnp.int32),
                                            height, width, vtx_inc=vtx_inc)
    if aux is None:
        aux = jnp.zeros((faces.shape[0], 16), jnp.float32)
    bins = bin_triangles(data, tile_bbox, valid, ph, pw, aux=aux,
                         entry_cap=entry_cap)
    return data, bins


def fused_rasterize_from_bins(bins: "Bins", height: int, width: int,
                              interpret: bool = False,
                              padded: bool = False, tex: Array | None = None,
                              aa: bool = False):
    """(idbuf (H, W) i32, payload (N_PAYLOAD, H, W) f32, entry (H, W) f32,
    extra (N_EXTRA, H, W) f32) from precomputed bins — one kernel pass, no
    per-pixel gathers. Payload planes: [u, v, z, tu, tv, x0, y0, x1, y1,
    x2, y2, n0, n1, n2] of the winning triangle per pixel ((tu, tv)
    interpolate the aux uv corners; the screen-corner and neighbor planes
    feed the elementwise antialias). ``entry`` is the winner's bin-entry
    index (global-list entries offset by P; -1 = background) and ``extra``
    holds [D, iw0, iw1, iw2, du02, du12, dv02, dv12] — both consumed by
    the Pallas gradient kernel, which then needs no record streaming.

    :param tex: optional (TH, TW, C) texture — fuses bilinear wrap
        sampling into the pass (a 5th return value: C colour planes,
        padded layout). Must satisfy texture_tpu.fits_resident."""
    ph, pw = pad_resolution(height, width)
    gy, gx = ph // TILE_H, pw // TILE_W
    n_tiles = gy * gx
    mt = tiles_per_program(gx, "fwd")
    pgx = gx // mt
    bw = mt * TILE_W
    gbase = int(bins.sorted_rec_t.shape[1])
    sched_start, sched_col = chunk_schedule(bins.bin_start, gbase, n_tiles)

    n_chan = 0
    tex_geom = None
    tex_args = ()
    prefetch = [bins.bin_start, bins.n_global, bins.gblk_ty, sched_start,
                sched_col]
    tex_in_specs = []
    tex_out_specs = []
    tex_out_shapes = []
    tex_scratch = []
    compiler_params = None
    if tex is not None:
        from fpc_diffrend_tpu.ops.pallas.texture_tpu import (
            VMEM_LIMIT, _background_sample, _extend_texture, extended_shape)

        tex3 = tex[..., None] if tex.ndim == 2 else tex
        th, tw, n_chan = tex3.shape
        he, we = extended_shape(th, tw, "wrap")
        tex_geom = (th, tw, he, we)
        prefetch.append(_background_sample(tex3, "wrap"))
        tex_args = (_extend_texture(tex3, "wrap"),)
        tex_in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
        tex_out_specs = [pl.BlockSpec((TILE_H, bw), lambda i, j, *_: (i, j))
                         for _ in range(n_chan)]
        tex_out_shapes = [jax.ShapeDtypeStruct((ph, pw), jnp.float32)
                          for _ in range(n_chan)]
        tex_scratch = [pltpu.VMEM((n_chan, he, we), jnp.float32)]
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)

    aa_geom = None
    if aa:
        if tex is None:
            raise ValueError("aa=True requires the fused texture path")
        aa_geom = (height, width)
        NPL = 11 + n_chan
        # aa planes (per channel) + the two boundary side outputs: lane j
        # of aah row-band i = a-side delta of the (i, j-1)|(i, j) pair;
        # row 0 of each aav 8-row band = a-side delta of the pair with
        # the tile above (band shifted down by one tile row).
        tex_out_specs += (
            [pl.BlockSpec((TILE_H, bw), lambda i, j, *_: (i, j))
             for _ in range(n_chan)]
            + [pl.BlockSpec((n_chan, TILE_H, TILE_W),
                            lambda i, j, *_: (0, i, 0)),
               pl.BlockSpec((n_chan, TILE_H, bw),
                            lambda i, j, *_: (0, i, j))])
        tex_out_shapes += (
            [jax.ShapeDtypeStruct((ph, pw), jnp.float32)
             for _ in range(n_chan)]
            + [jax.ShapeDtypeStruct((n_chan, ph, TILE_W), jnp.float32),
               jax.ShapeDtypeStruct((n_chan, ph, pw), jnp.float32)])
        tex_scratch += [pltpu.VMEM((NPL, TILE_H, 1), jnp.float32),
                        pltpu.VMEM((gx, NPL, 1, TILE_W), jnp.float32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(gy, pgx),
        in_specs=[
            # Force HBM: bins are streamed via manual DMA, and VMEM
            # placement would impose (8, 128) tiling on the narrow rows.
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ] + tex_in_specs,
        out_specs=[
            pl.BlockSpec((TILE_H, bw), lambda i, j, *_: (i, j)),
            pl.BlockSpec((TILE_H, bw), lambda i, j, *_: (i, j)),
            pl.BlockSpec((N_PAYLOAD, TILE_H, bw),
                         lambda i, j, *_: (0, i, j)),
            pl.BlockSpec((N_EXTRA, TILE_H, bw),
                         lambda i, j, *_: (0, i, j)),
        ] + tex_out_specs,
        scratch_shapes=[
            pltpu.VMEM((4, REC, CHUNK), jnp.float32),   # prefetch rotation
            pltpu.VMEM((REC, MAX_GLOBAL), jnp.float32),  # persistent
            pltpu.VMEM((2, TILE_H, TILE_W), jnp.float32),  # z + entry idx
            pltpu.VMEM((2, TILE_H, SUB, TILE_W), jnp.float32),  # A slots
            pltpu.VMEM((TILE_H, REC, TILE_W), jnp.float32),  # gathered
            pltpu.VMEM((2, REC, CHUNK), jnp.float32),   # phase-B re-stream
        ] + tex_scratch + [
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ] + ([pltpu.SemaphoreType.DMA] if tex is not None else []),
    )

    kwargs = {}
    if compiler_params is not None:
        kwargs["compiler_params"] = compiler_params
    outs = pl.pallas_call(
        functools.partial(_fused_kernel, gx, gy, mt, gbase, n_chan,
                          tex_geom, aa_geom),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ph, pw), jnp.int32),
            jax.ShapeDtypeStruct((ph, pw), jnp.float32),
            jax.ShapeDtypeStruct((N_PAYLOAD, ph, pw), jnp.float32),
            jax.ShapeDtypeStruct((N_EXTRA, ph, pw), jnp.float32),
        ] + tex_out_shapes,
        interpret=interpret,
        **kwargs,
    )(*prefetch, bins.sorted_rec_t, bins.global_rec_t, *tex_args)
    idbuf, entry, payload, extra = outs[:4]
    colour = tuple(outs[4:4 + n_chan])

    if aa:
        aa_planes = tuple(outs[4 + n_chan:4 + 2 * n_chan])
        side_h, side_v = outs[4 + 2 * n_chan], outs[5 + 2 * n_chan]
        return (idbuf, payload, entry, extra, colour,
                _fold_aa_sides(aa_planes, side_h, side_v, n_chan))
    if padded:
        # Padded planes avoid a slice -> re-pad HBM roundtrip when the
        # consumer is the gradient kernel (which wants (ph, pw) anyway).
        if tex is not None:
            return idbuf, payload, entry, extra, colour
        return idbuf, payload, entry, extra
    if tex is not None:
        return (idbuf[:height, :width], payload[:, :height, :width],
                entry[:height, :width], extra[:, :height, :width],
                tuple(c[:height, :width] for c in colour))
    return (idbuf[:height, :width], payload[:, :height, :width],
            entry[:height, :width], extra[:, :height, :width])


def _fold_aa_sides(aa_planes, side_h, side_v, n_chan):
    """Fold the boundary a-side deltas back into the padded aa planes.

    ``side_h`` (C, ph, 128): lane j of row band i = delta for the LAST
    column of tile (i, j - 1). ``side_v`` (C, ph, pw): row 0 of each
    8-row band i = delta for the last pixel row of tile row i - 1.
    """
    ph = aa_planes[0].shape[0]
    pw = aa_planes[0].shape[1]
    gy, gx = ph // TILE_H, pw // TILE_W
    out = []
    for c in range(n_chan):
        a4 = aa_planes[c].reshape(gy, TILE_H, gx, TILE_W)
        # horizontal: lanes 1..gx of side_h -> last column of tiles 0..gx-1
        sh = side_h[c].reshape(gy, TILE_H, TILE_W)[:, :, 1:gx]
        a4 = a4.at[:, :, :gx - 1, TILE_W - 1].add(sh)
        # vertical: band i row 0 -> tile row i-1 last pixel row
        sv = side_v[c].reshape(gy, TILE_H, pw)[1:, 0, :]
        a4 = a4.reshape(gy, TILE_H, pw).at[:gy - 1, TILE_H - 1, :].add(sv)
        out.append(a4.reshape(ph, pw))
    return tuple(out)


def visibility_from_bins(bins: "Bins", height: int, width: int,
                         interpret: bool = False) -> Array:
    """(H, W) int32 winning triangle ids from precomputed bins."""
    idbuf = fused_rasterize_from_bins(bins, height, width,
                                      interpret=interpret)[0]
    return idbuf


@functools.partial(jax.jit, static_argnames=("height", "width",
                                             "window_y", "window_x"))
def raster_stats(pos_clip: Array, faces: Array, height: int, width: int,
                 window_y: int | None = None, window_x: int | None = None):
    """Binning health counters (no-silent-caps check, jit-safe).

    :param window_y / window_x: binning window to evaluate against
        (static; default = the module's current WINDOW_Y/WINDOW_X).
        Callers that rebind the module window (fit.api.autotune_caps)
        pass it explicitly so the jit cache keys on the actual window —
        a None-keyed trace from before the rebind would silently report
        stats for the old window.
    :return: dict with n_valid_pairs (bin entries), n_global (oversized
        triangles in the global list), global_overflow (oversized
        triangles DROPPED past MAX_GLOBAL — must be 0 for a correct
        render), pair_cap_suggestion (min pair_cap preserving all
        gradients in the backward reduction), wy_max / wx_max (largest
        valid-triangle tile bbox — sizes the window itself).
    """
    wy_win = WINDOW_Y if window_y is None else window_y
    wx_win = WINDOW_X if window_x is None else window_x
    ph, pw = pad_resolution(height, width)
    data, tile_bbox, valid = triangle_setup(pos_clip, faces.astype(jnp.int32),
                                            height, width)
    tx0, ty0, tx1, ty1 = (tile_bbox[:, 0], tile_bbox[:, 1],
                          tile_bbox[:, 2], tile_bbox[:, 3])
    wx = tx1 - tx0 + 1
    wy = ty1 - ty0 + 1
    fits = (wx <= wx_win) & (wy <= wy_win)
    n_pairs = jnp.sum(jnp.where(valid & fits, wx * wy, 0))
    n_big = jnp.sum(valid & ~fits)
    return {
        "n_valid_pairs": n_pairs,
        "n_global": jnp.minimum(n_big, MAX_GLOBAL),
        "global_overflow": jnp.maximum(n_big - MAX_GLOBAL, 0),
        "pair_cap_suggestion": n_pairs,
        "wy_max": jnp.max(jnp.where(valid, wy, 0)),
        "wx_max": jnp.max(jnp.where(valid, wx, 0)),
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

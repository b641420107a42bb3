"""Pallas TPU gradient kernel for the rasterizer's pixel attributes.

The backward of the barycentric recompute is a pixel -> triangle
reduction. XLA autodiff expresses it as scatter-adds of every pixel's
contribution (~450M floats/s on TPU — the dominant cost of the whole
backward pass). This kernel computes the reduction where the data already
is: each image tile reduces its pixels' gradient contributions onto the
triangle records of its bin (pure vector math + lane reductions), writing
per-bin-entry gradient rows; a small segment-sum then folds bin entries
(~2 per triangle) into per-triangle gradients — two orders of magnitude
fewer scattered elements.

Round-2 design (vs round 1): one combined 32-float record per bin entry
(geometry + aux) so each chunk is a single double-buffered DMA; 32-record
sub-blocks outside the bin's live range are skipped with predicated
execution; and chunk gradients accumulate in a VMEM *pending buffer*
carried across the sequential grid — a chunk shared by two adjacent
tiles' bins is summed in VMEM and each chunk column is written to HBM
exactly once (round 1 did an HBM read-modify-write round trip per chunk).
Global-list gradients accumulate in persistent VMEM and flush once.

Math (matches ops/rasterize.py:pixel_attributes exactly):
  lambda_i = a_i x + b_i y + c_i          (normalized edge planes)
  d_i = lambda_i / w_i ; D = d0 + d1 + d2
  u = d0 / D ; v = d1 / D ; z = zx x + zy y + zc

Given cotangents (gu, gv, gz) per pixel, per covered record:
  S    = (gu d0 + gv d1) / D^2
  gd_0 = gu / D - S ; gd_1 = gv / D - S ; gd_2 = -S
  glam_i = gd_i / w_i ;  gw_i = -gd_i d_i / w_i
  ga_i = sum glam_i x ; gb_i = sum glam_i y ; gc_i = sum glam_i
  gzx  = sum gz x ;     gzy  = sum gz y ;    gzc  = sum gz
The interpolated-uv cotangents (gtu, gtv) fold into (gu, gv) plus uv
corner-gradient rows; the antialias vertex-plane cotangents reduce as
plain masked sums onto the screen-corner aux rows.

Output layout matches the combined 32-float record (geometry rows 0-15,
aux rows 16-31; tid/neighbor/pad slots receive zero).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
    Bins, CHUNK, MAX_GLOBAL, N_PAYLOAD, REC, SUB, TILE_H, TILE_W,
    pad_resolution)

Array = jnp.ndarray

_W_EPS = 1e-9
_AREA_EPS = 1e-12


def _sub_grads(at, rec_base, lo, hi, ti, x_row, id_ref, gpl_ref):
    """(n, REC) gradient rows for one (n, REC) transposed record block.

    ``gpl_ref`` is the (N_PAYLOAD, TILE_H, TILE_W) cotangent block in the
    fused kernel's payload order: u v z tu tv x0 y0 x1 y1 x2 y2 n0 n1 n2
    (neighbor cotangents are ignored). Records arrive on sublanes (the
    caller transposes whole chunks; Mosaic only allows 128-aligned lane
    slices, sublane slices may be 8-aligned).
    """
    a0 = at[:, 0:1]; b0 = at[:, 1:2]; c0 = at[:, 2:3]
    a1 = at[:, 3:4]; b1 = at[:, 4:5]; c1 = at[:, 5:6]
    a2 = at[:, 6:7]; b2 = at[:, 7:8]; c2 = at[:, 8:9]
    tid = at[:, 12:13]
    w0 = at[:, 13:14]; w1 = at[:, 14:15]; w2 = at[:, 15:16]
    iw0 = 1.0 / jnp.where(jnp.abs(w0) > _W_EPS, w0, 1.0)
    iw1 = 1.0 / jnp.where(jnp.abs(w1) > _W_EPS, w1, 1.0)
    iw2 = 1.0 / jnp.where(jnp.abs(w2) > _W_EPS, w2, 1.0)
    cu0 = at[:, 16:17]; cv0 = at[:, 17:18]
    cu1 = at[:, 18:19]; cv1 = at[:, 19:20]
    cu2 = at[:, 20:21]; cv2 = at[:, 21:22]

    n = at.shape[0]
    rec_iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    rec = rec_base + rec_iota
    active = ((rec >= lo) & (rec < hi)).astype(jnp.float32)

    zero = jnp.zeros((n, 1), jnp.float32)
    A = [zero] * 9            # ga/gb/gc per corner
    Z = [zero] * 3            # gzx gzy gzc
    W = [zero] * 3            # gw per corner
    GU = [zero] * 3
    GV = [zero] * 3
    VG = [zero] * 6           # screen-corner grads x0 y0 x1 y1 x2 y2

    for g in range(TILE_H):
        y = (ti * TILE_H + g).astype(jnp.float32) + 0.5    # scalar
        idrow = id_ref[g:g + 1, :]                         # (1, 128) f32
        gu_in = gpl_ref[0, g:g + 1, :]
        gv_in = gpl_ref[1, g:g + 1, :]
        gz = gpl_ref[2, g:g + 1, :]
        gtu = gpl_ref[3, g:g + 1, :]
        gtv = gpl_ref[4, g:g + 1, :]

        mask = (idrow == tid).astype(jnp.float32) * active  # (SUB, 128)
        l0 = a0 * x_row + (b0 * y + c0)
        l1 = a1 * x_row + (b1 * y + c1)
        l2 = a2 * x_row + (b2 * y + c2)
        d0 = l0 * iw0
        d1 = l1 * iw1
        d2 = l2 * iw2
        D = d0 + d1 + d2
        rD = 1.0 / jnp.where(jnp.abs(D) > _AREA_EPS, D, 1.0)
        up = d0 * rD
        vp = d1 * rD
        # texc = u*c0 + v*c1 + (1-u-v)*c2: fold its cotangents into
        # the bary cotangents and accumulate corner gradients
        gu = gu_in + gtu * (cu0 - cu2) + gtv * (cv0 - cv2)
        gv = gv_in + gtu * (cu1 - cu2) + gtv * (cv1 - cv2)
        S = (gu * d0 + gv * d1) * rD * rD
        gd0 = gu * rD - S
        gd1 = gv * rD - S
        gd2 = -S
        gl0 = gd0 * iw0 * mask
        gl1 = gd1 * iw1 * mask
        gl2 = gd2 * iw2 * mask
        gzm = gz * mask

        s = functools.partial(jnp.sum, axis=1, keepdims=True)
        a0s = s(gl0); a1s = s(gl1); a2s = s(gl2); zs = s(gzm)
        A[0] += s(gl0 * x_row); A[1] += y * a0s; A[2] += a0s
        A[3] += s(gl1 * x_row); A[4] += y * a1s; A[5] += a1s
        A[6] += s(gl2 * x_row); A[7] += y * a2s; A[8] += a2s
        Z[0] += s(gzm * x_row); Z[1] += y * zs; Z[2] += zs
        W[0] += s(-gd0 * d0 * iw0 * mask)
        W[1] += s(-gd1 * d1 * iw1 * mask)
        W[2] += s(-gd2 * d2 * iw2 * mask)
        wp = 1.0 - up - vp
        GU[0] += s(gtu * up * mask)
        GU[1] += s(gtu * vp * mask)
        GU[2] += s(gtu * wp * mask)
        GV[0] += s(gtv * up * mask)
        GV[1] += s(gtv * vp * mask)
        GV[2] += s(gtv * wp * mask)
        # antialias vertex planes: plain masked cotangent sums
        for q in range(6):
            VG[q] += s(gpl_ref[5 + q, g:g + 1, :] * mask)

    # combined-record layout: 16 geometry rows then 16 aux rows
    cols = (A[:9] + Z + [zero] + W                       # rows 0-15
            + [GU[0], GV[0], GU[1], GV[1], GU[2], GV[2]]  # uv corners
            + VG                                          # screen corners
            + [zero, zero, zero, zero])                   # neighbors + pad
    return jnp.concatenate(cols, axis=1)                  # (SUB, REC)


def _grad_kernel(gx: int, n_tiles: int,
                 # scalar prefetch
                 bin_start_ref, n_global_ref, gblk_ty_ref,
                 # inputs
                 sorted_hbm, global_hbm, grad_init_hbm,
                 id_ref, gpl_ref,
                 # outputs
                 grad_out_hbm, gglob_out_hbm,
                 # scratch
                 chunk_vmem, g32t_vmem, pend_vmem, gglob_vmem, global_vmem,
                 pend_idx, dma_sem, out_sem, global_sem):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tile_idx = ti * gx + tj

    start = bin_start_ref[tile_idx]
    end = bin_start_ref[tile_idx + 1]
    count = end - start
    n_global = n_global_ref[0]

    @pl.when(tile_idx == 0)
    def _():
        pend_idx[0] = -1
        gglob_vmem[:] = jnp.zeros((REC, MAX_GLOBAL), jnp.float32)

        @pl.when(n_global > 0)
        def _():
            dma = pltpu.make_async_copy(global_hbm, global_vmem, global_sem)
            dma.start()
            dma.wait()

    x_row = (tj * TILE_W
             + jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1)
             ).astype(jnp.float32) + 0.5                       # (1, 128)

    # ---- binned records: double-buffered streaming + pending buffer ----
    first_chunk = start // CHUNK
    n_chunks = jnp.where(count > 0,
                         (end - 1) // CHUNK - first_chunk + 1, 0)

    def data_dma(slot, ci):
        col0 = pl.multiple_of((first_chunk + ci) * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            sorted_hbm.at[:, pl.ds(col0, CHUNK)],
            chunk_vmem.at[slot], dma_sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        data_dma(0, 0).start()

    def chunk_body(ci, _):
        slot = jax.lax.rem(ci, 2)
        nxt = jax.lax.rem(ci + 1, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            data_dma(nxt, ci + 1).start()

        data_dma(slot, ci).wait()
        col0 = (first_chunk + ci) * CHUNK
        at_full = chunk_vmem[slot].T                       # (CHUNK, REC)
        # g32t holds this chunk's grads transposed (records on sublanes)
        # so sub-block writes are legal 8-aligned sublane slices.
        g32t_vmem[:] = jnp.zeros((CHUNK, REC), jnp.float32)
        for sb in range(CHUNK // SUB):
            sub_base = col0 + sb * SUB

            @pl.when((sub_base < end) & (sub_base + SUB > start))
            def _():
                at = at_full[sb * SUB:(sb + 1) * SUB, :]
                g = _sub_grads(at, sub_base, start, end, ti, x_row,
                               id_ref, gpl_ref)
                g32t_vmem[pl.ds(sb * SUB, SUB), :] = g

        # pending-buffer accumulation: sum chunks shared across tiles in
        # VMEM; every chunk column range hits HBM exactly once.
        same = col0 == pend_idx[0]
        g32 = g32t_vmem[:].T                               # (REC, CHUNK)

        @pl.when(same)
        def _():
            pend_vmem[:] = pend_vmem[:] + g32

        @pl.when(jnp.logical_not(same))
        def _():
            prev = pend_idx[0]

            @pl.when(prev >= 0)
            def _():
                prev_a = pl.multiple_of(prev, CHUNK)
                wr = pltpu.make_async_copy(
                    pend_vmem, grad_out_hbm.at[:, pl.ds(prev_a, CHUNK)],
                    out_sem)
                wr.start()
                wr.wait()

            pend_vmem[:] = g32
            pend_idx[0] = col0

        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    # ---- global (oversized) records, row-range predicated ----
    for gb in range(MAX_GLOBAL // CHUNK):
        blk_min = gblk_ty_ref[0, gb]
        blk_max = gblk_ty_ref[1, gb]

        @pl.when((gb * CHUNK < n_global) & (blk_min <= ti)
                 & (ti <= blk_max))
        def _():
            at = global_vmem[:, pl.ds(gb * CHUNK, CHUNK)].T
            g = _sub_grads(at, gb * CHUNK, 0, n_global, ti, x_row,
                           id_ref, gpl_ref)
            cur = gglob_vmem[:, pl.ds(gb * CHUNK, CHUNK)]
            gglob_vmem[:, pl.ds(gb * CHUNK, CHUNK)] = cur + g.T

    # ---- final flush ----
    @pl.when(tile_idx == n_tiles - 1)
    def _():
        @pl.when(pend_idx[0] >= 0)
        def _():
            last_a = pl.multiple_of(pend_idx[0], CHUNK)
            wr = pltpu.make_async_copy(
                pend_vmem, grad_out_hbm.at[:, pl.ds(last_a, CHUNK)],
                out_sem)
            wr.start()
            wr.wait()

        gw = pltpu.make_async_copy(gglob_vmem, gglob_out_hbm, global_sem)
        gw.start()
        gw.wait()


def pixel_grad_pallas(bins: Bins, idbuf: Array, g_payload: Array,
                      n_tris: int, height: int, width: int,
                      pair_cap: int | None = None,
                      interpret: bool = False):
    """Per-triangle gradients from per-pixel payload cotangents.

    :param g_payload: (N_PAYLOAD, H, W) cotangents in the fused kernel's
        payload order (u v z tu tv x0 y0 x1 y1 x2 y2 n0 n1 n2).
    :param pair_cap: bin entries kept for the final segment reduction
        (valid entries are a sorted prefix). Default 6 * T — generous for
        the ~2 tiles a face-mesh triangle overlaps; entries beyond it lose
        their (tiny, late-sorted) gradient contributions. Size it from
        rasterize_tpu.raster_stats to guarantee nothing is dropped.
    :return: (grad_data (T, 16), grad_aux (T, 16)).
    """
    ph, pw = pad_resolution(height, width)
    gy, gx = ph // TILE_H, pw // TILE_W
    n_tiles = gy * gx

    idp = jnp.pad(idbuf, ((0, ph - height), (0, pw - width)),
                  constant_values=-1).astype(jnp.float32)
    gpl = jnp.pad(g_payload, ((0, 0), (0, ph - height), (0, pw - width)))

    P = bins.sorted_rec_t.shape[1]
    grad_init = jnp.zeros((REC, P), jnp.float32)

    img = lambda: pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # sorted_rec_t
            pl.BlockSpec(memory_space=pltpu.HBM),   # global_rec_t
            pl.BlockSpec(memory_space=pltpu.HBM),   # grad init (aliased)
            img(),
            pl.BlockSpec((N_PAYLOAD, TILE_H, TILE_W),
                         lambda i, j, *_: (0, i, j)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, REC, CHUNK), jnp.float32),
            pltpu.VMEM((CHUNK, REC), jnp.float32),
            pltpu.VMEM((REC, CHUNK), jnp.float32),
            pltpu.VMEM((REC, MAX_GLOBAL), jnp.float32),
            pltpu.VMEM((REC, MAX_GLOBAL), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    grad_pairs_t, grad_global_t = pl.pallas_call(
        functools.partial(_grad_kernel, gx, n_tiles),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((REC, P), jnp.float32),
            jax.ShapeDtypeStruct((REC, MAX_GLOBAL), jnp.float32),
        ],
        input_output_aliases={5: 0},
        interpret=interpret,
        # no has_side_effects: it would make the call non-fusible and
        # CHECK-crash XLA-TPU's custom-call fusion pass inside scan bodies
        # (see texture_tpu.py); outputs are consumed, DCE-safe without it.
    )(bins.bin_start, bins.n_global, bins.gblk_ty,
      bins.sorted_rec_t, bins.global_rec_t, grad_init, idp, gpl)

    # Fold bin entries into per-triangle gradients. Valid entries are a
    # contiguous prefix of the sorted order, so a static cap bounds the
    # segment reduction size.
    if pair_cap is None:
        pair_cap = 6 * n_tris
    n_raw = bins.sorted_tri.shape[0]
    pair_cap = min(max(pair_cap, 1), n_raw)
    seg = jnp.minimum(bins.sorted_tri[:pair_cap], n_tris)  # invalid -> T bin
    # Chunks holding no live bin entry are never flushed by the kernel —
    # mask them (the aliased zero-init guarantees this in compiled mode,
    # but interpret mode leaves unwritten output regions as garbage).
    n_live = bins.bin_start[-1]
    live = (jnp.arange(pair_cap, dtype=jnp.int32) < n_live)[:, None]
    grad_both = jax.ops.segment_sum(
        jnp.where(live, grad_pairs_t.T[:pair_cap], 0.0), seg,
        num_segments=n_tris + 1)[:n_tris]

    # Oversized-triangle contributions.
    gidx = jnp.minimum(bins.global_idx, n_tris)
    grad_gboth = jax.ops.segment_sum(grad_global_t.T, gidx,
                                     num_segments=n_tris + 1)[:n_tris]
    total = grad_both + grad_gboth
    return total[:, :16], total[:, 16:]

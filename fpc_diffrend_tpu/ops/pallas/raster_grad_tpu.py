"""Pallas TPU gradient kernel for the rasterizer's pixel attributes.

The backward of the barycentric recompute is a pixel -> triangle
reduction. XLA autodiff expresses it as scatter-adds of every pixel's
contribution (~450M floats/s on TPU — the dominant cost of the whole
backward pass). This kernel computes the reduction where the data already
is: each image tile reduces its pixels' gradient contributions onto the
triangle records of its bin, writing per-bin-entry gradient rows; a small
segment-sum then folds bin entries (~2 per triangle) into per-triangle
gradients — two orders of magnitude fewer scattered elements.

Round-2b design (vs the round-2a per-record reduction): the forward
kernel already resolves each pixel's winning *bin-entry index* and emits
the per-pixel quantities the chain rule needs (D, 1/w_i, uv-corner
differences — rasterize_tpu.N_EXTRA planes). The backward therefore
streams NO triangle records at all:

  1. Compute the 32 per-pixel gradient-coefficient planes C_k (one per
     record slot) densely, once per tile — pure (8, 128) VPU math.
  2. For every record chunk the tile's bin overlaps, form the one-hot
     matrix onehot[r, p] = (entry[p] == chunk_base + r) and accumulate
     grad[k, r] += sum_p C_k[p] * onehot[r, p] as an MXU matmul
     (C (32, 128px) contracted with onehot (128rec, 128px)).

The pixel->record reduction thus runs on the MXU instead of 22 VPU lane
reductions per record row, and the kernel reads only image-shaped planes.
Chunk gradients accumulate in a VMEM pending buffer carried across the
sequential grid — a chunk shared by adjacent tiles' bins is summed in
VMEM and each chunk column is written to HBM exactly once. Global-list
gradients accumulate in persistent VMEM and flush once.

Math (matches ops/rasterize.py:pixel_attributes exactly):
  lambda_i = a_i x + b_i y + c_i          (normalized edge planes)
  d_i = lambda_i / w_i ; D = d0 + d1 + d2
  u = d0 / D ; v = d1 / D ; z = zx x + zy y + zc
Given cotangents (gu, gv, gz) per pixel:
  S    = (gu d0 + gv d1) / D^2
  gd_0 = gu / D - S ; gd_1 = gv / D - S ; gd_2 = -S
  glam_i = gd_i / w_i ;  gw_i = -gd_i d_i / w_i
  ga_i = sum glam_i x ; gb_i = sum glam_i y ; gc_i = sum glam_i
  gzx  = sum gz x ;     gzy  = sum gz y ;    gzc  = sum gz
The interpolated-uv cotangents (gtu, gtv) fold into (gu, gv) plus uv
corner-gradient rows; the antialias vertex-plane cotangents reduce as
plain one-hot sums onto the screen-corner aux rows.

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
    Bins, CHUNK, MAX_GLOBAL, N_EXTRA, N_PAYLOAD, REC, TILE_H, TILE_W,
    _split3_bf16, pad_resolution, tiles_per_program)

# payload cotangent planes the kernel actually reads: [gu gv gz gtu gtv
# g(x0..y2)] — the trailing neighbor-id planes (stop-gradient) are
# sliced off before the pad/DMA.
N_GPL = 11

Array = jnp.ndarray

_W_EPS = 1e-9

# FPC_GRAD_PREC=fast contracts the gradient-coefficient planes with a
# SINGLE bf16 plane instead of the exact hi+mid+lo 3-way split (1 MXU
# pass instead of 3). Per-contraction error is ~4e-3 relative, but
# cancellation amplifies per-element gradient error (measured ~6%
# normalized RMS on an adversarial random scene —
# test_fast_gradient_precision_bounded). Primal rasterization is
# untouched.
#
# DEFAULT = fast since round 5: convergence-validated against the SGD
# seed-noise baseline (see texture_tpu GRAD_PRECISION note and
# results/precision*/precision.md). FPC_GRAD_PREC=exact restores the
# 3-way split.
import os as _os

_GRAD_FAST = _os.environ.get("FPC_GRAD_PREC", "fast") == "fast"


def _split_grad(x):
    if _GRAD_FAST:
        return (x.astype(jnp.bfloat16),)
    return _split3_bf16(x)

_AREA_EPS = 1e-12


def _grad_kernel(gx: int, gy: int, pgx: int, mt: int, gbase: int,
                 # scalar prefetch
                 bin_start_ref, n_global_ref, gblk_ty_ref,
                 # inputs
                 entry_ref, u_ref, v_ref, extra_ref, gpl_ref,
                 # outputs
                 grad_out_hbm, gglob_out_hbm,
                 # scratch
                 cr_vmem, pend_vmem, gglob_vmem, pend_idx,
                 out_sem, global_sem):
    """Each program covers ``mt`` horizontally adjacent tiles: per-program
    dispatch and block-DMA issue overhead dominated the kernel at one
    8x128 tile per program (only ~2-3us of real work per live tile)."""
    ti = pl.program_id(0)
    pj = pl.program_id(1)
    n_global = n_global_ref[0]

    @pl.when((ti == 0) & (pj == 0))
    def _():
        pend_idx[0] = -1    # column of the live pending buffer
        pend_idx[1] = 0     # live slot of the double buffer
        pend_idx[2] = -1    # column of an in-flight write from slot 0
        pend_idx[3] = -1    # column of an in-flight write from slot 1
        gglob_vmem[:] = jnp.zeros((REC, MAX_GLOBAL), jnp.float32)

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
        work = (count > 0) | any_glob

        @pl.when(work)
        def _build_coeff_planes():
            _grad_coeff_planes(ti, tj, u_ref[:, cols], v_ref[:, cols],
                               extra_ref[:, :, cols], gpl_ref[:, :, cols],
                               cr_vmem)

        entry = entry_ref[:, cols]                         # (8, 128) f32

        # ---- binned chunks: one-hot MXU scatter, pending-buffer out ----
        first_chunk = start // CHUNK
        n_chunks = jnp.where(count > 0,
                             (end - 1) // CHUNK - first_chunk + 1, 0)

        def chunk_body(ci, _, entry=entry, first_chunk=first_chunk):
            col0 = (first_chunk + ci) * CHUNK
            col_f = (col0
                     + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
                     ).astype(jnp.float32)
            g32 = jnp.zeros((REC, CHUNK), jnp.float32)
            for g in range(TILE_H):
                oh = (col_f == entry[g:g + 1, :]).astype(jnp.bfloat16)
                for part in _split_grad(cr_vmem[g]):
                    g32 = g32 + jax.lax.dot_general(
                        part, oh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)      # (REC, CHUNK)

            # pending-buffer accumulation: sum chunks shared across tiles
            # in VMEM; every chunk column range hits HBM exactly once,
            # through a double-buffered ASYNC write (the wait happens only
            # when the slot is reused, hiding the store latency).
            same = col0 == pend_idx[0]
            slot = pend_idx[1]

            @pl.when(same)
            def _():
                pend_vmem[slot] = pend_vmem[slot] + g32

            @pl.when(jnp.logical_not(same))
            def _():
                prev = pend_idx[0]
                nxt = 1 - slot

                @pl.when(prev >= 0)
                def _():
                    prev_a = pl.multiple_of(prev, CHUNK)
                    pltpu.make_async_copy(
                        pend_vmem.at[slot],
                        grad_out_hbm.at[:, pl.ds(prev_a, CHUNK)],
                        out_sem.at[slot]).start()
                    pend_idx[2 + slot] = prev

                # drain any in-flight write from the slot we are reusing
                inflight = pend_idx[2 + nxt]

                @pl.when(inflight >= 0)
                def _():
                    in_a = pl.multiple_of(inflight, CHUNK)
                    pltpu.make_async_copy(
                        pend_vmem.at[nxt],
                        grad_out_hbm.at[:, pl.ds(in_a, CHUNK)],
                        out_sem.at[nxt]).wait()
                    pend_idx[2 + nxt] = -1

                pend_vmem[nxt] = g32
                pend_idx[0] = col0
                pend_idx[1] = nxt

            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

        # ---- global (oversized) records, row-range predicated ----
        for gb in range(MAX_GLOBAL // CHUNK):
            blk_min = gblk_ty_ref[0, gb]
            blk_max = gblk_ty_ref[1, gb]

            @pl.when((gb * CHUNK < n_global) & (blk_min <= ti)
                     & (ti <= blk_max))
            def _(entry=entry):
                col_f = (gbase + gb * CHUNK
                         + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
                         ).astype(jnp.float32)
                g32 = jnp.zeros((REC, CHUNK), jnp.float32)
                for g in range(TILE_H):
                    oh = (col_f == entry[g:g + 1, :]).astype(jnp.bfloat16)
                    for part in _split_grad(cr_vmem[g]):
                        g32 = g32 + jax.lax.dot_general(
                            part, oh, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                cur = gglob_vmem[:, pl.ds(gb * CHUNK, CHUNK)]
                gglob_vmem[:, pl.ds(gb * CHUNK, CHUNK)] = cur + g32

    # ---- final flush: live pending buffer + any in-flight writes ----
    @pl.when((ti == gy - 1) & (pj == pgx - 1))
    def _():
        slot = pend_idx[1]

        @pl.when(pend_idx[0] >= 0)
        def _():
            last_a = pl.multiple_of(pend_idx[0], CHUNK)
            wr = pltpu.make_async_copy(
                pend_vmem.at[slot], grad_out_hbm.at[:, pl.ds(last_a, CHUNK)],
                out_sem.at[slot])
            wr.start()
            wr.wait()

        for sl in range(2):
            inflight = pend_idx[2 + sl]

            @pl.when(inflight >= 0)
            def _():
                in_a = pl.multiple_of(inflight, CHUNK)
                pltpu.make_async_copy(
                    pend_vmem.at[sl],
                    grad_out_hbm.at[:, pl.ds(in_a, CHUNK)],
                    out_sem.at[sl]).wait()

        gw = pltpu.make_async_copy(gglob_vmem, gglob_out_hbm, global_sem)
        gw.start()
        gw.wait()


def _grad_coeff_planes(ti, tj, u, v, extra, gpl, cr_vmem):
    """Dense per-pixel gradient-coefficient planes -> cr_vmem rows.

    ``u``/``v`` are (TILE_H, TILE_W) values, ``extra``/``gpl`` the
    matching (N, TILE_H, TILE_W) plane stacks (one sub-tile's slice)."""
    x = (tj * TILE_W
         + jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1)
         ).astype(jnp.float32) + 0.5                       # (1, 128)
    y = (ti * TILE_H
         + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, 1), 0)
         ).astype(jnp.float32) + 0.5                       # (8, 1)

    D = extra[0]
    iw0 = extra[1]
    iw1 = extra[2]
    iw2 = extra[3]
    du02 = extra[4]
    du12 = extra[5]
    dv02 = extra[6]
    dv12 = extra[7]
    gu_in = gpl[0]
    gv_in = gpl[1]
    gz = gpl[2]
    gtu = gpl[3]
    gtv = gpl[4]

    d0 = u * D
    d1 = v * D
    d2 = D - d0 - d1
    gu = gu_in + gtu * du02 + gtv * dv02
    gv = gv_in + gtu * du12 + gtv * dv12
    rD = 1.0 / jnp.where(jnp.abs(D) > _AREA_EPS, D, 1.0)
    S = (gu * d0 + gv * d1) * rD * rD
    gd0 = gu * rD - S
    gd1 = gv * rD - S
    gd2 = -S
    gl0 = gd0 * iw0
    gl1 = gd1 * iw1
    gl2 = gd2 * iw2
    wp = 1.0 - u - v
    zero = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    C = [gl0 * x, gl0 * y, gl0,
         gl1 * x, gl1 * y, gl1,
         gl2 * x, gl2 * y, gl2,
         gz * x, gz * y, gz,
         zero,
         -gd0 * d0 * iw0, -gd1 * d1 * iw1, -gd2 * d2 * iw2,
         gtu * u, gtv * u, gtu * v, gtv * v, gtu * wp, gtv * wp,
         gpl[5], gpl[6], gpl[7],
         gpl[8], gpl[9], gpl[10],
         zero, zero, zero, zero]                           # 32 x (8, 128)

    # re-layout per tile row: cr_vmem[g] (REC, 128px) with C_k on sublanes
    for g in range(TILE_H):
        cr_vmem[g] = jnp.concatenate([c[g:g + 1, :] for c in C], axis=0)


# ---------------------------------------------------------------------------
# Banded sliding-window fold: bin-entry gradients -> per-triangle gradients
# ---------------------------------------------------------------------------
#
# jax.ops.segment_sum lowers to a scatter-add (~15 ms per batched step at
# the 90k-entry headline shape — the dominant cost of the whole backward
# stage). The sorted bin order is BAND-LIMITED for mesh-local triangle
# ids: bins advance through tile rows, and a tile row only contains
# triangles from a narrow id band (a triangle spans <= WINDOW_Y tile
# rows). This kernel exploits that: a VMEM accumulator window slides
# monotonically up the triangle axis (origin = suffix-min of per-chunk id
# minima, so retired columns are provably final), each 128-entry chunk
# scatters onto the window with one-hot MXU matmuls, and every output
# column is DMA'd to HBM exactly once at retirement. Entries outside the
# window are counted in an overflow output (no-silent-caps doctrine) —
# fit.api sizes/validates the band via measure_raster_health-style checks
# and the caller falls back to segment_sum when the scene isn't banded.

FOLD_WINDOW = 2048         # sliding accumulator columns (triangle ids)


def _fold_kernel(n_chunks: int, tp: int, w0_ref,
                 grad_ref, tri_ref, out_hbm, ovf_ref,
                 win_vmem, ret_sem):
    c = pl.program_id(0)
    w0 = w0_ref[c]
    prev = w0_ref[jnp.maximum(c - 1, 0)]

    @pl.when(c == 0)
    def _():
        win_vmem[:] = jnp.zeros((REC, FOLD_WINDOW), jnp.float32)
        ovf_ref[0] = 0
        # columns below the very first window origin are never touched:
        # flush zeros so every output column is written exactly once
        nz = w0 // 128

        def zbody(k, _):
            cp = pltpu.make_async_copy(
                win_vmem.at[:, pl.ds(0, 128)],
                out_hbm.at[:, pl.ds(pl.multiple_of(k * 128, 128), 128)],
                ret_sem)
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, nz, zbody, 0)

    shift = w0 - prev                               # multiple of 128, >= 0

    @pl.when(shift > 0)
    def _():
        # retire [prev, prev + min(shift, WINDOW)): final by the
        # suffix-min construction; if the origin jumped past a whole
        # window (sparse/jumpy id bands), the uncovered gap columns are
        # zero by construction (no live entry maps there) — flush zeros
        retire = jnp.minimum(shift, FOLD_WINDOW)

        def rbody(k, _):
            col = pl.multiple_of(k * 128, 128)
            cp = pltpu.make_async_copy(
                win_vmem.at[:, pl.ds(col, 128)],
                out_hbm.at[:, pl.ds(pl.multiple_of(prev + col, 128), 128)],
                ret_sem)
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, retire // 128, rbody, 0)

        @pl.when(shift > FOLD_WINDOW)
        def _():
            # gap [prev + WINDOW, w0): zero-flush (window content is all
            # retired; reuse a freshly zeroed block as the source)
            win_vmem[:, 0:128] = jnp.zeros((REC, 128), jnp.float32)

            def gbody(k, _):
                cp = pltpu.make_async_copy(
                    win_vmem.at[:, pl.ds(0, 128)],
                    out_hbm.at[:, pl.ds(pl.multiple_of(
                        prev + FOLD_WINDOW + k * 128, 128), 128)],
                    ret_sem)
                cp.start()
                cp.wait()
                return 0

            jax.lax.fori_loop(0, (shift - FOLD_WINDOW) // 128, gbody, 0)

        # slide the window left by `shift` (128-aligned block copies; the
        # source is always right of the destination, so in-order block
        # copies are hazard-free), zero-filling the vacated tail
        for i in range(FOLD_WINDOW // 128):
            src = i * 128 + shift

            @pl.when(src < FOLD_WINDOW)
            def _(i=i, src=src):
                s = pl.multiple_of(jnp.minimum(src, FOLD_WINDOW - 128), 128)
                win_vmem[:, i * 128:(i + 1) * 128] = win_vmem[:, pl.ds(s, 128)]

            @pl.when(src >= FOLD_WINDOW)
            def _(i=i):
                win_vmem[:, i * 128:(i + 1) * 128] = jnp.zeros(
                    (REC, 128), jnp.float32)

    # accumulate this chunk onto the whole window (one-hot MXU scatter)
    ids = tri_ref[0:1, :]                           # (1, CHUNK) f32
    rel = ids - w0.astype(jnp.float32)
    ovf = jnp.sum((rel >= FOLD_WINDOW) & (ids >= 0.0)).astype(jnp.int32)
    ovf_ref[0] = ovf_ref[0] + ovf
    col_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, FOLD_WINDOW), 1
                                     ).astype(jnp.float32)
    oh = (col_i == rel.reshape(CHUNK, 1)).astype(jnp.bfloat16)
    acc = None
    for part in _split_grad(grad_ref[...]):
        f = jax.lax.dot_general(part, oh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = f if acc is None else acc + f
    win_vmem[:] = win_vmem[:] + acc

    # final flush: the remaining window, then zero-fill every output
    # column above it (they would otherwise be uninitialized memory)
    @pl.when(c == n_chunks - 1)
    def _():
        def fbody(k, _):
            col = pl.multiple_of(k * 128, 128)
            cp = pltpu.make_async_copy(
                win_vmem.at[:, pl.ds(col, 128)],
                out_hbm.at[:, pl.ds(pl.multiple_of(w0 + col, 128), 128)],
                ret_sem)
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, FOLD_WINDOW // 128, fbody, 0)

        win_vmem[:, 0:128] = jnp.zeros((REC, 128), jnp.float32)

        def tbody(k, _):
            cp = pltpu.make_async_copy(
                win_vmem.at[:, pl.ds(0, 128)],
                out_hbm.at[:, pl.ds(
                    pl.multiple_of(w0 + FOLD_WINDOW + k * 128, 128), 128)],
                ret_sem)
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, (tp - FOLD_WINDOW - w0) // 128, tbody, 0)


def banded_fold(grad_pairs_t: Array, sorted_tri: Array, n_live,
                pair_cap: int, n_tris: int, interpret: bool = False,
                reverse: bool = False):
    """Per-triangle gradient fold via the sliding-window kernel.

    :param grad_pairs_t: (REC, P) bin-entry gradients (kernel output).
    :param sorted_tri: (P_raw,) triangle id per sorted entry.
    :param n_live: live-entry count (bins.bin_start[-1]).
    :param reverse: process chunks in reverse bin order — for scenes
        whose triangle ids DESCEND along the tile-sorted order (the GL
        convention's y-flip makes upright-camera scenes descend when face
        ids ascend with world y). The accumulation targets absolute
        triangle columns, so only the chunk order flips.
    :return: (grad_tri (n_tris, REC), overflow (int32 scalar) — entries
        whose id fell outside the sliding window, 0 for banded scenes).
    """
    P = min(pair_cap, grad_pairs_t.shape[1])
    P = (P // CHUNK) * CHUNK
    n_chunks = P // CHUNK
    live = jnp.arange(P, dtype=jnp.int32) < n_live
    tri = jnp.where(live, sorted_tri[:P], -1)
    tri_c = tri.reshape(n_chunks, CHUNK)
    grads = grad_pairs_t[:, :P]
    if reverse:
        tri_c = tri_c[::-1]
        tri = tri_c.reshape(-1)
        grads = grads.reshape(REC, n_chunks, CHUNK)[:, ::-1, :].reshape(
            REC, P)
    lo = jnp.min(jnp.where(tri_c >= 0, tri_c, n_tris), axis=1)

    # retirement-safe window origins: suffix minimum, 128-aligned
    suf = jax.lax.associative_scan(jnp.minimum, lo, reverse=True)
    tp = (n_tris + 127) // 128 * 128 + FOLD_WINDOW
    w0 = jnp.clip((suf // 128) * 128, 0, tp - FOLD_WINDOW)

    tri_f = jnp.broadcast_to(tri.astype(jnp.float32)[None, :], (8, P))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((REC, CHUNK), lambda c, *_: (0, c)),
            pl.BlockSpec((8, CHUNK), lambda c, *_: (0, c)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((REC, FOLD_WINDOW), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_t, ovf = pl.pallas_call(
        functools.partial(_fold_kernel, n_chunks, tp),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((REC, tp), jnp.float32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)],
        interpret=interpret,
    )(w0, grads, tri_f)
    return out_t.T[:n_tris], ovf[0]


def fold_band_excess(sorted_tri: Array, n_live, pair_cap: int,
                     n_tris: int, reverse: bool = False) -> Array:
    """How far the scene's triangle-id bands exceed the fold window.

    <= -margin means every bin entry lands inside the sliding window and
    the banded fold is exact (0 overflow); fit.api.autotune_caps uses
    this to decide FPC_FOLD_IMPL and the periodic health check watches it
    drift. Pure XLA, same window-origin construction as banded_fold.
    """
    P = min(pair_cap, sorted_tri.shape[0])
    P = (P // CHUNK) * CHUNK
    if P == 0:
        # sub-chunk cap (health probes with tiny pair_cap): no chunks,
        # nothing can overflow the window
        return jnp.int32(-(1 << 30))
    n_chunks = P // CHUNK
    live = jnp.arange(P, dtype=jnp.int32) < n_live
    tri = jnp.where(live, sorted_tri[:P], -1)
    tri_c = tri.reshape(n_chunks, CHUNK)
    if reverse:
        tri_c = tri_c[::-1]
    lo = jnp.min(jnp.where(tri_c >= 0, tri_c, n_tris), axis=1)
    hi = jnp.max(tri_c, axis=1)
    suf = jax.lax.associative_scan(jnp.minimum, lo, reverse=True)
    tp = (n_tris + 127) // 128 * 128 + FOLD_WINDOW
    w0 = jnp.clip((suf // 128) * 128, 0, tp - FOLD_WINDOW)
    return jnp.max(hi - w0) - (FOLD_WINDOW - 1)


def pixel_grad_pallas(bins: Bins, entry: Array, u: Array, v: Array,
                      extra: Array, g_payload: Array,
                      n_tris: int, height: int, width: int,
                      pair_cap: int | None = None,
                      interpret: bool = False, stacked: bool = False):
    """Per-triangle gradients from per-pixel payload cotangents.

    :param entry: (H, W) f32 winner bin-entry index from the fused
        forward (global-list entries offset by P; -1 = background).
    :param u, v: (H, W) primal perspective-correct barycentrics (payload
        planes 0-1 of the forward).
    :param extra: (N_EXTRA, H, W) forward residual planes
        [D, iw0, iw1, iw2, du02, du12, dv02, dv12].
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
    mt = tiles_per_program(gx, "grad")
    pgx = gx // mt
    bw = mt * TILE_W

    # entry/u/v/extra may arrive pre-padded from the forward (its kernel
    # emits (ph, pw) planes; see rasterize_fused fwd) — skip the copy.
    if entry.shape == (ph, pw):
        entp, up, vp, exp_ = entry, u, v, extra
    else:
        entp = jnp.pad(entry, ((0, ph - height), (0, pw - width)),
                       constant_values=-1.0)
        up = jnp.pad(u, ((0, ph - height), (0, pw - width)))
        vp = jnp.pad(v, ((0, ph - height), (0, pw - width)))
        exp_ = jnp.pad(extra, ((0, 0), (0, ph - height), (0, pw - width)))
    if g_payload.shape[1:] == (ph, pw):
        # padded plane-major pipeline: cotangents arrive in kernel layout
        gpl = g_payload[:N_GPL]
    else:
        gpl = jnp.pad(g_payload[:N_GPL],
                      ((0, 0), (0, ph - height), (0, pw - width)))

    P = bins.sorted_rec_t.shape[1]
    gbase = int(P)

    img = lambda: pl.BlockSpec((TILE_H, bw), lambda i, j, *_: (i, j))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(gy, pgx),
        in_specs=[
            img(),                                   # entry
            img(),                                   # u
            img(),                                   # v
            pl.BlockSpec((N_EXTRA, TILE_H, bw),
                         lambda i, j, *_: (0, i, j)),
            pl.BlockSpec((N_GPL, TILE_H, bw),
                         lambda i, j, *_: (0, i, j)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_H, REC, TILE_W), jnp.float32),  # C rows
            pltpu.VMEM((2, REC, CHUNK), jnp.float32),        # pending x2
            pltpu.VMEM((REC, MAX_GLOBAL), jnp.float32),      # global acc
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )

    grad_pairs_t, grad_global_t = pl.pallas_call(
        functools.partial(_grad_kernel, gx, gy, pgx, mt, gbase),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((REC, P), jnp.float32),
            jax.ShapeDtypeStruct((REC, MAX_GLOBAL), jnp.float32),
        ],
        interpret=interpret,
        # no has_side_effects: it would make the call non-fusible and
        # CHECK-crash XLA-TPU's custom-call fusion pass inside scan bodies
        # (see texture_tpu.py); outputs are consumed, DCE-safe without it.
    )(bins.bin_start, bins.n_global, bins.gblk_ty,
      entp, up, vp, exp_, gpl)

    # Fold bin entries into per-triangle gradients. Valid entries are a
    # contiguous prefix of the sorted order, so a static cap bounds the
    # segment reduction size.
    if pair_cap is None:
        pair_cap = 6 * n_tris
    n_raw = bins.sorted_tri.shape[0]
    pair_cap = min(max(pair_cap, 1), n_raw)
    # Columns past the live prefix are never flushed by the kernel and
    # stay uninitialized (bins partition [0, n_live), so every live
    # chunk column IS fully written) — the live mask zeroes them here.
    n_live = bins.bin_start[-1]

    # Record slots 12 (tri id) and 28-31 (pad) never carry gradient —
    # fold only the 27 live columns (the fold is the stage's dominant
    # XLA cost, linear in folded elements).
    def live_cols(m):
        return jnp.concatenate([m[:, :12], m[:, 13:28]], axis=1)

    import os

    fold_impl = os.environ.get("FPC_FOLD_IMPL", "segment")
    if stacked and fold_impl == "banded_rev":
        # reversing the stacked bin order would interleave samples'
        # descending id bands across the whole window — unbandable.
        # Descending-id scenes use the face-order flip instead
        # (fit.scene.band_reorder descending=True via autotune).
        fold_impl = "segment"
    if fold_impl in ("banded", "banded_rev"):
        # Sliding-window Pallas fold (see banded_fold). The overflow
        # counter is folded into the result as a zero contribution when
        # clean; fit-side health checks validate the band assumption.
        out32, _ovf = banded_fold(grad_pairs_t, bins.sorted_tri, n_live,
                                  pair_cap, n_tris, interpret,
                                  reverse=fold_impl == "banded_rev")
        grad_both = live_cols(out32)
    elif bins.inv_pos is not None:
        # Gather fold (FPC_FOLD_IMPL=gather): each triangle reads its <=K
        # window slots' gradient rows at their precomputed sorted
        # positions and sums them — a (T, K, 27) gather + reshape-sum
        # instead of segment_sum's scatter-add over the bin entries.
        lim = jnp.minimum(jnp.int32(pair_cap), n_live)
        pos = bins.inv_pos                                  # (T, K)
        safe = jnp.minimum(pos, grad_pairs_t.shape[1] - 1)
        rows = live_cols(grad_pairs_t.T)[safe]              # (T, K, 27)
        ok = (pos < lim)[..., None]
        grad_both = jnp.sum(jnp.where(ok, rows, 0.0), axis=1)
    else:
        seg = jnp.minimum(bins.sorted_tri[:pair_cap], n_tris)  # invalid -> T
        live = (jnp.arange(pair_cap, dtype=jnp.int32) < n_live)[:, None]
        grad_both = jax.ops.segment_sum(
            live_cols(jnp.where(live, grad_pairs_t.T[:pair_cap], 0.0)), seg,
            num_segments=n_tris + 1)[:n_tris]

    # Oversized-triangle contributions.
    gidx = jnp.minimum(bins.global_idx, n_tris)
    grad_gboth = jax.ops.segment_sum(live_cols(grad_global_t.T), gidx,
                                     num_segments=n_tris + 1)[:n_tris]
    t27 = grad_both + grad_gboth
    z1 = jnp.zeros((n_tris, 1), jnp.float32)
    total = jnp.concatenate([t27[:, :12], z1, t27[:, 12:],
                             jnp.zeros((n_tris, 4), jnp.float32)], axis=1)
    return total[:, :16], total[:, 16:]

"""Pallas TPU texture sampling: VMEM-resident texture, tile-local matmuls.

TPUs have no gather hardware — XLA lowers per-pixel texture fetches to
serialized gathers (~450M texels/s, round-1's slowest stage at full
resolution). This kernel exploits UV coherence instead: for each
8x128-pixel image tile, the footprint of its texture coordinates is a
small texture patch, and bilinear filtering over the patch is evaluated
densely with hat-function weight matmuls (no gathers):

    sample_p = wy_p^T  P  wx_p
             = rowdot(Wy @ P, Wx)      Wy (1024, PH), P (PH, PW),
                                       Wx (1024, PW)

Round-2 design (vs the round-1 per-tile patch-DMA kernel):

  * The WHOLE texture (all channels, wrap apron included) is DMA'd into a
    persistent VMEM scratch once, at the first grid step; every tile then
    slices its patch from VMEM. This removes the per-tile HBM DMA and its
    serialization (~2-5us x ~2000 tiles) entirely. Textures beyond
    ``RESIDENT_LIMIT`` bytes fall back to the XLA path at the call site.
  * The texture gradient accumulates into a second persistent VMEM
    scratch (sequential TPU grid => race-free) and is flushed to HBM once
    at the last tile — no per-tile read-modify-write round trips.
  * Tiles whose pixels are all background (texc == 0, the fused
    rasterizer's convention for misses) skip the dense math: the forward
    writes the precomputed background sample, the backward skips tiles
    with an all-zero cotangent block.
  * Multi-channel (C <= 4) textures sample per-channel with shared
    weights; ``wrap`` boundary is handled by an 8-row/128-col apron copy
    of the opposite texture edge plus a per-tile seam remap of the
    coordinates, so the kernel itself stays boundary-agnostic.

Semantics (both boundary modes) match ops/texture.py:texture(...,
filter_mode='linear') — the nvdiffrast ``dr.texture`` convention
(reference fit.py:155) — except footprints larger than the patch
(PATCH_H x PATCH_W texels per tile), which clamp into the patch; use the
XLA path or mipmaps for heavy minification.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

TILE_H = 8
TILE_W = 128
NPIX = TILE_H * TILE_W
PATCH_H = 64           # per-tile texture footprint bound in rows (8-aligned)
PATCH_W = 256          # texture patch cols (two lane tiles; 128-aligned)
# Texel rows matmul'd per PIXEL row: one image row's 128 pixels span few
# texel rows (plus 8-aligned origin slack and the bilinear +1), so the
# patch matmuls contract (SUB_H, PATCH_W) sub-patches instead of the
# full (PATCH_H, PATCH_W) patch — a ~2.7x FLOP cut on the MXU-dominant
# stage. Rows whose footprint exceeds SUB_H - 9 clamp, the same bound
# doctrine as the per-tile patch (which clamps at PATCH_H - 2); textures
# of height <= 16 (after the wrap seam remap) are always exact.
SUB_H = int(__import__("os").environ.get("FPC_TEX_SUBH", "16"))
# Max bytes of (extended, all-channel) texture held resident in VMEM.
# Forward holds one copy, backward two (texture + gradient accumulator).
RESIDENT_LIMIT = 7 * 2 ** 20
# v5e/v5p have 128 MB of VMEM; the default scoped limit is 16 MB, which
# the resident-texture design (texture + grad accumulator + weight
# intermediates) exceeds at 1024^2 — raise it explicitly.
VMEM_LIMIT = 96 * 2 ** 20
# Mosaic supports only DEFAULT (bf16, ~4e-3 relative — too lossy for
# texel-exact parity) and HIGHEST (fp32 contract) dot precision.
PRECISION = jax.lax.Precision.HIGHEST
# FPC_TEX_FWD_PREC=fast drops the FORWARD bilinear sampling matmuls to
# DEFAULT (single-pass bf16): ~4e-3 error on sampled texel values —
# below one 8-bit grey level, i.e. under the reference imagery's own
# quantization — for ~6x fewer MXU passes in the fused forward kernel's
# texture tail (HIGHEST f32 emulation is the multi-pass split). OPT-IN:
# the primal render is no longer texel-exact under this knob.
FWD_PRECISION = (jax.lax.Precision.DEFAULT
                 if __import__("os").environ.get(
                     "FPC_TEX_FWD_PREC", "exact") == "fast"
                 else jax.lax.Precision.HIGHEST)
# FPC_TEX_PREC=fast drops the BACKWARD's coordinate-gradient contractions
# (b = sub @ wx, b2 = sub @ dwx — 2 of the 3 matmuls per row) to DEFAULT
# (bf16) precision: ~4e-3 relative noise on gtu/gtv only; the texel
# gradient (gtex) and the forward stay HIGHEST/exact. fast2 additionally
# drops the texel-gradient contraction (gsub -> gtex).
#
# DEFAULT = fast2 since round 5: the gradient noise is convergence-
# validated as indistinguishable from SGD sampling noise — the knob
# runs' final loss/pose-error land BETWEEN two exact runs that differ
# only in sampling seed (results/precision*/precision.md; 9-cam rig fit,
# 3000 steps: exact seeds 50.4/45.9 loss & 0.224/0.253 pose err vs
# fast 48.5/0.240, fast2 47.5/0.237). FPC_TEX_PREC=exact restores
# HIGHEST everywhere; the forward is HIGHEST in every mode.
_TEX_PREC = __import__("os").environ.get("FPC_TEX_PREC", "fast2")
GRAD_PRECISION = (jax.lax.Precision.DEFAULT
                  if _TEX_PREC in ("fast", "fast2")
                  else jax.lax.Precision.HIGHEST)
GSUB_PRECISION = (jax.lax.Precision.DEFAULT if _TEX_PREC == "fast2"
                  else jax.lax.Precision.HIGHEST)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_hw(h, w):
    return _round_up(h, TILE_H), _round_up(w, TILE_W)


def _wrow(local_row, n):
    """(n, TILE_W) hat-function weights for one pixel row on the lanes.

    ``local_row`` is (1, TILE_W) patch-local coordinates; row i holds the
    weight of texel i for each pixel: relu(1 - |local - i|). Keeping
    pixels on the lane axis means every operand in the kernel is a full
    (sublane, lane) tile — no (N, 1) buffers (XLA pads those to 128
    lanes: a 128x memory blowup that dominated the round-1 kernel).
    """
    i = jax.lax.broadcasted_iota(jnp.int32, (n, TILE_W), 0).astype(
        jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(local_row - i))


def _dwrow(local_row, n):
    """d/dlocal of _wrow: -sign(local - i) where |.| < 1."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, TILE_W), 0).astype(
        jnp.float32)
    d = local_row - i
    return jnp.where(jnp.abs(d) < 1.0, -jnp.sign(d), 0.0)


def _wrow_pair(local_row, n):
    """(_wrow, _dwrow) sharing the distance computation."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, TILE_W), 0).astype(
        jnp.float32)
    d = local_row - i
    a = jnp.abs(d)
    w = jnp.maximum(0.0, 1.0 - a)
    dw = jnp.where(a < 1.0, -jnp.sign(d), 0.0)
    return w, dw


# The X contraction has two implementations (FPC_TEX_IMPL):
#   hat     — dense (PATCH_W, 128) hat-weight matmuls (round-2 design).
#   onehot  — one (PATCH_W, 128) one-hot at floor(ls) selects texel
#             column s0 by matmul; texel s0+1 comes from the SAME one-hot
#             against a lane-rolled patch (and, in the backward's texel
#             scatter, from lane-rolling the result) — so only one wide
#             plane is ever constructed. The bilinear lerp/derivative
#             recombination then runs on (SUB_H, 128) shapes. Both passes
#             are hat-CONSTRUCTION bound on the VPU (~4 vector ops per
#             (PATCH_W, 128) plane); onehot builds one plane (2 ops)
#             instead of one (fwd) / two (bwd) hat planes (4/7 ops).
# Derivative semantics match _dwrow exactly, including the fs == 0
# subgradient (where both hat rows are 0): the recombined derivative is
# gated to zero there.
_TEX_IMPL = __import__("os").environ.get("FPC_TEX_IMPL", "hat")

# The gtex accumulation has two implementations (FPC_TEX_BWD):
#   rowrmw  — each pixel row read-modify-writes its (SUB_H, PATCH_W)
#             window of the VMEM gtex accumulator (round-2 design):
#             8 x C dependent dynamic-offset RMWs per tile, the
#             device-trace #2 op of the round-4 step (35.1 ms).
#   tileacc — rows accumulate into a (TSUB, PATCH_W) register-backed
#             value at a shared per-tile row origin (the min of the 8
#             per-row origins); ONE RMW flush per tile per channel.
#             The row's gradient lands at tile-relative rows via hat
#             weights built from ltr + dt (dt = row origin - tile
#             origin, an exact integer shift), so results match rowrmw
#             up to f32 summation order whenever each row's SUB_H
#             window fits the TSUB tile window; rows that don't fit
#             (tile spans > TSUB texel rows, e.g. a uv-seam tile) take
#             a predicated per-row RMW fallback with exact rowrmw
#             placement. Only the hat X-contraction supports tileacc;
#             onehot falls back to rowrmw.
_TEX_BWD = __import__("os").environ.get("FPC_TEX_BWD", "rowrmw")
TSUB = int(__import__("os").environ.get("FPC_TEX_TSUB", "32"))
if _TEX_BWD == "tileacc":
    # An unaligned TSUB breaks the pl.multiple_of(t0t, TILE_H) hint
    # (unaligned dynamic sublane slice -> Mosaic error or miscompile)
    # and TSUB > PATCH_H makes he - TSUB negative for minimum-padded
    # textures; TSUB < SUB_H would mask out every row.
    if TSUB % TILE_H != 0 or not (SUB_H <= TSUB <= PATCH_H):
        raise ValueError(
            f"FPC_TEX_TSUB={TSUB} invalid for FPC_TEX_BWD=tileacc: "
            f"need TSUB % {TILE_H} == 0 and {SUB_H} <= TSUB <= {PATCH_H}")

# FPC_TEX_ROWS=fori rolls the backward's 8-row loop into a
# lax.fori_loop (dynamic sublane slices; ~8x smaller Mosaic program per
# tile). The production width 1600px pads to gx = 13 tile columns — a
# PRIME, so tiles_per_program silently degrades the intended mt=8
# amortization to mt=1; the rolled row loop makes mt=13 (one program
# per 8-row band) compile-safe, amortizing per-program overhead over
# the whole band. rowrmw + hat only.
_TEX_ROWS = __import__("os").environ.get("FPC_TEX_ROWS", "unroll")


def _xsel(local_row, n):
    """(one-hot at floor(local), fraction) for the onehot X contraction."""
    s0 = jnp.floor(local_row)                       # (1, TILE_W)
    fs = local_row - s0
    i = jax.lax.broadcasted_iota(jnp.int32, (n, TILE_W), 0).astype(
        jnp.float32)
    return (i == s0).astype(jnp.float32), fs


def _sel2(sub, oh0):
    """(texel s0, texel s0 + 1) per pixel: one one-hot contraction of the
    patch and one of the lane-rolled patch (column i of the roll = column
    i + 1 of the patch; ls is clipped below PATCH_W - 1, so the wrapped
    column is never selected)."""
    A0 = jax.lax.dot_general(sub, oh0, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=PRECISION)   # (SUB_H, 128)
    subr = _roll_lanes(sub, sub.shape[1] - 1)
    A1 = jax.lax.dot_general(subr, oh0, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=PRECISION)
    return A0, A1


def _bilin_x(sub, oh0, fs):
    """X-direction bilinear lerp == sub @ _wrow(ls): (1-fs) A0 + fs A1.

    (1 - fs) is exact in f32 (Sterbenz), so this matches the hat matmul
    to within one rounding of each product."""
    A0, A1 = _sel2(sub, oh0)
    return (1.0 - fs) * A0 + fs * A1


def _roll_lanes(x, shift):
    """Circular lane shift (axis 1); falls back to a slice-concat roll
    where the Mosaic roll primitive is unavailable (interpret mode)."""
    try:
        return pltpu.roll(x, shift=shift, axis=1)
    except Exception:
        n = x.shape[1]
        return jnp.concatenate([x[:, shift % n:], x[:, :shift % n]], axis=1)


# ----------------------------------------------------------------------------
# XLA-side preparation
# ----------------------------------------------------------------------------

def extended_shape(tex_h: int, tex_w: int, boundary_mode: str):
    """Resident-plane shape: apron for wrap, patch-minimum padding always."""
    if boundary_mode == "wrap":
        # Patch-sized apron: a seam-remapped tile footprint starts at up
        # to size-1 and extends a full patch past the seam.
        he = _round_up(tex_h + PATCH_H, TILE_H)
        we = _round_up(tex_w + PATCH_W, TILE_W)
    else:
        he, we = tex_h, tex_w
    he = _round_up(max(he, PATCH_H), TILE_H)
    we = _round_up(max(we, PATCH_W), TILE_W)
    return he, we


def resident_bytes(tex_h: int, tex_w: int, channels: int,
                   boundary_mode: str) -> int:
    he, we = extended_shape(tex_h, tex_w, boundary_mode)
    return channels * he * we * 4


def _extend_texture(tex: Array, boundary_mode: str) -> Array:
    """(TH, TW, C) -> (C, THe, TWe) resident planes with wrap apron."""
    th, tw, c = tex.shape
    planes = jnp.transpose(tex, (2, 0, 1))
    if boundary_mode == "wrap":
        planes = jnp.concatenate(
            [planes, planes[:, :min(PATCH_H, th), :]], axis=1)
        planes = jnp.concatenate(
            [planes, planes[:, :, :min(PATCH_W, tw)]], axis=2)
    he, we = extended_shape(th, tw, boundary_mode)
    return jnp.pad(planes, ((0, 0), (0, he - planes.shape[1]),
                            (0, we - planes.shape[2])))


def _texel_coords(texc: Array, tex_h: int, tex_w: int, boundary_mode: str):
    """(H, W, 2) uv -> (s, t) extended-space texel coords, each (H, W)."""
    s = texc[..., 0] * tex_w - 0.5
    t = texc[..., 1] * tex_h - 0.5
    if boundary_mode == "wrap":
        s = jnp.mod(s, tex_w)
        t = jnp.mod(t, tex_h)
    else:
        s = jnp.clip(s, 0.0, tex_w - 1.001)
        t = jnp.clip(t, 0.0, tex_h - 1.001)
    return s, t


def _seam_remap(c4: Array, size: int, boundary_mode: str) -> Array:
    """Per-tile wrap-seam fix: tiles whose coords straddle the 0/size seam
    get their low coords shifted by +size so the footprint is contiguous
    in the extended (apron) plane. c4 is (gy, TILE_H, gx, TILE_W)."""
    if boundary_mode != "wrap":
        return c4
    mn = jnp.min(c4, axis=(1, 3), keepdims=True)
    mx = jnp.max(c4, axis=(1, 3), keepdims=True)
    shifted = jnp.where(c4 < 0.5 * size, c4 + size, c4)
    mns = jnp.min(shifted, axis=(1, 3), keepdims=True)
    mxs = jnp.max(shifted, axis=(1, 3), keepdims=True)
    # Remap only when shifting the low coords past the seam makes the
    # footprint tighter (a genuine seam crossing) — a merely wide direct
    # footprint must stay put.
    seam = (mxs - mns) < (mx - mn)
    return jnp.where(seam, shifted, c4)


def _prep(tex: Array, texc: Array, boundary_mode: str):
    """All XLA-side preparation shared by forward and backward.

    :return: (tex_planes (C, THe, TWe), ls (patch-local s), lt (absolute
        extended-plane t), t0r (n_tiles * TILE_H,) per-pixel-row sub-patch
        origins, c0 (n_tiles,) patch col origins, live (n_tiles,) i32,
        masks (s_in, t_in) for coordinate-gradient gating, geometry).
    """
    th, tw, c = tex.shape
    h, w = texc.shape[0], texc.shape[1]
    ph, pw = _pad_hw(h, w)

    s, t = _texel_coords(texc, th, tw, boundary_mode)
    # edge-pad so padded pixels don't distort the per-tile patch origin
    s = jnp.pad(s, ((0, ph - h), (0, pw - w)), mode="edge")
    t = jnp.pad(t, ((0, ph - h), (0, pw - w)), mode="edge")
    uvp = jnp.pad(texc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    uv_nonzero = jnp.any(uvp != 0.0, axis=-1)
    sr = tr = None
    if boundary_mode != "wrap":
        sr = texc[..., 0] * tw - 0.5
        tr = texc[..., 1] * th - 0.5
        sr = jnp.pad(sr, ((0, ph - h), (0, pw - w)), mode="edge")
        tr = jnp.pad(tr, ((0, ph - h), (0, pw - w)), mode="edge")
    return _prep_from_st(tex, s, t, uv_nonzero, sr, tr, h, w,
                         boundary_mode)


def _prep_from_st(tex: Array, s: Array, t: Array, uv_nonzero: Array,
                  sr, tr, h: int, w: int, boundary_mode: str):
    """Core of :func:`_prep` from already-padded (ph, pw) texel-coordinate
    images (``sr``/``tr`` are the unclamped coords for the clamp-mode
    border gate; None under wrap)."""
    th, tw, c = tex.shape
    he, we = extended_shape(th, tw, boundary_mode)
    tex_planes = _extend_texture(tex, boundary_mode)

    ph, pw = s.shape
    gy, gx = ph // TILE_H, pw // TILE_W

    s4 = _seam_remap(s.reshape(gy, TILE_H, gx, TILE_W), tw, boundary_mode)
    t4 = _seam_remap(t.reshape(gy, TILE_H, gx, TILE_W), th, boundary_mode)

    min_s = jnp.min(s4, axis=(1, 3))
    c0 = jnp.clip(((jnp.floor(min_s).astype(jnp.int32) - 1) // TILE_W)
                  * TILE_W, 0, we - PATCH_W).reshape(-1)

    # Per-(tile, pixel-row) texel-row origin for the SUB_H sub-patch
    # matmuls, 8-aligned for the VMEM sublane slice. Layout matches the
    # kernel's scalar index tile * TILE_H + r.
    min_tr = jnp.min(t4, axis=3)                          # (gy, TILE_H, gx)
    t0r3 = jnp.clip((jnp.floor(min_tr).astype(jnp.int32) // TILE_H)
                    * TILE_H, 0, he - SUB_H)
    t0r = jnp.transpose(t0r3, (0, 2, 1)).reshape(-1)      # (n_tiles*TILE_H,)

    c0f = c0.reshape(gy, 1, gx, 1).astype(jnp.float32)
    t0rf = t0r3.astype(jnp.float32)[..., None]            # (gy, TILE_H, gx, 1)
    ls4 = jnp.clip(s4 - c0f, 0.0, PATCH_W - 1.001)
    # t stays ABSOLUTE (extended-plane texel rows); the kernel subtracts
    # its row origin and clamps into the sub-patch.
    lt4 = jnp.clip(t4, 0.0, he - 1.001)

    # Coordinate-gradient gates: zero where the hat-weight subgradient is
    # invalid — at the clamped texture border (clamp mode only; wrap is
    # periodic and smooth across the seam) and where the patch clamps.
    s_in = (s4 - c0f > 0.0) & (s4 - c0f < PATCH_W - 1.001)
    t_in = (t4 - t0rf > 0.0) & (t4 - t0rf < SUB_H - 1.001)
    if boundary_mode != "wrap":
        s_in &= ((sr > 0.0) & (sr < tw - 1.001)).reshape(s4.shape)
        t_in &= ((tr > 0.0) & (tr < th - 1.001)).reshape(t4.shape)

    # Live tiles: any pixel with texc != (0, 0). Background pixels carry
    # exactly (0, 0) (ops/rasterize.py fused outputs), and a real pixel at
    # exactly (0, 0) samples the same value the background path writes.
    uv4 = uv_nonzero.reshape(gy, TILE_H, gx, TILE_W)
    live = jnp.any(uv4, axis=(1, 3)).reshape(-1).astype(jnp.int32)

    def img(x4):
        return x4.reshape(ph, pw)

    geom = (th, tw, c, he, we, h, w, ph, pw, gy, gx)
    return (tex_planes, img(ls4), img(lt4), t0r, c0, live,
            img(s_in.astype(jnp.float32)), img(t_in.astype(jnp.float32)),
            geom)


def _img_spec(bw):
    return pl.BlockSpec((TILE_H, bw), lambda i, j, *_: (i, j))


# ----------------------------------------------------------------------------
# Kernels
# ----------------------------------------------------------------------------

def _fwd_kernel(C: int, gx: int, mt: int,
                # scalar prefetch
                t0r_ref, c0_ref, live_ref, bg_ref,
                # inputs
                tex_hbm, ls_ref, lt_ref,
                # outputs: C sample planes, then scratch
                *refs):
    out_refs = refs[:C]
    tex_vmem, sem = refs[C], refs[C + 1]
    ti = pl.program_id(0)
    pj = pl.program_id(1)

    @pl.when((ti == 0) & (pj == 0))
    def _():
        dma = pltpu.make_async_copy(tex_hbm, tex_vmem, sem)
        dma.start()
        dma.wait()

    for s in range(mt):
        cols = slice(s * TILE_W, (s + 1) * TILE_W)
        tile = ti * gx + pj * mt + s
        live = live_ref[tile] > 0

        @pl.when(live)
        def _(cols=cols, tile=tile):
            c0 = pl.multiple_of(c0_ref[tile], TILE_W)
            rows = [[] for _ in range(C)]
            for r in range(TILE_H):
                t0r = pl.multiple_of(t0r_ref[tile * TILE_H + r], TILE_H)
                ltr = jnp.clip(
                    lt_ref[r:r + 1, cols] - t0r.astype(jnp.float32),
                    0.0, SUB_H - 1.001)
                wy = _wrow(ltr, SUB_H)                      # (SUB_H, 128)
                lsr = ls_ref[r:r + 1, cols]
                if _TEX_IMPL == "onehot":
                    oh0, fs = _xsel(lsr, PATCH_W)
                else:
                    wx = _wrow(lsr, PATCH_W)                # (PW, 128)
                for c in range(C):
                    sub = tex_vmem[c, pl.ds(t0r, SUB_H), pl.ds(c0, PATCH_W)]
                    if _TEX_IMPL == "onehot":
                        b = _bilin_x(sub, oh0, fs)
                    else:
                        b = jnp.dot(sub, wx,
                                    preferred_element_type=jnp.float32,
                                    precision=FWD_PRECISION)  # (SUB_H, 128)
                    rows[c].append(jnp.sum(wy * b, axis=0, keepdims=True))
            for c in range(C):
                out_refs[c][:, cols] = jnp.concatenate(rows[c], axis=0)

        @pl.when(jnp.logical_not(live))
        def _(cols=cols):
            for c in range(C):
                out_refs[c][:, cols] = jnp.full((TILE_H, TILE_W), bg_ref[c])


def _bwd_kernel(C: int, gx: int, gy: int, pgx: int, mt: int,
                # scalar prefetch
                t0r_ref, c0_ref, live_ref,
                # inputs
                tex_hbm, ls_ref, lt_ref,
                # then C cotangent planes, outputs, scratch
                *refs):
    g_refs = refs[:C]
    gs_ref, gt_ref, gtex_out_hbm = refs[C], refs[C + 1], refs[C + 2]
    tex_vmem, gtex_vmem, sem, out_sem = refs[C + 3:C + 7]
    ti = pl.program_id(0)
    pj = pl.program_id(1)

    @pl.when((ti == 0) & (pj == 0))
    def _():
        dma = pltpu.make_async_copy(tex_hbm, tex_vmem, sem)
        dma.start()
        for c in range(C):
            gtex_vmem[c] = jnp.zeros_like(gtex_vmem[c])
        dma.wait()

    he = tex_vmem.shape[1]
    tileacc = _TEX_BWD == "tileacc" and _TEX_IMPL != "onehot"
    fori = (_TEX_ROWS == "fori" and not tileacc and _TEX_IMPL != "onehot")
    for s in range(mt):
        cols = slice(s * TILE_W, (s + 1) * TILE_W)
        tile = ti * gx + pj * mt + s
        live = live_ref[tile] > 0

        if fori:

            @pl.when(live)
            def _(cols=cols, tile=tile):
                c0 = pl.multiple_of(c0_ref[tile], TILE_W)
                # whole-tile blocks once; rows extracted/accumulated via
                # (TILE_H, 1) one-hots — Mosaic forbids UNALIGNED dynamic
                # sublane slices, so per-row pl.ds(r, 1) is illegal here
                ls_blk = ls_ref[:, cols]
                lt_blk = lt_ref[:, cols]
                g_blks = [g_refs[c][:, cols] for c in range(C)]

                def row(r, carry):
                    gs_img, gt_img = carry
                    t0r = pl.multiple_of(t0r_ref[tile * TILE_H + r],
                                         TILE_H)
                    oh = (jax.lax.broadcasted_iota(
                        jnp.int32, (TILE_H, 1), 0) == r).astype(jnp.float32)
                    lsr = jnp.sum(ls_blk * oh, axis=0, keepdims=True)
                    ltr = jnp.clip(
                        jnp.sum(lt_blk * oh, axis=0, keepdims=True)
                        - t0r.astype(jnp.float32),
                        0.0, SUB_H - 1.001)
                    wx, dwx = _wrow_pair(lsr, PATCH_W)
                    wy, dwy = _wrow_pair(ltr, SUB_H)
                    gs_acc = jnp.zeros((1, TILE_W), jnp.float32)
                    gt_acc = jnp.zeros((1, TILE_W), jnp.float32)
                    for c in range(C):
                        g = jnp.sum(g_blks[c] * oh, axis=0, keepdims=True)
                        sub = tex_vmem[c, pl.ds(t0r, SUB_H),
                                       pl.ds(c0, PATCH_W)]
                        gsub = jax.lax.dot_general(
                            wy * g, wx, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=GSUB_PRECISION)
                        cur = gtex_vmem[c, pl.ds(t0r, SUB_H),
                                        pl.ds(c0, PATCH_W)]
                        gtex_vmem[c, pl.ds(t0r, SUB_H),
                                  pl.ds(c0, PATCH_W)] = cur + gsub
                        b = jnp.dot(sub, wx,
                                    preferred_element_type=jnp.float32,
                                    precision=GRAD_PRECISION)
                        b2 = jnp.dot(sub, dwx,
                                     preferred_element_type=jnp.float32,
                                     precision=GRAD_PRECISION)
                        gs_acc += jnp.sum(wy * b2, axis=0,
                                          keepdims=True) * g
                        gt_acc += jnp.sum(dwy * b, axis=0,
                                          keepdims=True) * g
                    return (gs_img + oh * gs_acc, gt_img + oh * gt_acc)

                gs_img, gt_img = jax.lax.fori_loop(
                    0, TILE_H, row,
                    (jnp.zeros((TILE_H, TILE_W), jnp.float32),
                     jnp.zeros((TILE_H, TILE_W), jnp.float32)))
                gs_ref[:, cols] = gs_img
                gt_ref[:, cols] = gt_img

            @pl.when(jnp.logical_not(live))
            def _(cols=cols):
                gs_ref[:, cols] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
                gt_ref[:, cols] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            continue

        @pl.when(live)
        def _(cols=cols, tile=tile):
            c0 = pl.multiple_of(c0_ref[tile], TILE_W)
            if tileacc:
                t0s = [t0r_ref[tile * TILE_H + r] for r in range(TILE_H)]
                t0t = functools.reduce(jnp.minimum, t0s)
                t0t = pl.multiple_of(jnp.minimum(t0t, he - TSUB), TILE_H)
                accs = [jnp.zeros((TSUB, PATCH_W), jnp.float32)
                        for _ in range(C)]
            gs_rows = []
            gt_rows = []
            for r in range(TILE_H):
                t0r = pl.multiple_of(t0r_ref[tile * TILE_H + r], TILE_H)
                lsr = ls_ref[r:r + 1, cols]
                ltr = jnp.clip(
                    lt_ref[r:r + 1, cols] - t0r.astype(jnp.float32),
                    0.0, SUB_H - 1.001)
                onehot = _TEX_IMPL == "onehot"
                if onehot:
                    oh0, fs = _xsel(lsr, PATCH_W)
                    # _dwrow's fs == 0 subgradient: both hat rows are 0
                    live_x = (fs > 0.0).astype(jnp.float32)
                else:
                    wx, dwx = _wrow_pair(lsr, PATCH_W)      # (PW, 128) x2
                wy, dwy = _wrow_pair(ltr, SUB_H)            # (SUB_H, 128) x2
                if tileacc:
                    dt = t0r - t0t
                    fits = dt <= TSUB - SUB_H
                    # Tile-relative hat weights: exact integer row shift
                    # of wy (zeros everywhere when the window doesn't
                    # fit, via the mask — partial-overlap rows must not
                    # leak a truncated gradient into the accumulator).
                    m = fits.astype(jnp.float32)
                    wy_t = _wrow(ltr + dt.astype(jnp.float32), TSUB) * m
                gs_acc = jnp.zeros((1, TILE_W), jnp.float32)
                gt_acc = jnp.zeros((1, TILE_W), jnp.float32)
                for c in range(C):
                    g = g_refs[c][r:r + 1, cols]            # (1, 128)
                    sub = tex_vmem[c, pl.ds(t0r, SUB_H), pl.ds(c0, PATCH_W)]
                    wg = wy * g                             # (SUB_H, 128)
                    if onehot:
                        # texel gradients: contributions to s0 and s0 + 1
                        # use the same one-hot; the +1 column shift happens
                        # on the RESULT (lane roll), not via a second plane
                        g0 = jax.lax.dot_general(
                            wg * (1.0 - fs), oh0, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=PRECISION)            # (SUB_H, PW)
                        g1 = jax.lax.dot_general(
                            wg * fs, oh0, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=PRECISION)
                        gsub = g0 + _roll_lanes(g1, 1)
                        cur = gtex_vmem[c, pl.ds(t0r, SUB_H),
                                        pl.ds(c0, PATCH_W)]
                        gtex_vmem[c, pl.ds(t0r, SUB_H),
                                  pl.ds(c0, PATCH_W)] = cur + gsub
                    elif tileacc:
                        # gsub32 = (wy_t * g) @ wx^T at tile-relative rows
                        # (GSUB_PRECISION so FPC_TEX_PREC=fast2 has the
                        # same texel-gradient semantics as rowrmw/fori)
                        accs[c] = accs[c] + jax.lax.dot_general(
                            wy_t * g, wx,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=GSUB_PRECISION)       # (TSUB, PW)

                        @pl.when(jnp.logical_not(fits))
                        def _(wg=wg, wx=wx, t0r=t0r, c0=c0, c=c):
                            gsub = jax.lax.dot_general(
                                wg, wx, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=GSUB_PRECISION)
                            cur = gtex_vmem[c, pl.ds(t0r, SUB_H),
                                            pl.ds(c0, PATCH_W)]
                            gtex_vmem[c, pl.ds(t0r, SUB_H),
                                      pl.ds(c0, PATCH_W)] = cur + gsub
                    else:
                        # gsub = (wy * g) @ wx^T
                        gsub = jax.lax.dot_general(
                            wg, wx,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=GSUB_PRECISION)
                        cur = gtex_vmem[c, pl.ds(t0r, SUB_H),
                                        pl.ds(c0, PATCH_W)]
                        gtex_vmem[c, pl.ds(t0r, SUB_H),
                                  pl.ds(c0, PATCH_W)] = cur + gsub
                    # coordinate gradients
                    if onehot:
                        A0, A1 = _sel2(sub, oh0)
                        b = (1.0 - fs) * A0 + fs * A1       # == sub @ wx
                        b2 = live_x * (A1 - A0)             # == sub @ dwx
                    else:
                        b = jnp.dot(sub, wx,
                                    preferred_element_type=jnp.float32,
                                    precision=GRAD_PRECISION)  # (SUB_H,128)
                        b2 = jnp.dot(sub, dwx,
                                     preferred_element_type=jnp.float32,
                                     precision=GRAD_PRECISION)
                    gs_acc += jnp.sum(wy * b2, axis=0, keepdims=True) * g
                    gt_acc += jnp.sum(dwy * b, axis=0, keepdims=True) * g
                gs_rows.append(gs_acc)
                gt_rows.append(gt_acc)
            if tileacc:
                for c in range(C):
                    cur = gtex_vmem[c, pl.ds(t0t, TSUB), pl.ds(c0, PATCH_W)]
                    gtex_vmem[c, pl.ds(t0t, TSUB), pl.ds(c0, PATCH_W)] = (
                        cur + accs[c])
            gs_ref[:, cols] = jnp.concatenate(gs_rows, axis=0)
            gt_ref[:, cols] = jnp.concatenate(gt_rows, axis=0)

        @pl.when(jnp.logical_not(live))
        def _(cols=cols):
            gs_ref[:, cols] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            gt_ref[:, cols] = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    @pl.when((ti == gy - 1) & (pj == pgx - 1))
    def _():
        dma = pltpu.make_async_copy(gtex_vmem, gtex_out_hbm, out_sem)
        dma.start()
        dma.wait()


# ----------------------------------------------------------------------------
# Public entry
# ----------------------------------------------------------------------------

def _background_sample(tex: Array, boundary_mode: str) -> Array:
    """(C,) sample at texc == (0, 0) — the value background tiles write."""
    from fpc_diffrend_tpu.ops.texture import texture as texture_xla

    uv0 = jnp.zeros((1, 1, 2), jnp.float32)
    return jax.lax.stop_gradient(
        texture_xla(tex, uv0, boundary_mode=boundary_mode)[0, 0])


def _texture_fwd_impl(tex, texc, boundary_mode, interpret):
    squeeze = tex.ndim == 2
    tex3 = tex[..., None] if squeeze else tex
    (tex_planes, ls, lt, t0r, c0, live, _s_in, _t_in,
     geom) = _prep(tex3, texc, boundary_mode)
    th, tw, C, he, we, h, w, ph, pw, gy, gx = geom
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import tiles_per_program
    mt = tiles_per_program(gx, "tex")
    pgx, bw = gx // mt, mt * TILE_W
    bg = _background_sample(tex3, boundary_mode)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(gy, pgx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  _img_spec(bw), _img_spec(bw)],
        out_specs=[_img_spec(bw)] * C,
        scratch_shapes=[pltpu.VMEM((C, he, we), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, C, gx, mt),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ph, pw), jnp.float32)
                   for _ in range(C)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(t0r, c0, live, bg, tex_planes, ls, lt)
    out = jnp.stack([o[:h, :w] for o in outs], axis=-1)
    return out[..., 0:] if not squeeze else out[..., 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _texture_core(tex: Array, texc: Array, boundary_mode: str,
                  interpret: bool) -> Array:
    return _texture_fwd_impl(tex, texc, boundary_mode, interpret)


def _texture_vjp_fwd(tex, texc, boundary_mode, interpret):
    return _texture_fwd_impl(tex, texc, boundary_mode, interpret), (tex, texc)


def _texture_vjp_bwd(boundary_mode, interpret, res, g):
    tex, texc = res
    squeeze = tex.ndim == 2
    tex3 = tex[..., None] if squeeze else tex
    g3 = g[..., None] if squeeze else g
    (tex_planes, ls, lt, t0r, c0, _live, s_in, t_in,
     geom) = _prep(tex3, texc, boundary_mode)
    th, tw, C, he, we, h, w, ph, pw, gy, gx = geom
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import tiles_per_program
    mt = tiles_per_program(gx, "tex")
    pgx, bw = gx // mt, mt * TILE_W

    gpad = jnp.pad(g3, ((0, ph - h), (0, pw - w), (0, 0)))
    g4 = gpad.reshape(gy, TILE_H, gx, TILE_W, C)
    # Backward liveness is driven by the cotangent, not coverage: any tile
    # with a nonzero g block contributes (including background tiles whose
    # constant sample feeds antialiasing).
    live_b = jnp.any(g4 != 0.0, axis=(1, 3, 4)).reshape(-1).astype(jnp.int32)
    g_planes = [gpad[..., c] for c in range(C)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(gy, pgx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  _img_spec(bw), _img_spec(bw)]
        + [_img_spec(bw)] * C,
        out_specs=[_img_spec(bw), _img_spec(bw),
                   pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[pltpu.VMEM((C, he, we), jnp.float32),
                        pltpu.VMEM((C, he, we), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
    )
    gs_img, gt_img, gtex_planes = pl.pallas_call(
        functools.partial(_bwd_kernel, C, gx, gy, pgx, mt),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ph, pw), jnp.float32),
                   jax.ShapeDtypeStruct((ph, pw), jnp.float32),
                   jax.ShapeDtypeStruct((C, he, we), jnp.float32)],
        interpret=interpret,
        # NOTE: no has_side_effects — a side-effecting custom call is not
        # IsFusible() and XLA-TPU's custom-call consumer-fusion pass
        # CHECK-crashes building a fusion rooted at it when the call sits
        # in a scan body with dynamic-slice operands. Outputs are consumed,
        # so DCE protection is not needed.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(t0r, c0, live_b, tex_planes, ls, lt, *g_planes)

    # Block consumer fusion into the multi-output custom call: the XLA-TPU
    # fusion pass (TpuInstructionFusion consumer-fusion analysis) crashes
    # when downstream elementwise ops fuse into this tuple producer.
    gs_img, gt_img, gtex_planes = jax.lax.optimization_barrier(
        (gs_img, gt_img, gtex_planes))

    gs = (gs_img * s_in)[:h, :w]
    gt = (gt_img * t_in)[:h, :w]
    gtexc = jnp.stack([gs * tw, gt * th], axis=-1)

    # Fold the wrap apron back onto the true texel grid.
    gtex = jnp.transpose(gtex_planes, (1, 2, 0))          # (THe, TWe, C)
    if boundary_mode == "wrap":
        ah, aw = min(PATCH_H, th), min(PATCH_W, tw)
        gtex = gtex.at[:ah, :].add(gtex[th:th + ah, :])
        gtex = gtex.at[:, :aw].add(gtex[:, tw:tw + aw])
    gtex = gtex[:th, :tw]
    gtex_out = gtex[..., 0] if squeeze else gtex
    return gtex_out, gtexc


_texture_core.defvjp(_texture_vjp_fwd, _texture_vjp_bwd)


def texture_pallas(tex: Array, texc: Array, boundary_mode: str = "clamp",
                   interpret: bool = False) -> Array:
    """Bilinear texture sampling via the resident-VMEM matmul kernel.

    :param tex: (TH, TW, C) texture, C <= 4 (or (TH, TW)).
    :param texc: (H, W, 2) uv coordinates.
    :param boundary_mode: 'clamp' or 'wrap' (nvdiffrast's default).
    :return: (H, W, C) samples (or (H, W) for a 2-D texture).

    Textures too large to hold resident in VMEM raise ValueError — gate
    with :func:`fits_resident` and fall back to ops.texture.texture.
    """
    th, tw = tex.shape[0], tex.shape[1]
    c = tex.shape[2] if tex.ndim == 3 else 1
    if not fits_resident(th, tw, c, boundary_mode):
        raise ValueError(
            f"texture {tex.shape} exceeds the VMEM-resident limit; "
            "use ops.texture.texture")
    return _texture_core(tex, texc, boundary_mode, interpret)


def fits_resident(tex_h: int, tex_w: int, channels: int,
                  boundary_mode: str = "clamp") -> bool:
    return (channels <= 4
            and resident_bytes(tex_h, tex_w, channels,
                               boundary_mode) <= RESIDENT_LIMIT)


# ----------------------------------------------------------------------------
# Plane-major padded entry (the production fused pipeline)
# ----------------------------------------------------------------------------

def _prep_planes(tex3: Array, tu: Array, tv: Array, h: int, w: int,
                 boundary_mode: str):
    """:func:`_prep` for already tile-padded (ph, pw) uv planes (the fused
    rasterizer's payload planes 3-4). Pad pixels carry uv = (0, 0) and
    behave exactly like background pixels (live-tile skip, clamped-garbage
    samples discarded by the final slice)."""
    th, tw = tex3.shape[0], tex3.shape[1]
    # _texel_coords inlined on the separate planes (no channel re-stack):
    s = tu * tw - 0.5
    t = tv * th - 0.5
    if boundary_mode == "wrap":
        s = jnp.mod(s, tw)
        t = jnp.mod(t, th)
        sr = tr = None
    else:
        sr, tr = s, t
        s = jnp.clip(s, 0.0, tw - 1.001)
        t = jnp.clip(t, 0.0, th - 1.001)
    uv_nonzero = (tu != 0.0) | (tv != 0.0)
    return _prep_from_st(tex3, s, t, uv_nonzero, sr, tr, h, w,
                         boundary_mode)


def _texture_planes_fwd_impl(tex, tu, tv, h, w, boundary_mode, interpret):
    tex3 = tex[..., None] if tex.ndim == 2 else tex
    (tex_planes, ls, lt, t0r, c0, live, _s_in, _t_in,
     geom) = _prep_planes(tex3, tu, tv, h, w, boundary_mode)
    th, tw, C, he, we, h, w, ph, pw, gy, gx = geom
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import tiles_per_program
    mt = tiles_per_program(gx, "tex")
    pgx, bw = gx // mt, mt * TILE_W
    bg = _background_sample(tex3, boundary_mode)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(gy, pgx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  _img_spec(bw), _img_spec(bw)],
        out_specs=[_img_spec(bw)] * C,
        scratch_shapes=[pltpu.VMEM((C, he, we), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, C, gx, mt),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ph, pw), jnp.float32)
                   for _ in range(C)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(t0r, c0, live, bg, tex_planes, ls, lt)
    return tuple(outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _texture_planes_core(tex, tu, tv, h: int, w: int, boundary_mode: str,
                         interpret: bool):
    return _texture_planes_fwd_impl(tex, tu, tv, h, w, boundary_mode,
                                    interpret)


def _texture_planes_vjp_fwd(tex, tu, tv, h, w, boundary_mode, interpret):
    out = _texture_planes_fwd_impl(tex, tu, tv, h, w, boundary_mode,
                                   interpret)
    return out, (tex, tu, tv)


def _texture_planes_vjp_bwd(h, w, boundary_mode, interpret, res, g):
    tex, tu, tv = res
    return texture_planes_bwd_impl(tex, tu, tv, h, w, boundary_mode,
                                   interpret, g)


def texture_planes_bwd_impl(tex, tu, tv, h, w, boundary_mode, interpret, g):
    """(gtex, gtu, gtv) from C padded cotangent planes ``g`` — the planes
    backward, reusable by the fused rasterize+texture custom VJP."""
    squeeze = tex.ndim == 2
    tex3 = tex[..., None] if squeeze else tex
    (tex_planes, ls, lt, t0r, c0, _live, s_in, t_in,
     geom) = _prep_planes(tex3, tu, tv, h, w, boundary_mode)
    th, tw, C, he, we, h, w, ph, pw, gy, gx = geom
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import tiles_per_program
    mt = tiles_per_program(gx, "tex")
    pgx, bw = gx // mt, mt * TILE_W

    g_planes = list(g)                       # C (ph, pw) cotangent planes
    g4 = jnp.stack(g_planes).reshape(C, gy, TILE_H, gx, TILE_W)
    live_b = jnp.any(g4 != 0.0, axis=(0, 2, 4)).reshape(-1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(gy, pgx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  _img_spec(bw), _img_spec(bw)]
        + [_img_spec(bw)] * C,
        out_specs=[_img_spec(bw), _img_spec(bw),
                   pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[pltpu.VMEM((C, he, we), jnp.float32),
                        pltpu.VMEM((C, he, we), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
    )
    gs_img, gt_img, gtex_planes = pl.pallas_call(
        functools.partial(_bwd_kernel, C, gx, gy, pgx, mt),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ph, pw), jnp.float32),
                   jax.ShapeDtypeStruct((ph, pw), jnp.float32),
                   jax.ShapeDtypeStruct((C, he, we), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(t0r, c0, live_b, tex_planes, ls, lt, *g_planes)

    gs_img, gt_img, gtex_planes = jax.lax.optimization_barrier(
        (gs_img, gt_img, gtex_planes))

    # padded-plane cotangents for the payload uv planes (tw/th chain rule
    # from uv in [0,1] to texel coords); pad pixels are zero because their
    # forward cotangents are zero (live_b skips all-pad tiles and the
    # final image slice zeroes boundary-tile pad cotangents)
    gtu = gs_img * s_in * tw
    gtv = gt_img * t_in * th

    gtex = jnp.transpose(gtex_planes, (1, 2, 0))
    if boundary_mode == "wrap":
        ah, aw = min(PATCH_H, th), min(PATCH_W, tw)
        gtex = gtex.at[:ah, :].add(gtex[th:th + ah, :])
        gtex = gtex.at[:, :aw].add(gtex[:, tw:tw + aw])
    gtex = gtex[:th, :tw]
    gtex_out = gtex[..., 0] if squeeze else gtex
    return gtex_out, gtu, gtv


_texture_planes_core.defvjp(_texture_planes_vjp_fwd, _texture_planes_vjp_bwd)


def texture_planes_pallas(tex: Array, tu: Array, tv: Array, h: int, w: int,
                          boundary_mode: str = "wrap",
                          interpret: bool = False) -> tuple:
    """Bilinear sampling from padded plane-major uv (the fused pipeline).

    :param tex: (TH, TW, C) texture, C <= 4 (or (TH, TW)).
    :param tu, tv: (ph, pw) tile-padded uv planes (fused payload 3-4).
    :param h, w: real image size (pads behave as background).
    :return: tuple of C (ph, pw) sample planes, padded layout preserved —
        differentiable w.r.t. ``tex`` and the uv planes.
    """
    th, tw = tex.shape[0], tex.shape[1]
    c = tex.shape[2] if tex.ndim == 3 else 1
    if not fits_resident(th, tw, c, boundary_mode):
        raise ValueError(
            f"texture {tex.shape} exceeds the VMEM-resident limit; "
            "use ops.texture.texture")
    return _texture_planes_core(tex, tu, tv, h, w, boundary_mode, interpret)


def texture_bilinear_pallas(tex: Array, texc: Array,
                            interpret: bool = False) -> Array:
    """Round-1 compatible entry: single-channel clamp-boundary sampling.

    :param tex: (TH, TW, 1) or (TH, TW) texture.
    :param texc: (H, W, 2) uv in [0, 1].
    :return: (H, W, 1) samples (channel dim kept for pipeline parity).
    """
    squeeze = tex.ndim == 2
    tex3 = tex[..., None] if squeeze else tex
    return texture_pallas(tex3, texc, "clamp", interpret)

"""Pallas TPU antialias kernel over the fused rasterizer's payload.

``ops.antialias.antialias_fused`` is exact and elementwise, but as XLA
code it materializes dozens of image-sized intermediates per pair pass
(~34 ms fwd+bwd per 8-sample batch at 1600x1200 — ~10x off roofline).
This kernel evaluates the identical math (nvdiffrast's silhouette pair
blend, Laine et al. 2020 §3.4 — reference fit.py:160) tile-locally:

  * All operands are packed plane-major into one (P, H, W) array
    [id, z, x0 y0 x1 y1 x2 y2, n0 n1 n2, color...] so the kernel takes
    three refs total: its own block plus the edge-clamped right/down
    neighbor blocks for the one-pixel pair halo.
  * Each pair is evaluated ONCE, at its left/top pixel; the other side's
    delta flows forward — one-pixel shift inside the tile, VMEM carries
    across tile boundaries (the TPU grid is sequential row-major). Every
    write stays tile-local: no scatter, no slice-update copies, and no
    duplicate pair math.
  * The backward is the same stencil with ``jax.vjp`` of the pair blend
    traced inside the kernel; b-side cotangent shares ride the same
    forward carries. Gradients flow to ``color`` and to the payload's
    screen-corner planes (slots 5-10), composing with the fused
    rasterize custom VJP.

Pair semantics match ops.antialias._pair_blend_planes exactly (same
op order, same guards); equality is pinned by tests/test_antialias.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import N_PAYLOAD

Array = jnp.ndarray

# Larger blocks than the raster kernels' 8x128: the stencil is pure
# elementwise VPU work, so per-program overhead (5 neighbor-block DMAs
# per plane set) dominates at small tiles. FPC_AA_TILE="HxW" overrides
# for tuning.
import os as _os

_tile = _os.environ.get("FPC_AA_TILE", "32x256").split("x")
TILE_H = int(_tile[0])
TILE_W = int(_tile[1])


def pad_resolution(height: int, width: int):
    ph = (height + TILE_H - 1) // TILE_H * TILE_H
    pw = (width + TILE_W - 1) // TILE_W * TILE_W
    return ph, pw

# packed plane indices
_ID, _Z = 0, 1
_V0 = 2            # 6 screen-corner planes
_N0 = 8            # 3 neighbor planes
_C0 = 11           # color planes start


def _edge_fn(ax, ay, bx, by, px, py):
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def _pair_delta(a, b, pax, pay, pbx, pby, C):
    """Blend deltas for aligned pixel-pair planes (math of
    ops.antialias._pair_blend_planes, operand-for-operand).

    ``a``/``b`` are lists of (TILE_H, TILE_W) blend-tile planes in packed order.
    :return: (delta_a list, delta_b list) of C color-delta planes.
    """
    id_a = a[_ID]
    id_b = b[_ID]
    differs = id_a != id_b

    inf = jnp.float32(jnp.inf)
    z_a = jnp.where(id_a >= 0.0, a[_Z], inf)
    z_b = jnp.where(id_b >= 0.0, b[_Z], inf)
    a_is_occluder = z_a <= z_b
    occ_id = jnp.where(a_is_occluder, id_a, id_b)
    other_id = jnp.where(a_is_occluder, id_b, id_a)
    valid = differs & (occ_id >= 0.0)

    tv = [jnp.where(a_is_occluder, a[_V0 + k], b[_V0 + k]) for k in range(6)]
    neigh = [jnp.where(a_is_occluder, a[_N0 + k], b[_N0 + k])
             for k in range(3)]

    shape = id_a.shape
    best_xi = jnp.zeros(shape, jnp.float32)
    best_score = jnp.full(shape, inf)
    found = jnp.zeros(shape, bool)
    for j in range(3):
        k = (j + 1) % 3
        vax, vay = tv[2 * j], tv[2 * j + 1]
        vbx, vby = tv[2 * k], tv[2 * k + 1]
        f_a = _edge_fn(vax, vay, vbx, vby, pax, pay)
        f_b = _edge_fn(vax, vay, vbx, vby, pbx, pby)
        crossing = (f_a * f_b) < 0.0
        shared = (neigh[j] >= 0.0) & (neigh[j] == other_id)
        ok = crossing & (~shared)
        denom = f_a - f_b
        xi = f_a / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
        score = jnp.abs(xi - 0.5)
        better = ok & (score < best_score)
        best_xi = jnp.where(better, xi, best_xi)
        best_score = jnp.where(better, score, best_score)
        found = found | ok

    valid = valid & found
    delta = jnp.clip(best_xi - 0.5, -0.5, 0.5)
    delta = jnp.where(valid, delta, 0.0)

    delta_a, delta_b = [], []
    for c in range(C):
        diff = a[_C0 + c] - b[_C0 + c]
        delta_b.append(jnp.where(delta > 0, delta * diff, 0.0))
        delta_a.append(jnp.where(delta < 0, -delta * (-diff), 0.0))
    return delta_a, delta_b


def _shift_left(x, right):
    """Lanes shifted by -1; the last lane filled from the right block."""
    return jnp.concatenate([x[:, 1:], right[:, :1]], axis=1)


def _shift_right_fill(x, fill_col):
    """Lanes shifted by +1; lane 0 filled with ``fill_col`` (TILE_H, 1)."""
    return jnp.concatenate([fill_col, x[:, :-1]], axis=1)


def _shift_up(x, down):
    """Sublanes shifted by -1 (pixel below); last row from the down block."""
    return jnp.concatenate([x[1:, :], down[:1, :]], axis=0)


def _shift_down_fill(x, fill_row):
    """Sublanes shifted by +1; row 0 filled with ``fill_row`` (1, TILE_W)."""
    return jnp.concatenate([fill_row, x[:-1, :]], axis=0)


def _centers(ti, tj):
    x = (tj * TILE_W
         + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
         ).astype(jnp.float32) + 0.5
    y = (ti * TILE_H
         + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
         ).astype(jnp.float32) + 0.5
    return x, y


def _pass_args(cur, nbr, direction, ti, tj, C):
    """(a, b, pax, pay, pbx, pby) for a pair pass with cur as the a-side.

    ``direction`` is "right" (partner = pixel x+1, via the right block's
    halo) or "down" (partner = pixel y+1, via the down block's halo)."""
    x, y = _centers(ti, tj)
    P = len(cur)
    if direction == "right":
        b = [_shift_left(cur[k], nbr[k]) for k in range(P)]
        return cur, b, x, y, x + 1.0, y
    b = [_shift_up(cur[k], nbr[k]) for k in range(P)]
    return cur, b, x, y, x, y + 1.0


def _pair_masks(ti, tj, height, width, sample_ph=None):
    """Pair-validity masks. ``sample_ph`` (stacked-batch mode): the image
    is B samples stacked vertically at ``sample_ph``-row pitch and
    ``height`` is the per-sample REAL height — vertical pairs are valid
    only within a sample's live rows (masking both the pad rows and the
    spurious pair across each sample boundary)."""
    x, y = _centers(ti, tj)
    if sample_ph is None:
        down = (y - 0.5) < height - 1
    else:
        row = (ti * TILE_H
               + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0))
        down = jax.lax.rem(row, sample_ph) < height - 1
    return {"right": (x - 0.5) < width - 1, "down": down}


def _fwd_kernel(C: int, gx: int, height: int, width: int, sample_ph,
                cur_ref, right_ref, down_ref, out_ref,
                hcarry, vcarry):
    """Each pair is evaluated ONCE, at its a-side (left/top) pixel; the
    b-side delta flows forward — within the tile by a one-pixel shift,
    across tiles through VMEM carries (sequential row-major grid):
    ``hcarry`` holds the last lane's horizontal db for the next tile,
    ``vcarry[j]`` the bottom row's vertical db for the tile below."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    P = _C0 + C
    cur = [cur_ref[k] for k in range(P)]
    masks = _pair_masks(ti, tj, height, width, sample_ph)

    acc = [cur[_C0 + c] for c in range(C)]

    # horizontal pairs (p, p+1)
    a, b, pax, pay, pbx, pby = _pass_args(cur, _nbr_col(right_ref, P, tj),
                                          "right", ti, tj, C)
    da, db = _pair_delta(a, b, pax, pay, pbx, pby, C)
    m = masks["right"]
    for c in range(C):
        dbm = jnp.where(m, db[c], 0.0)
        fill = jnp.where(tj > 0, hcarry[c], 0.0)
        acc[c] = (acc[c] + jnp.where(m, da[c], 0.0)
                  + _shift_right_fill(dbm, fill))
        hcarry[c] = dbm[:, -1:]

    # vertical pairs (p, p below)
    a, b, pax, pay, pbx, pby = _pass_args(cur, _nbr_row(down_ref, P, ti),
                                          "down", ti, tj, C)
    da, db = _pair_delta(a, b, pax, pay, pbx, pby, C)
    m = masks["down"]
    for c in range(C):
        dbm = jnp.where(m, db[c], 0.0)
        fill = jnp.where(ti > 0, vcarry[tj, c], 0.0)
        acc[c] = (acc[c] + jnp.where(m, da[c], 0.0)
                  + _shift_down_fill(dbm, fill))
        vcarry[tj, c] = dbm[-1:, :]

    for c in range(C):
        out_ref[c] = acc[c]


def _bwd_kernel(C: int, gx: int, height: int, width: int, sample_ph,
                cur_ref, right_ref, down_ref,
                gout_cur_ref, gout_right_ref, gout_down_ref,
                gcol_ref, gverts_ref, hcarry, vcarry):
    """Transpose of the forward stencil: the vjp of each a-side pair pass
    yields cotangents for both sides; the b-side shares flow forward
    through the same carry scheme (6 vert planes + C color planes)."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    P = _C0 + C
    D = 6 + C
    cur = [cur_ref[k] for k in range(P)]
    masks = _pair_masks(ti, tj, height, width, sample_ph)

    gcol = [gout_cur_ref[c] for c in range(C)]     # identity term
    gv = [jnp.zeros((TILE_H, TILE_W), jnp.float32) for _ in range(6)]

    for direction in ("right", "down"):
        if direction == "right":
            nbr = _nbr_col(right_ref, P, tj)
            ghalo = _nbr_col(gout_right_ref, C, tj)
        else:
            nbr = _nbr_row(down_ref, P, ti)
            ghalo = _nbr_row(gout_down_ref, C, ti)
        a, b, pax, pay, pbx, pby = _pass_args(cur, nbr, direction, ti, tj, C)
        m = masks[direction]

        # pair cotangents: gout at both sides, masked by pair validity
        g_a = [jnp.where(m, gout_cur_ref[c], 0.0) for c in range(C)]
        if direction == "right":
            g_b = [jnp.where(m, _shift_left(gout_cur_ref[c], ghalo[c]), 0.0)
                   for c in range(C)]
        else:
            g_b = [jnp.where(m, _shift_up(gout_cur_ref[c], ghalo[c]), 0.0)
                   for c in range(C)]

        def pair_fn(a_diff, b_diff):
            af = list(a)
            bf = list(b)
            for k in range(6):
                af[_V0 + k] = a_diff[k]
                bf[_V0 + k] = b_diff[k]
            for c in range(C):
                af[_C0 + c] = a_diff[6 + c]
                bf[_C0 + c] = b_diff[6 + c]
            return _pair_delta(af, bf, pax, pay, pbx, pby, C)

        a_diff = tuple(a[_V0 + k] for k in range(6)) + tuple(
            a[_C0 + c] for c in range(C))
        b_diff = tuple(b[_V0 + k] for k in range(6)) + tuple(
            b[_C0 + c] for c in range(C))
        _, vjp = jax.vjp(pair_fn, a_diff, b_diff)
        ga, gb = vjp((list(g_a), list(g_b)))

        # a-side shares land at cur pixels; b-side shares shift forward
        # with the cross-tile carry.
        hdir = direction == "right"
        for k in range(D):
            if hdir:
                fill = jnp.where(tj > 0, hcarry[k], 0.0)
                fwd = _shift_right_fill(gb[k], fill)
                hcarry[k] = gb[k][:, -1:]
            else:
                fill = jnp.where(ti > 0, vcarry[tj, k], 0.0)
                fwd = _shift_down_fill(gb[k], fill)
                vcarry[tj, k] = gb[k][-1:, :]
            share = ga[k] + fwd
            if k < 6:
                gv[k] = gv[k] + share
            else:
                gcol[k - 6] = gcol[k - 6] + share

    for c in range(C):
        gcol_ref[c] = gcol[c]
    for k in range(6):
        gverts_ref[k] = gv[k]


def _pack(color: Array, idbuf: Array, payload: Array, ph: int, pw: int):
    """(C+11, ph, pw) packed planes, padded with id = -1 (one fused
    stack — per-plane pads fold into the stack write)."""
    h, w = idbuf.shape
    C = color.shape[-1]
    pad = ((0, ph - h), (0, pw - w))

    def p0(x):
        return jnp.pad(x, pad)

    planes = [jnp.pad(idbuf.astype(jnp.float32), pad, constant_values=-1.0),
              p0(payload[2])]
    planes += [p0(payload[5 + k]) for k in range(6)]
    planes += [p0(payload[11 + k]) for k in range(3)]
    planes += [p0(color[..., c]) for c in range(C)]
    return jnp.stack(planes)


# lane/sublane pads for the halo arrays (Mosaic block shapes must have
# last-two dims divisible by (8, 128) or equal to the array dims)
_HALO_GX = 128
_HALO_GY = 8


def _use_halo() -> bool:
    """FPC_AA_HALO=1 selects thin-halo neighbor inputs (cuts the packed
    planes' HBM reads 3x) instead of full neighbor blocks.

    WARNING: interpret-mode correct, but on the real v5e remote attach the
    halo variant's compile/execute stalled and wedged the single-chip
    tunnel twice (2026-08-19); its theoretical win is ~3 ms/step. Leave
    OFF until the Mosaic behavior for the banded halo blocks is
    understood."""
    import os

    return os.environ.get("FPC_AA_HALO", "0") == "1"


def _specs(P, gy, gx):
    """cur block + right/down neighbor inputs.

    The kernel reads only the right neighbor's FIRST COLUMN and the down
    neighbor's FIRST ROW (the b-side of edge pairs, consumed via
    _shift_left/_shift_up slicing). Default: full edge-clamped neighbor
    blocks (3x packed-plane HBM reads). FPC_AA_HALO=1: precomputed thin
    halo strided slices (_halos); because Mosaic forbids size-1 trailing
    block dims, the right halo carries all (padded) tile columns for the
    row band and the down halo an 8-row band, with the kernel extracting
    its own column/row by one-hot reduction (_halo_col/_halo_row)."""
    cur = pl.BlockSpec((P, TILE_H, TILE_W), lambda i, j: (0, i, j))
    if _use_halo():
        right = pl.BlockSpec((P, TILE_H, _HALO_GX), lambda i, j: (0, i, 0))
        down = pl.BlockSpec((P, _HALO_GY, TILE_W),
                            lambda i, j: (0, i // _HALO_GY, j))
    else:
        right = pl.BlockSpec((P, TILE_H, TILE_W),
                             lambda i, j: (0, i, jnp.minimum(j + 1, gx - 1)))
        down = pl.BlockSpec((P, TILE_H, TILE_W),
                            lambda i, j: (0, jnp.minimum(i + 1, gy - 1), j))
    return [cur, right, down]


def _halos(packed):
    """(right_halo, down_halo) strided-slice arrays of the packed planes:
    right_halo[:, :, j] = first column of block column j+1 (edge blocks
    duplicate the last column — their pairs are masked in the kernel);
    down_halo[:, i, :] = first row of block row i+1. Trailing dims padded
    to Mosaic-legal tile sizes. Full-block mode: pass-through."""
    if not _use_halo():
        return packed, packed
    gx = packed.shape[2] // TILE_W
    gy = packed.shape[1] // TILE_H
    s = packed[:, :, ::TILE_W]
    rh = jnp.concatenate([s[:, :, 1:], s[:, :, -1:]], axis=2)
    rh = jnp.pad(rh, ((0, 0), (0, 0), (0, _HALO_GX - gx)))
    d = packed[:, ::TILE_H, :]
    dh = jnp.concatenate([d[:, 1:, :], d[:, -1:, :]], axis=1)
    gyp = (gy + _HALO_GY - 1) // _HALO_GY * _HALO_GY
    dh = jnp.pad(dh, ((0, 0), (0, gyp - gy), (0, 0)))
    return rh, dh


def _nbr_col(ref, P, tj):
    """Right-neighbor b-side planes: thin-halo extraction or the full
    block (its first column is sliced inside _shift_left)."""
    if _use_halo():
        return _halo_col(ref, P, tj)
    return [ref[k] for k in range(P)]


def _nbr_row(ref, P, ti):
    if _use_halo():
        return _halo_row(ref, P, ti)
    return [ref[k] for k in range(P)]


def _halo_col(ref, P, tj):
    """Extract lane ``tj`` of each (TILE_H, _HALO_GX) right-halo plane as
    (TILE_H, 1) via one-hot reduction (dynamic lane slices are illegal)."""
    oh = (jax.lax.broadcasted_iota(jnp.int32, (1, _HALO_GX), 1)
          == tj).astype(jnp.float32)
    return [jnp.sum(ref[k] * oh, axis=1, keepdims=True) for k in range(P)]


def _halo_row(ref, P, ti):
    """Extract sublane ``ti % _HALO_GY`` of each (_HALO_GY, TILE_W)
    down-halo plane as (1, TILE_W) via one-hot reduction."""
    r = jax.lax.rem(ti, _HALO_GY)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (_HALO_GY, 1), 0)
          == r).astype(jnp.float32)
    return [jnp.sum(ref[k] * oh, axis=0, keepdims=True) for k in range(P)]


def _aa_fwd_from_packed(packed, C, h, w, interpret, sample_ph=None):
    """Raw (C, ph, pw) plane-major kernel output (pads preserved).

    :param sample_ph: stacked-batch row pitch (``h`` = per-sample real
        height); None = single image."""
    ph, pw = packed.shape[1], packed.shape[2]
    gy, gx = ph // TILE_H, pw // TILE_W
    P = _C0 + C

    rh, dh = _halos(packed)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, C, gx, h, w, sample_ph),
        grid=(gy, gx),
        in_specs=_specs(P, gy, gx),
        out_specs=pl.BlockSpec((C, TILE_H, TILE_W), lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((C, ph, pw), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, TILE_H, 1), jnp.float32),
                        pltpu.VMEM((gx, C, 1, TILE_W), jnp.float32)],
        interpret=interpret,
    )(packed, rh, dh)


def _aa_fwd_impl(color, idbuf, payload, interpret):
    h, w, C = color.shape
    ph, pw = pad_resolution(h, w)
    packed = _pack(color, idbuf, payload, ph, pw)
    out = _aa_fwd_from_packed(packed, C, h, w, interpret)
    return jnp.moveaxis(out[:, :h, :w], 0, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _aa_core(color, idbuf, payload, interpret):
    return _aa_fwd_impl(color, idbuf, payload, interpret)


def _aa_vjp_fwd(color, idbuf, payload, interpret):
    h, w, C = color.shape
    ph, pw = pad_resolution(h, w)
    packed = _pack(color, idbuf, payload, ph, pw)
    out = jnp.moveaxis(
        _aa_fwd_from_packed(packed, C, h, w, interpret)[:, :h, :w], 0, -1)
    # the padded packed planes are the residual — the backward reuses
    # them instead of re-packing
    return out, (packed, h, w, C, payload.shape[0])


def _aa_vjp_bwd(interpret, res, g):
    packed, h, w, C, n_payload = res
    ph, pw = packed.shape[1], packed.shape[2]
    gy, gx = ph // TILE_H, pw // TILE_W
    P = _C0 + C
    gout = jnp.pad(jnp.moveaxis(g, -1, 0), ((0, 0), (0, ph - h),
                                            (0, pw - w)))

    gspec = pl.BlockSpec((C, TILE_H, TILE_W), lambda i, j: (0, i, j))
    D = 6 + C
    rh, dh = _halos(packed)
    grh, gdh = _halos(gout)
    gcol, gverts = pl.pallas_call(
        functools.partial(_bwd_kernel, C, gx, h, w, None),
        grid=(gy, gx),
        in_specs=_specs(P, gy, gx) + _specs(C, gy, gx),
        out_specs=[gspec,
                   pl.BlockSpec((6, TILE_H, TILE_W), lambda i, j: (0, i, j))],
        out_shape=[jax.ShapeDtypeStruct((C, ph, pw), jnp.float32),
                   jax.ShapeDtypeStruct((6, ph, pw), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((D, TILE_H, 1), jnp.float32),
                        pltpu.VMEM((gx, D, 1, TILE_W), jnp.float32)],
        interpret=interpret,
    )(packed, rh, dh, gout, grh, gdh)

    gcolor = jnp.moveaxis(gcol[:, :h, :w], 0, -1)
    gpayload = jnp.zeros((n_payload, h, w), jnp.float32)
    gpayload = gpayload.at[5:11].set(gverts[:, :h, :w])
    return gcolor, None, gpayload


_aa_core.defvjp(_aa_vjp_fwd, _aa_vjp_bwd)


# ----------------------------------------------------------------------------
# Padded plane-major entry (the production fused pipeline)
# ----------------------------------------------------------------------------

def _pack_planes(colour_planes, idbuf_p, payload_p):
    """Packed (C+11, PH, PW) stack from already raster-padded planes.

    The raster pad (8-row/128-col tiles) is re-padded to this kernel's
    32x256 tiles when needed; pad values are irrelevant — any pair whose
    pixels reach past the real (h, w) image is masked in the kernel."""
    C = len(colour_planes)
    ph, pw = idbuf_p.shape
    ph2, pw2 = pad_resolution(ph, pw)
    planes = [idbuf_p.astype(jnp.float32), payload_p[2]]
    planes += [payload_p[5 + k] for k in range(6)]
    planes += [payload_p[11 + k] for k in range(3)]
    planes += list(colour_planes)
    packed = jnp.stack(planes)
    if (ph2, pw2) != (ph, pw):
        packed = jnp.pad(packed, ((0, 0), (0, ph2 - ph), (0, pw2 - pw)),
                         constant_values=-1.0)
    return packed


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _aa_planes_core(colour_planes, idbuf, payload, h: int, w: int,
                    interpret: bool):
    C = len(colour_planes)
    packed = _pack_planes(colour_planes, idbuf, payload)
    ph, pw = idbuf.shape
    return _aa_fwd_from_packed(packed, C, h, w, interpret)[:, :ph, :pw]


def _aa_planes_vjp_fwd(colour_planes, idbuf, payload, h, w, interpret):
    C = len(colour_planes)
    packed = _pack_planes(colour_planes, idbuf, payload)
    ph, pw = idbuf.shape
    out = _aa_fwd_from_packed(packed, C, h, w, interpret)[:, :ph, :pw]
    return out, (packed, C, ph, pw, payload.shape[0])


def _aa_planes_vjp_bwd(h, w, interpret, res, g):
    packed, C, ph, pw, n_payload = res
    return aa_planes_bwd_from_packed(packed, g, h, w, C, ph, pw,
                                     n_payload, interpret)


def aa_planes_bwd_core(packed, g, h, w, C, ph, pw, interpret,
                       sample_ph=None):
    """(gcolour planes tuple, gverts (6, ph, pw)) from the packed residual
    and the (C, ph, pw) output cotangent — no gpayload materialization;
    the combined raster+texture+AA custom VJP stacks the cotangent
    planes it feeds the gradient kernel directly (one copy instead of
    the zeros+set+add chain through a (N_PAYLOAD, ph, pw) gpayload)."""
    ph2, pw2 = packed.shape[1], packed.shape[2]
    gy, gx = ph2 // TILE_H, pw2 // TILE_W
    P = _C0 + C
    gout = g
    if (ph2, pw2) != (ph, pw):
        gout = jnp.pad(g, ((0, 0), (0, ph2 - ph), (0, pw2 - pw)))

    gspec = pl.BlockSpec((C, TILE_H, TILE_W), lambda i, j: (0, i, j))
    D = 6 + C
    rh, dh = _halos(packed)
    grh, gdh = _halos(gout)
    gcol, gverts = pl.pallas_call(
        functools.partial(_bwd_kernel, C, gx, h, w, sample_ph),
        grid=(gy, gx),
        in_specs=_specs(P, gy, gx) + _specs(C, gy, gx),
        out_specs=[gspec,
                   pl.BlockSpec((6, TILE_H, TILE_W), lambda i, j: (0, i, j))],
        out_shape=[jax.ShapeDtypeStruct((C, ph2, pw2), jnp.float32),
                   jax.ShapeDtypeStruct((6, ph2, pw2), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((D, TILE_H, 1), jnp.float32),
                        pltpu.VMEM((gx, D, 1, TILE_W), jnp.float32)],
        interpret=interpret,
    )(packed, rh, dh, gout, grh, gdh)

    gcolour = tuple(gcol[c, :ph, :pw] for c in range(C))
    return gcolour, gverts[:, :ph, :pw]


def aa_planes_bwd_from_packed(packed, g, h, w, C, ph, pw, n_payload,
                              interpret):
    """(gcolour planes, None, gpayload) — the custom-VJP-shaped wrapper
    of :func:`aa_planes_bwd_core` (whose forward evaluates boundary
    pairs at the right/bottom tile; the pair function is symmetric, so
    this left/top-anchored backward reconstructs identical totals)."""
    gcolour, gverts = aa_planes_bwd_core(packed, g, h, w, C, ph, pw,
                                         interpret)
    gpayload = jnp.zeros((n_payload, ph, pw), jnp.float32)
    gpayload = gpayload.at[5:11].set(gverts)
    return gcolour, None, gpayload


_aa_planes_core.defvjp(_aa_planes_vjp_fwd, _aa_planes_vjp_bwd)


def antialias_planes_pallas(colour_planes, idbuf_p: Array,
                            payload_p: Array, h: int, w: int,
                            interpret: bool = False) -> Array:
    """Antialias over padded plane-major inputs (fused pipeline path).

    :param colour_planes: tuple of C (ph, pw) shaded planes (the Pallas
        texture kernel's padded outputs).
    :param idbuf_p / payload_p: the fused rasterizer's padded outputs.
    :param h, w: real image size (pairs beyond it are masked).
    :return: (C, ph, pw) antialiased planes, padded layout preserved;
        differentiable w.r.t. ``colour_planes`` and the payload's
        screen-corner planes.
    """
    assert payload_p.shape[0] == N_PAYLOAD
    return _aa_planes_core(tuple(colour_planes), idbuf_p, payload_p, h, w,
                           interpret)


def antialias_payload_pallas(color: Array, idbuf: Array, payload: Array,
                             interpret: bool = False) -> Array:
    """Antialias straight from the fused rasterizer's outputs.

    :param color: (H, W, C) shaded image.
    :param idbuf: (H, W) int32 winning triangle ids (-1 = background).
    :param payload: (N_PAYLOAD, H, W) fused forward payload (z at plane 2,
        screen corners at 5-10, neighbor ids at 11-13).
    :return: (H, W, C) antialiased image; differentiable w.r.t. ``color``
        and the payload's screen-corner planes.
    """
    assert payload.shape[0] == N_PAYLOAD
    return _aa_core(color, idbuf, payload, interpret)

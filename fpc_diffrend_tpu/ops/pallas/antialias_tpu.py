"""Pallas TPU antialias kernel over the fused rasterizer's payload.

``ops.antialias.antialias_fused`` is exact and elementwise, but as XLA
code it materializes dozens of image-sized intermediates per pair pass
(~34 ms fwd+bwd per 8-sample batch at 1600x1200 — ~10x off roofline).
This kernel evaluates the identical math (nvdiffrast's silhouette pair
blend, Laine et al. 2020 §3.4 — reference fit.py:160) tile-locally:

  * All operands are packed plane-major into one (P, H, W) array
    [id, z, x0 y0 x1 y1 x2 y2, n0 n1 n2, color...] so the kernel takes
    five refs total: its own (P, 8, 128) block plus the four
    edge-clamped neighbor blocks (left/right/up/down) for the
    one-pixel pair halo.
  * Each pixel accumulates its FOUR pair contributions (as the a-side of
    the right/down pairs and the b-side of the left/up pairs) so every
    write is tile-local — no scatter, no slice-update copies.
  * The backward is the same stencil with ``jax.vjp`` of the pair blend
    traced inside the kernel; each pass keeps only the cur-side
    cotangents (the partner's share is produced by the partner's own
    pass). Gradients flow to ``color`` and to the payload's screen-corner
    planes (slots 5-10), composing with the fused rasterize custom VJP.

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
# per plane set) dominates at small tiles.
TILE_H = 32
TILE_W = 256


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
    """Lanes shifted by -1; lane 127 filled from the right block's lane 0."""
    return jnp.concatenate([x[:, 1:], right[:, :1]], axis=1)


def _shift_right(x, left):
    return jnp.concatenate([left[:, -1:], x[:, :-1]], axis=1)


def _shift_up(x, down):
    """Sublanes shifted by -1 (pixel below); row 7 from the down block."""
    return jnp.concatenate([x[1:, :], down[:1, :]], axis=0)


def _shift_down(x, up):
    return jnp.concatenate([up[-1:, :], x[:-1, :]], axis=0)


def _centers(ti, tj):
    x = (tj * TILE_W
         + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
         ).astype(jnp.float32) + 0.5
    y = (ti * TILE_H
         + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
         ).astype(jnp.float32) + 0.5
    return x, y


def _pass_args(cur, nbr, direction, ti, tj, C):
    """(a, b, pax, pay, pbx, pby, cur_is_a, pair_valid_mask) for one of the
    four pair passes. ``cur``/``nbr`` are packed plane lists; masks are
    computed against the true image extent (height, width) captured in
    the closure of the kernel."""
    x, y = _centers(ti, tj)
    P = len(cur)
    if direction == "right":        # cur is a, partner = pixel x+1
        b = [_shift_left(cur[k], nbr[k]) for k in range(P)]
        return cur, b, x, y, x + 1.0, y, True
    if direction == "left":         # cur is b, partner = pixel x-1
        a = [_shift_right(cur[k], nbr[k]) for k in range(P)]
        return a, cur, x - 1.0, y, x, y, False
    if direction == "down":         # cur is a, partner = pixel y+1
        b = [_shift_up(cur[k], nbr[k]) for k in range(P)]
        return cur, b, x, y, x, y + 1.0, True
    # "up": cur is b, partner = pixel y-1
    a = [_shift_down(cur[k], nbr[k]) for k in range(P)]
    return a, cur, x, y - 1.0, x, y, False


def _pair_masks(ti, tj, height, width):
    x, y = _centers(ti, tj)
    xi = x - 0.5
    yi = y - 0.5
    return {"right": xi < width - 1, "left": xi > 0,
            "down": yi < height - 1, "up": yi > 0}


def _fwd_kernel(C: int, height: int, width: int,
                cur_ref, left_ref, right_ref, up_ref, down_ref, out_ref):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    P = _C0 + C
    cur = [cur_ref[k] for k in range(P)]
    nbrs = {"left": left_ref, "right": right_ref,
            "up": up_ref, "down": down_ref}
    masks = _pair_masks(ti, tj, height, width)

    acc = [cur[_C0 + c] for c in range(C)]
    for direction in ("right", "left", "down", "up"):
        nref = nbrs[direction]
        nbr = [nref[k] for k in range(P)]
        a, b, pax, pay, pbx, pby, cur_is_a = _pass_args(
            cur, nbr, direction, ti, tj, C)
        da, db = _pair_delta(a, b, pax, pay, pbx, pby, C)
        mine = da if cur_is_a else db
        m = masks[direction]
        for c in range(C):
            acc[c] = acc[c] + jnp.where(m, mine[c], 0.0)
    for c in range(C):
        out_ref[c] = acc[c]


def _bwd_kernel(C: int, height: int, width: int,
                cur_ref, left_ref, right_ref, up_ref, down_ref,
                gout_cur_ref, gout_left_ref, gout_right_ref,
                gout_up_ref, gout_down_ref, gcol_ref, gverts_ref):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    P = _C0 + C
    cur = [cur_ref[k] for k in range(P)]
    nbrs = {"left": left_ref, "right": right_ref,
            "up": up_ref, "down": down_ref}
    gnbrs = {"left": gout_left_ref, "right": gout_right_ref,
             "up": gout_up_ref, "down": gout_down_ref}
    masks = _pair_masks(ti, tj, height, width)

    gcol = [gout_cur_ref[c] for c in range(C)]     # identity term
    gv = [jnp.zeros((TILE_H, TILE_W), jnp.float32) for _ in range(6)]

    gshift = {"right": _shift_left, "left": _shift_right,
              "down": _shift_up, "up": _shift_down}

    for direction in ("right", "left", "down", "up"):
        nref = nbrs[direction]
        nbr = [nref[k] for k in range(P)]
        a, b, pax, pay, pbx, pby, cur_is_a = _pass_args(
            cur, nbr, direction, ti, tj, C)
        m = masks[direction]

        # pair cotangents: gout at both sides of the pair, masked
        g_cur = [jnp.where(m, gout_cur_ref[c], 0.0) for c in range(C)]
        g_nbr = [jnp.where(m, gshift[direction](gout_cur_ref[c],
                                                gnbrs[direction][c]), 0.0)
                 for c in range(C)]
        if cur_is_a:
            g_a, g_b = g_cur, g_nbr
        else:
            g_a, g_b = g_nbr, g_cur

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
        ga, gb = vjp((g_a, g_b))
        gmine = ga if cur_is_a else gb
        for k in range(6):
            gv[k] = gv[k] + gmine[k]
        for c in range(C):
            gcol[c] = gcol[c] + gmine[6 + c]

    for c in range(C):
        gcol_ref[c] = gcol[c]
    for k in range(6):
        gverts_ref[k] = gv[k]


def _pack(color: Array, idbuf: Array, payload: Array, ph: int, pw: int):
    """(C+11, ph, pw) packed planes, padded with id = -1."""
    h, w = idbuf.shape
    C = color.shape[-1]
    planes = [idbuf.astype(jnp.float32), payload[2]]
    planes += [payload[5 + k] for k in range(6)]
    planes += [payload[11 + k] for k in range(3)]
    planes += [color[..., c] for c in range(C)]
    packed = jnp.stack(planes)
    packed = jnp.pad(packed, ((0, 0), (0, ph - h), (0, pw - w)))
    if ph > h or pw > w:
        idp = jnp.pad(idbuf.astype(jnp.float32), ((0, ph - h), (0, pw - w)),
                      constant_values=-1.0)
        packed = packed.at[_ID].set(idp)
    return packed


def _specs(P, gy, gx):
    def blk(fi, fj):
        return pl.BlockSpec((P, TILE_H, TILE_W),
                            lambda i, j: (0, fi(i, j), fj(i, j)))

    cur = blk(lambda i, j: i, lambda i, j: j)
    left = blk(lambda i, j: i, lambda i, j: jnp.maximum(j - 1, 0))
    right = blk(lambda i, j: i, lambda i, j: jnp.minimum(j + 1, gx - 1))
    up = blk(lambda i, j: jnp.maximum(i - 1, 0), lambda i, j: j)
    down = blk(lambda i, j: jnp.minimum(i + 1, gy - 1), lambda i, j: j)
    return [cur, left, right, up, down]


def _aa_fwd_impl(color, idbuf, payload, interpret):
    h, w, C = color.shape
    ph, pw = pad_resolution(h, w)
    gy, gx = ph // TILE_H, pw // TILE_W
    P = _C0 + C
    packed = _pack(color, idbuf, payload, ph, pw)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, C, h, w),
        grid=(gy, gx),
        in_specs=_specs(P, gy, gx) * 1,
        out_specs=pl.BlockSpec((C, TILE_H, TILE_W), lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((C, ph, pw), jnp.float32),
        interpret=interpret,
    )(packed, packed, packed, packed, packed)
    return jnp.moveaxis(out[:, :h, :w], 0, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _aa_core(color, idbuf, payload, interpret):
    return _aa_fwd_impl(color, idbuf, payload, interpret)


def _aa_vjp_fwd(color, idbuf, payload, interpret):
    return _aa_fwd_impl(color, idbuf, payload, interpret), (
        color, idbuf, payload)


def _aa_vjp_bwd(interpret, res, g):
    color, idbuf, payload = res
    h, w, C = color.shape
    ph, pw = pad_resolution(h, w)
    gy, gx = ph // TILE_H, pw // TILE_W
    P = _C0 + C
    packed = _pack(color, idbuf, payload, ph, pw)
    gout = jnp.pad(jnp.moveaxis(g, -1, 0), ((0, 0), (0, ph - h),
                                            (0, pw - w)))

    gspec = pl.BlockSpec((C, TILE_H, TILE_W), lambda i, j: (0, i, j))
    gcol, gverts = pl.pallas_call(
        functools.partial(_bwd_kernel, C, h, w),
        grid=(gy, gx),
        in_specs=_specs(P, gy, gx) + _specs(C, gy, gx),
        out_specs=[gspec,
                   pl.BlockSpec((6, TILE_H, TILE_W), lambda i, j: (0, i, j))],
        out_shape=[jax.ShapeDtypeStruct((C, ph, pw), jnp.float32),
                   jax.ShapeDtypeStruct((6, ph, pw), jnp.float32)],
        interpret=interpret,
    )(packed, packed, packed, packed, packed,
      gout, gout, gout, gout, gout)

    gcolor = jnp.moveaxis(gcol[:, :h, :w], 0, -1)
    gpayload = jnp.zeros_like(payload)
    gpayload = gpayload.at[5:11].set(gverts[:, :h, :w])
    return gcolor, None, gpayload


_aa_core.defvjp(_aa_vjp_fwd, _aa_vjp_bwd)


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

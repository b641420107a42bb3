"""Pallas TPU texture sampling: bilinear filtering as tile-local matmuls.

TPUs have no gather hardware — XLA lowers per-pixel texture fetches to
serialized gathers (~90M texels/s, the slowest stage of the whole render
at full resolution). This kernel exploits UV coherence instead: for each
8x128-pixel image tile, the footprint of its texture coordinates is a
small texture patch (the face-capture workload maps image pixels ~1:1 to
texels). The kernel DMAs that patch into VMEM and evaluates bilinear
filtering densely:

    sample_p = wy_p^T  P  wx_p          (hat-function weights)
             = rowdot(Wy @ P, Wx)       Wy (1024, PH), P (PH, PW),
                                        Wx (1024, PW)

one small MXU matmul + a lane reduction per tile — no gathers. The
backward is the transpose: grad_P = Wy^T (G ⊙ Wx) accumulated patch-wise
into the texture gradient over the sequential grid (no texel scatters),
plus in-kernel derivative weights for the UV-coordinate gradients.

Semantics: clamp-to-edge boundary (the Pallas path's documented deviation
from the XLA path's default wrap — identical for UVs inside [0,1) away
from the border, which is the entire face-capture regime). Footprints
larger than the patch (PH x PW texels) clamp; use the XLA path (or
mipmaps) for heavy minification.
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
PATCH_H = 64           # texture patch rows per tile
PATCH_W = 256          # texture patch cols (two lane tiles; 128-aligned)


def _patch_origins(s_img: Array, t_img: Array, tex_h: int, tex_w: int,
                   gy: int, gx: int):
    """Per-tile patch origins (t0 row, c0 col) from texel-space coords."""
    s4 = s_img.reshape(gy, TILE_H, gx, TILE_W)
    t4 = t_img.reshape(gy, TILE_H, gx, TILE_W)
    min_s = jnp.min(s4, axis=(1, 3))
    min_t = jnp.min(t4, axis=(1, 3))
    # row origin 8-aligned (sublane tiling), col origin 128-aligned (lanes)
    t0_raw = jnp.floor(min_t).astype(jnp.int32) - 1
    t0 = jnp.clip((t0_raw // 8) * 8, 0, max(tex_h - PATCH_H, 0))
    c0_raw = jnp.floor(min_s).astype(jnp.int32) - 1
    c0 = jnp.clip((c0_raw // 128) * 128, 0, max(tex_w - PATCH_W, 0))
    return t0.reshape(-1), c0.reshape(-1)


def _weights(local, n):
    """(NPIX, n) hat-function weights: relu(1 - |local - i|)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (NPIX, n), 1).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(local - i))


def _dweights(local, n):
    """d/dlocal of the hat weights: -sign(local - i) where |.| < 1."""
    i = jax.lax.broadcasted_iota(jnp.int32, (NPIX, n), 1).astype(jnp.float32)
    d = local - i
    return jnp.where(jnp.abs(d) < 1.0, -jnp.sign(d), 0.0)


def _local_coords(s_ref, t_ref, t0, c0, tex_h: int, tex_w: int):
    """Patch-local clamped coords + interior masks for grad gating.

    s_ref/t_ref blocks arrive in tile-major (NPIX, 1) layout (pixels in
    sublanes) — Mosaic cannot relayout (8, 128) -> (1024, 1) in-kernel.
    """
    s_g = s_ref[:]
    t_g = t_ref[:]
    s_cl = jnp.clip(s_g, 0.0, tex_w - 1.001)
    t_cl = jnp.clip(t_g, 0.0, tex_h - 1.001)
    ls = jnp.clip(s_cl - c0.astype(jnp.float32), 0.0, PATCH_W - 1.001)
    lt = jnp.clip(t_cl - t0.astype(jnp.float32), 0.0, PATCH_H - 1.001)
    s_in = ((s_g > 0.0) & (s_g < tex_w - 1.001)
            & (s_cl - c0.astype(jnp.float32) > 0.0)
            & (s_cl - c0.astype(jnp.float32) < PATCH_W - 1.001)
            ).astype(jnp.float32)
    t_in = ((t_g > 0.0) & (t_g < tex_h - 1.001)
            & (t_cl - t0.astype(jnp.float32) > 0.0)
            & (t_cl - t0.astype(jnp.float32) < PATCH_H - 1.001)
            ).astype(jnp.float32)
    return ls, lt, s_in, t_in


def _fwd_kernel(gx: int, tex_h: int, tex_w: int, t0_ref, c0_ref, tex_hbm,
                s_ref, t_ref, out_ref, patch_vmem, sem):
    tile = pl.program_id(0) * gx + pl.program_id(1)
    t0 = pl.multiple_of(t0_ref[tile], 8)
    c0 = pl.multiple_of(c0_ref[tile], 128)
    dma = pltpu.make_async_copy(
        tex_hbm.at[pl.ds(t0, PATCH_H), pl.ds(c0, PATCH_W)], patch_vmem, sem)
    dma.start()
    dma.wait()

    ls, lt, _, _ = _local_coords(s_ref, t_ref, t0, c0, tex_h, tex_w)
    wy = _weights(lt, PATCH_H)                     # (NPIX, PH)
    wx = _weights(ls, PATCH_W)                     # (NPIX, PW)
    a = jnp.dot(wy, patch_vmem[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    sample = jnp.sum(a * wx, axis=1, keepdims=True)  # (NPIX, 1)
    out_ref[:] = sample


def _bwd_kernel(gx: int, tex_h: int, tex_w: int, t0_ref, c0_ref, tex_hbm,
                s_ref, t_ref, g_ref, gtex_init_hbm, gs_ref, gt_ref, gtex_hbm,
                patch_vmem, gpatch_vmem, sem, out_sem):
    tile = pl.program_id(0) * gx + pl.program_id(1)
    t0 = pl.multiple_of(t0_ref[tile], 8)
    c0 = pl.multiple_of(c0_ref[tile], 128)
    dma = pltpu.make_async_copy(
        tex_hbm.at[pl.ds(t0, PATCH_H), pl.ds(c0, PATCH_W)], patch_vmem, sem)
    dma.start()
    dma.wait()

    lsc, ltc, s_in, t_in = _local_coords(s_ref, t_ref, t0, c0, tex_h, tex_w)
    wy = _weights(ltc, PATCH_H)
    wx = _weights(lsc, PATCH_W)
    g = g_ref[:]                                        # (NPIX, 1)

    # texture gradient: grad_P = Wy^T @ (g * Wx)
    gwx = g * wx                                        # (NPIX, PW)
    gpatch = jnp.dot(wy.T, gwx, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    rd = pltpu.make_async_copy(
        gtex_hbm.at[pl.ds(t0, PATCH_H), pl.ds(c0, PATCH_W)], gpatch_vmem,
        out_sem)
    rd.start()
    rd.wait()
    gpatch_vmem[:] = gpatch_vmem[:] + gpatch
    wr = pltpu.make_async_copy(
        gpatch_vmem, gtex_hbm.at[pl.ds(t0, PATCH_H), pl.ds(c0, PATCH_W)],
        out_sem)
    wr.start()
    wr.wait()

    # coordinate gradients
    a = jnp.dot(wy, patch_vmem[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    dwx = _dweights(lsc, PATCH_W)
    gs = jnp.sum(a * dwx, axis=1, keepdims=True) * g * s_in
    dwy = _dweights(ltc, PATCH_H)
    b = jnp.dot(dwy, patch_vmem[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    gt = jnp.sum(b * wx, axis=1, keepdims=True) * g * t_in
    gs_ref[:] = gs
    gt_ref[:] = gt


def _pad_hw(h, w):
    ph = (h + TILE_H - 1) // TILE_H * TILE_H
    pw = (w + TILE_W - 1) // TILE_W * TILE_W
    return ph, pw


def _to_tile_major(img, gy, gx):
    """(ph, pw) -> (gy*gx*NPIX, 1): per-tile pixel columns for the kernel."""
    return (img.reshape(gy, TILE_H, gx, TILE_W).transpose(0, 2, 1, 3)
            .reshape(gy * gx * NPIX, 1))


def _from_tile_major(tm, gy, gx):
    """Inverse of _to_tile_major."""
    return (tm.reshape(gy, gx, TILE_H, TILE_W).transpose(0, 2, 1, 3)
            .reshape(gy * TILE_H, gx * TILE_W))


def _prep(tex, texc):
    """Texel-space coords, patch origins, and a patch-sized-padded texture."""
    tex_h, tex_w = tex.shape[0], tex.shape[1]
    pad_th = max(tex_h, PATCH_H)
    pad_tw = max(tex_w, PATCH_W)
    tex_p = jnp.pad(tex, ((0, pad_th - tex_h), (0, pad_tw - tex_w)))
    h, w = texc.shape[0], texc.shape[1]
    ph, pw = _pad_hw(h, w)
    s = texc[..., 0] * tex_w - 0.5
    t = texc[..., 1] * tex_h - 0.5
    # edge-pad so padded pixels don't distort the per-tile patch origin
    s = jnp.pad(s, ((0, ph - h), (0, pw - w)), mode="edge")
    t = jnp.pad(t, ((0, ph - h), (0, pw - w)), mode="edge")
    gy, gx = ph // TILE_H, pw // TILE_W
    t0, c0 = _patch_origins(s, t, pad_th, pad_tw, gy, gx)
    s_tm = _to_tile_major(s, gy, gx)
    t_tm = _to_tile_major(t, gy, gx)
    return tex_p, s_tm, t_tm, t0, c0, (ph, pw, gy, gx)


def _img_spec(gx):
    return pl.BlockSpec((NPIX, 1), lambda i, j, *_: (i * gx + j, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def texture_bilinear_pallas(tex: Array, texc: Array,
                            interpret: bool = False) -> Array:
    """Bilinear texture sampling via the tile-patch matmul kernel.

    :param tex: (TH, TW, 1) or (TH, TW) single-channel texture.
    :param texc: (H, W, 2) uv in [0, 1]; clamp-to-edge boundary.
    :return: (H, W, 1) samples (channel dim kept for pipeline parity).
    """
    out = _texture_fwd_impl(tex, texc, interpret)
    return out


def _texture_fwd_impl(tex, texc, interpret):
    squeeze = tex.ndim == 3
    tex2 = tex[..., 0] if squeeze else tex
    tex_h, tex_w = tex2.shape
    h, w = texc.shape[0], texc.shape[1]
    tex_p, s, t, t0, c0, (ph, pw, gy, gx) = _prep(tex2, texc)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gy, gx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  _img_spec(gx), _img_spec(gx)],
        out_specs=[_img_spec(gx)],
        scratch_shapes=[pltpu.VMEM((PATCH_H, PATCH_W), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    (out_tm,) = pl.pallas_call(
        functools.partial(_fwd_kernel, gx, tex_h, tex_w),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((gy * gx * NPIX, 1), jnp.float32)],
        interpret=interpret,
    )(t0, c0, tex_p, s, t)
    out = _from_tile_major(out_tm, gy, gx)
    return out[:h, :w, None]


def _texture_vjp_fwd(tex, texc, interpret):
    return _texture_fwd_impl(tex, texc, interpret), (tex, texc)


def _texture_vjp_bwd(interpret, res, g):
    tex, texc = res
    squeeze = tex.ndim == 3
    tex2 = tex[..., 0] if squeeze else tex
    tex_h, tex_w = tex2.shape
    h, w = texc.shape[0], texc.shape[1]
    tex_p, s, t, t0, c0, (ph, pw, gy, gx) = _prep(tex2, texc)
    pad_th, pad_tw = tex_p.shape
    gimg = _to_tile_major(
        jnp.pad(g[..., 0], ((0, ph - h), (0, pw - w))), gy, gx)
    gtex_init = jnp.zeros((pad_th, pad_tw), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gy, gx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  _img_spec(gx), _img_spec(gx), _img_spec(gx),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[_img_spec(gx), _img_spec(gx),
                   pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[pltpu.VMEM((PATCH_H, PATCH_W), jnp.float32),
                        pltpu.VMEM((PATCH_H, PATCH_W), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
    )
    gs_tm, gt_tm, gtex = pl.pallas_call(
        functools.partial(_bwd_kernel, gx, tex_h, tex_w),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((gy * gx * NPIX, 1), jnp.float32),
                   jax.ShapeDtypeStruct((gy * gx * NPIX, 1), jnp.float32),
                   jax.ShapeDtypeStruct((pad_th, pad_tw), jnp.float32)],
        input_output_aliases={6: 2},   # gtex_init -> gtex (prefetch incl.)
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(t0, c0, tex_p, s, t, gimg, gtex_init)

    gs = _from_tile_major(gs_tm, gy, gx)[:h, :w]
    gt = _from_tile_major(gt_tm, gy, gx)[:h, :w]
    gtexc = jnp.stack([gs * tex_w, gt * tex_h], axis=-1)
    gtex = gtex[:tex_h, :tex_w]
    gtex_out = gtex[..., None] if squeeze else gtex
    return gtex_out, gtexc


texture_bilinear_pallas.defvjp(_texture_vjp_fwd, _texture_vjp_bwd)

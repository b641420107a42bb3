"""Spatial (tile-axis) parallel rendering: image row-bands across devices.

Each device renders a horizontal band of the image by windowing the
projection matrix (a per-band y scale/offset in clip space — pixel centers
align exactly with the corresponding rows of the full-resolution render).
The antialias op needs one row of (color, rast) from each vertical
neighbor band; `exchange_rows` moves those over ICI with ppermute, and the
seam pair-blend reuses the same math as the intra-band pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fpc_diffrend_tpu.models.camera import transform_clip
from fpc_diffrend_tpu.ops import antialias as aa
from fpc_diffrend_tpu.ops.interpolate import interpolate
from fpc_diffrend_tpu.ops.pipeline import BACKGROUND
from fpc_diffrend_tpu.ops.rasterize import rasterize, screen_vertices
from fpc_diffrend_tpu.ops.texture import texture

Array = jnp.ndarray


def band_window_matrix(band: Array, n_bands: int) -> Array:
    """4x4 matrix mapping clip space so band ``band`` fills the viewport.

    Band b covers ndc y in [-1 + 2b/n, -1 + 2(b+1)/n] (bottom-up, GL row
    order). y' = n*y - (n*center)*w.
    """
    n = jnp.float32(n_bands)
    center = (2.0 * band.astype(jnp.float32) + 1.0) / n - 1.0
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[1, 1].set(n)
    m = m.at[1, 3].set(-n * center)
    return m


def render_band(mvp: Array, pos: Array, pos_idx: Array, uv: Array,
                uv_idx: Array, tex: Array, band_resolution, face_neighbors,
                band: Array, n_bands: int, enable_mip=False, max_mip_level=0,
                impl="auto", axis_name=None, aa_max_pairs=None,
                pair_cap=None):
    """Render one band; if ``axis_name`` is set, do the AA seam exchange.

    On the pallas implementation with a VMEM-resident texture this runs
    the PRODUCTION fused pipeline per band (the round-4 VERDICT #4 gap:
    the band path previously composed the separate rasterize /
    interpolate / texture ops, so the sharded step did not inherit the
    single-chip fused-kernel performance): fused rasterize+texture
    kernel, then the payload-plane antialias kernel, with the seam
    deltas computed from the fused pass's pre-AA colour planes.

    :param band_resolution: (H_band, W) of this band.
    :return: (H_band, W, C) image (band of the full framebuffer).
    """
    import os

    band_mvp = band_window_matrix(band, n_bands) @ mvp
    pos_clip = transform_clip(mvp, pos)          # full-frame clip (for AA)
    band_clip = transform_clip(band_mvp, pos)

    resolved_impl = impl
    if resolved_impl == "auto":
        resolved_impl = "pallas" if jax.default_backend() == "tpu" else "scan"

    from fpc_diffrend_tpu.ops.pallas.texture_tpu import (
        fits_resident, texture_pallas)

    hb, w = band_resolution[0], band_resolution[1]
    if (not enable_mip and resolved_impl == "pallas"
            and fits_resident(tex.shape[0], tex.shape[1], tex.shape[-1],
                              "wrap")
            and os.environ.get("FPC_FUSE_TEX", "1") != "0"):
        # production fused path (padded plane-major end to end)
        from fpc_diffrend_tpu.ops.pallas.antialias_tpu import (
            antialias_planes_pallas)
        from fpc_diffrend_tpu.ops.rasterize import (
            _rasterize_pallas_textured)

        interpret = os.environ.get("FPC_INTERPRET", "0") == "1"
        idbuf_p, payload_p, colour_planes = _rasterize_pallas_textured(
            band_clip, pos_idx.astype(jnp.int32), uv,
            uv_idx.astype(jnp.int32), tex, face_neighbors,
            (hb, w), pair_cap=pair_cap, interpret=interpret)
        if axis_name is not None and n_bands > 1:
            # seam pair blend consumes the PRE-antialias colour and the
            # nvdiffrast-layout rast rows, both from the fused payload
            colour_pre = jnp.moveaxis(
                jnp.stack(colour_planes)[:, :hb, :w], 0, -1)
            idb = idbuf_p[:hb, :w]
            idf = jnp.where(idb >= 0, (idb + 1).astype(jnp.float32), 0.0)
            rast = jnp.stack([payload_p[0, :hb, :w], payload_p[1, :hb, :w],
                              payload_p[2, :hb, :w], idf], axis=-1)
            seam_delta = _seam_antialias_delta(
                colour_pre, rast, band_clip, pos_idx, face_neighbors,
                band_resolution, axis_name, n_bands)
        else:
            seam_delta = None
        aa_p = antialias_planes_pallas(colour_planes, idbuf_p, payload_p,
                                       hb, w, interpret=interpret)
        colour = jnp.moveaxis(aa_p[:, :hb, :w], 0, -1)
        if seam_delta is not None:
            colour = colour + seam_delta
        return jnp.where(idbuf_p[:hb, :w, None] >= 0, colour, BACKGROUND)

    if enable_mip:
        rast, rast_db = rasterize(band_clip, pos_idx, tuple(band_resolution),
                                  impl=impl, with_db=True)
        texc, texd = interpolate(uv, rast, uv_idx, rast_db=rast_db,
                                 diff_attrs="all")
        colour = texture(tex, texc, uv_da=texd,
                         filter_mode="linear-mipmap-linear",
                         max_mip_level=max_mip_level)
    else:
        rast = rasterize(band_clip, pos_idx, tuple(band_resolution),
                         impl=impl, with_db=False)
        texc, _ = interpolate(uv, rast, uv_idx)
        if (resolved_impl == "pallas"
                and fits_resident(tex.shape[0], tex.shape[1],
                                  tex.shape[-1], "wrap")):
            colour = texture_pallas(tex, texc, "wrap", False)
        else:
            colour = texture(tex, texc, filter_mode="linear")

    # Intra-band antialias. Band-local screen geometry: the band clip
    # transform keeps pixel scale identical, so band_clip screen verts are
    # correct for pair geometry within the band. Seam deltas must be
    # computed from the PRE-antialias color (the full-frame op derives all
    # pair deltas from the original buffer), so exchange happens first.
    if axis_name is not None and n_bands > 1:
        seam_delta = _seam_antialias_delta(colour, rast, band_clip, pos_idx,
                                           face_neighbors, band_resolution,
                                           axis_name, n_bands)
    else:
        seam_delta = None
    colour = aa.antialias(colour, rast, band_clip, pos_idx, face_neighbors,
                          max_pairs=aa_max_pairs)
    if seam_delta is not None:
        colour = colour + seam_delta

    colour = jnp.where(rast[..., 3:] > 0, colour, BACKGROUND)
    return colour


def _seam_antialias_delta(colour, rast, band_clip, faces, face_neighbors,
                          band_resolution, axis_name, n_bands):
    """Color deltas from vertical pairs that straddle band boundaries.

    My top row (last row, GL bottom-up order) pairs with the next band's
    bottom row; my bottom row pairs with the previous band's top row.
    Screen y for the neighbor rows is expressed in *this band's* pixel
    coordinates (one row above/below the band), which the band clip
    transform supports since the pair math only needs relative geometry.
    ``colour`` must be the pre-antialias buffer.
    """
    h, w = band_resolution[0], band_resolution[1]
    sv = screen_vertices(band_clip, w, h)
    tri_screen = sv[faces][:, :, :2]

    # ppermute perm entries are (source, destination): band b receives the
    # band-above's (b+1) row 0 via [(i, i-1)], and the band-below's (b-1)
    # last row via [(i, i+1)].
    from_above = [(i, (i - 1) % n_bands) for i in range(n_bands)]
    from_below = [(i, (i + 1) % n_bands) for i in range(n_bands)]

    # Receive the neighbor-above's row 0 (their bottom) to blend my last row.
    row_top_c = jax.lax.ppermute(colour[0], axis_name, from_above)
    row_top_r = jax.lax.ppermute(rast[0], axis_name, from_above)
    # Receive the neighbor-below's last row to blend my row 0.
    row_bot_c = jax.lax.ppermute(colour[-1], axis_name, from_below)
    row_bot_r = jax.lax.ppermute(rast[-1], axis_name, from_below)

    xs = jnp.arange(w, dtype=jnp.float32) + 0.5

    # pair (my last row, neighbor row at y = h + 0.5)
    centers_a = jnp.stack([xs, jnp.full((w,), h - 0.5)], axis=-1)
    centers_b = jnp.stack([xs, jnp.full((w,), h + 0.5)], axis=-1)
    da, _ = aa._pair_blend(colour[-1], row_top_c, rast[-1], row_top_r,
                           centers_a, centers_b, tri_screen, face_neighbors)

    # pair (neighbor row at y = -0.5, my row 0)
    centers_a0 = jnp.stack([xs, jnp.full((w,), -0.5)], axis=-1)
    centers_b0 = jnp.stack([xs, jnp.full((w,), 0.5)], axis=-1)
    _, db = aa._pair_blend(row_bot_c, colour[0], row_bot_r, rast[0],
                           centers_a0, centers_b0, tri_screen, face_neighbors)

    # Band 0 / band n-1 wrap-around pairs are spurious (toroidal ppermute).
    band = jax.lax.axis_index(axis_name)
    da = jnp.where(band == n_bands - 1, 0.0, da)
    db = jnp.where(band == 0, 0.0, db)

    delta = jnp.zeros_like(colour)
    delta = delta.at[-1].add(da)
    delta = delta.at[0].add(db)
    return delta

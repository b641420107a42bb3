"""The composed differentiable render pipeline (reference ``render()``).

Reproduces the exact op order of reference fit.py:134-162:
  clip transform -> rasterize -> interpolate (± mip derivatives)
  -> texture (bilinear | trilinear mipmap) -> antialias
  -> background composite (constant 45/255).

Note the reference composites the background *after* antialias, which
discards AA blending into background pixels; we replicate that faithfully
(fit.py:160-161).

Single-view, single-image functions; batching over (camera, frame) samples
is done with ``jax.vmap`` in the fit loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from fpc_diffrend_tpu.models.camera import transform_clip
from fpc_diffrend_tpu.ops.antialias import antialias
from fpc_diffrend_tpu.ops.interpolate import interpolate
from fpc_diffrend_tpu.ops.rasterize import rasterize
from fpc_diffrend_tpu.ops.texture import texture

Array = jnp.ndarray

BACKGROUND = 45.0 / 255.0  # reference fit.py:161


@functools.partial(
    jax.jit,
    static_argnames=("resolution", "enable_mip", "max_mip_level", "impl",
                     "aa_max_pairs", "pair_cap"))
def render(mvp: Array, pos: Array, pos_idx: Array, uv: Array, uv_idx: Array,
           tex: Array, resolution: Tuple[int, int], face_neighbors: Array,
           enable_mip: bool = False, max_mip_level: int = 0,
           impl: str = "auto", background: float = BACKGROUND,
           aa_max_pairs: int | None = None,
           pair_cap: int | None = None) -> Array:
    """Render one view; differentiable w.r.t. pos, tex (and mvp).

    :param mvp: (4, 4) modelview-projection matrix.
    :param pos: (V, 3) object-space vertex positions.
    :param pos_idx: (T, 3) int32 triangles.
    :param uv: (U, 2) texture coordinates.
    :param uv_idx: (T, 3) int32 per-face uv indices.
    :param tex: (TH, TW, C) texture.
    :param resolution: (height, width).
    :param face_neighbors: (T, 3) int32 adjacency for antialiasing.
    :param enable_mip / max_mip_level: trilinear mipmap sampling
        (reference fit.py:153-158).
    :param impl: rasterizer visibility implementation ("auto"/"pallas"/"scan").
    :param aa_max_pairs: antialias compaction cap (ops/antialias.py); None
        = exact full-grid pass.
    :return: (H, W, C) image in [0, 1], row 0 = bottom (GL convention).
    """
    pos_clip = transform_clip(mvp, pos)
    return render_from_clip(pos_clip, pos_idx, uv, uv_idx, tex, resolution,
                            face_neighbors, enable_mip=enable_mip,
                            max_mip_level=max_mip_level, impl=impl,
                            background=background, aa_max_pairs=aa_max_pairs,
                            pair_cap=pair_cap)


def render_from_clip(pos_clip: Array, pos_idx: Array, uv: Array,
                     uv_idx: Array, tex: Array, resolution: Tuple[int, int],
                     face_neighbors: Array, enable_mip: bool = False,
                     max_mip_level: int = 0, impl: str = "auto",
                     background: float = BACKGROUND,
                     aa_max_pairs: int | None = None,
                     pair_cap: int | None = None,
                     inc=(None, None)) -> Array:
    """:func:`render` taking precomputed clip-space positions — the shared
    tail for callers that build ``pos_clip`` themselves (the fit loop's
    profiler times the prologue and this tail on the identical graph)."""
    resolved_impl = impl
    if resolved_impl == "auto":
        resolved_impl = "pallas" if jax.default_backend() == "tpu" else "scan"

    from fpc_diffrend_tpu.ops.pallas.texture_tpu import fits_resident

    verts_img = neigh_img = None
    if enable_mip:
        # db (bary screen derivatives) is only consumed by mip filtering
        if resolved_impl == "pallas":
            from fpc_diffrend_tpu.ops.pallas.texture_mip_tpu import (
                lod_from_texc, mip_fits_resident, mip_texture_pallas)
            from fpc_diffrend_tpu.ops.rasterize import (
                _pixel_db_from_data, _rasterize_pallas_full)

            rast, texc, verts_img, neigh_img, data, idbuf, payload = \
                _rasterize_pallas_full(pos_clip, pos_idx, uv, uv_idx,
                                       face_neighbors, resolution, False,
                                       pair_cap)
            tex3 = tex[..., None] if tex.ndim == 2 else tex
            if mip_fits_resident(tex3.shape[0], tex3.shape[1],
                                 tex3.shape[2], max_mip_level):
                # Resident-pyramid Pallas trilinear sampler; LOD from
                # masked finite differences of the interpolated uv image
                # (matches the analytic derivative in triangle interiors;
                # LOD selection only, held out of the gradient path like
                # the XLA mip branch below).
                lam = lod_from_texc(jax.lax.stop_gradient(texc), idbuf,
                                    tex3.shape[0], tex3.shape[1])
                colour = mip_texture_pallas(tex3, texc, lam,
                                            max_mip_level)
                texd = None
            else:
                # LOD selection only: held out of the gradient path (the
                # gather chain's backward would be an image-sized
                # scatter; documented deviation — nvdiffrast's optional
                # mip-level gradients are negligible for this workload)
                texd = jax.lax.stop_gradient(_bary_db_to_uv_da(
                    _pixel_db_from_data(data, idbuf, *resolution),
                    uv, uv_idx, rast))
        else:
            rast, rast_db = rasterize(pos_clip, pos_idx, resolution,
                                      impl=impl, with_db=True)
            texc, texd = interpolate(uv, rast, uv_idx, rast_db=rast_db,
                                     diff_attrs="all")
        if texd is not None:
            colour = texture(tex, texc, uv_da=texd,
                             filter_mode="linear-mipmap-linear",
                             max_mip_level=max_mip_level)
    elif resolved_impl == "pallas":
        from fpc_diffrend_tpu.ops.rasterize import _rasterize_pallas_full

        if fits_resident(tex.shape[0], tex.shape[1], tex.shape[-1], "wrap"):
            # Production path: padded plane-major end to end. The fused
            # rasterizer emits tile-padded planes; texture (VMEM-resident
            # matmul sampler, wrap boundary matching nvdiffrast's default,
            # reference fit.py:155), antialias and the background
            # composite all stay in that layout, and the image is sliced
            # to (H, W) exactly once at the end — no per-stage pad/slice
            # HBM roundtrips in either direction of the autodiff graph.
            import os

            from fpc_diffrend_tpu.ops.pallas.antialias_tpu import (
                antialias_planes_pallas)
            from fpc_diffrend_tpu.ops.rasterize import (
                _rasterize_pallas_padded, _rasterize_pallas_textured)

            height, width = resolution
            if (os.environ.get("FPC_AA_FUSE", "0") == "1"
                    and os.environ.get("FPC_FUSE_TEX", "1") != "0"):
                # rasterize + texture + ANTIALIAS in one kernel pass; the
                # separate AA kernel (packed-plane build + 3x neighbor
                # reads) disappears from the forward
                from fpc_diffrend_tpu.ops.rasterize import (
                    _rasterize_pallas_textured_aa)

                idbuf_p, aa_p = _rasterize_pallas_textured_aa(
                    pos_clip, pos_idx, uv, uv_idx, tex, face_neighbors,
                    resolution, pair_cap, inc=inc)
                img_p = jnp.where(idbuf_p >= 0, jnp.stack(aa_p), background)
                return jnp.moveaxis(img_p[:, :height, :width], 0, -1)
            if (os.environ.get("FPC_AA_COMBINED", "1") != "0"
                    and os.environ.get("FPC_FUSE_TEX", "1") != "0"):
                # rasterize+texture kernel + separate AA kernel under ONE
                # custom VJP: the payload/colour planes stay internal, so
                # the backward's gpayload zeros+set+add glue vanishes
                from fpc_diffrend_tpu.ops.rasterize import (
                    _rasterize_pallas_textured_sepaa)

                idbuf_p, aa_p = _rasterize_pallas_textured_sepaa(
                    pos_clip, pos_idx, uv, uv_idx, tex, face_neighbors,
                    resolution, pair_cap, inc=inc)
                img_p = jnp.where(idbuf_p >= 0, aa_p, background)
                return jnp.moveaxis(img_p[:, :height, :width], 0, -1)
            if os.environ.get("FPC_FUSE_TEX", "1") != "0":
                # texture sampling fused into the raster kernel's dense
                # phase-B pass (one kernel, no texc roundtrip)
                idbuf_p, payload_p, colour_planes = \
                    _rasterize_pallas_textured(
                        pos_clip, pos_idx, uv, uv_idx, tex, face_neighbors,
                        resolution, pair_cap, inc=inc)
            else:
                from fpc_diffrend_tpu.ops.pallas.texture_tpu import (
                    texture_planes_pallas)

                idbuf_p, payload_p = _rasterize_pallas_padded(
                    pos_clip, pos_idx, uv, uv_idx, face_neighbors,
                    resolution, pair_cap, inc=inc)
                colour_planes = texture_planes_pallas(
                    tex, payload_p[3], payload_p[4], height, width, "wrap")
            aa_p = antialias_planes_pallas(colour_planes, idbuf_p,
                                           payload_p, height, width)
            img_p = jnp.where(idbuf_p >= 0, aa_p, background)
            return jnp.moveaxis(img_p[:, :height, :width], 0, -1)

        rast, texc, verts_img, neigh_img, _data, idbuf, payload = \
            _rasterize_pallas_full(pos_clip, pos_idx, uv, uv_idx,
                                   face_neighbors, resolution, False,
                                   pair_cap)
        colour = texture(tex, texc, filter_mode="linear")
    else:
        from fpc_diffrend_tpu.ops.rasterize import rasterize_with_uv

        rast, texc = rasterize_with_uv(pos_clip, pos_idx, uv, uv_idx,
                                       resolution, impl=impl)
        colour = texture(tex, texc, filter_mode="linear")

    if verts_img is not None:
        # Pallas antialias over the fused winner payload: exact (no pair
        # cap), no gathers, tile-local pair stencil; position gradients
        # land on the payload's screen-corner planes and reduce through
        # the Pallas gradient kernel
        from fpc_diffrend_tpu.ops.pallas.antialias_tpu import (
            antialias_payload_pallas)

        colour = antialias_payload_pallas(colour, idbuf, payload)
    else:
        colour = antialias(colour, rast, pos_clip, pos_idx, face_neighbors,
                           max_pairs=aa_max_pairs)
    colour = jnp.where(rast[..., 3:] > 0, colour, background)
    return colour


def stacked_batch_eligible(config_resolution, tex_shape, enable_mip: bool,
                           impl: str) -> bool:
    """Whether the FPC_BATCH=stack pipeline can render this config: the
    fused pallas sepaa path with a VMEM-resident texture and no mip —
    exactly the production configuration (reference main.py defaults)."""
    import os

    from fpc_diffrend_tpu.ops.pallas.texture_tpu import fits_resident

    resolved = impl
    if resolved == "auto":
        resolved = "pallas" if jax.default_backend() == "tpu" else "scan"
    th, tw = tex_shape[0], tex_shape[1]
    c = tex_shape[2] if len(tex_shape) == 3 else 1
    return (resolved == "pallas" and not enable_mip
            and fits_resident(th, tw, c, "wrap")
            and os.environ.get("FPC_FUSE_TEX", "1") != "0"
            and os.environ.get("FPC_AA_FUSE", "0") != "1")


def render_batch_stacked(pos_clip_b: Array, pos_idx: Array, uv: Array,
                         uv_idx: Array, tex: Array,
                         resolution: Tuple[int, int], face_neighbors: Array,
                         background: float = BACKGROUND,
                         pair_cap: int | None = None,
                         inc=(None, None),
                         interpret: bool = False) -> Array:
    """Batch render via the stacked-batch fused pipeline (FPC_BATCH=stack).

    One pass of each Pallas kernel over the B samples stacked vertically
    (rasterize_tpu.bin_scene_stacked) — functionally identical to
    vmapping :func:`render_from_clip` over the batch on the production
    (fused sepaa) path, without the per-sample while-loop + slice glue
    vmap lowers Pallas calls to.

    :param pos_clip_b: (B, V, 4) clip-space positions per sample.
    :return: (B, H, W, C) images in [0, 1].
    """
    from fpc_diffrend_tpu.ops.rasterize import (
        rasterize_pallas_textured_sepaa_stacked)

    B = pos_clip_b.shape[0]
    h, w = resolution
    idbuf, aa = rasterize_pallas_textured_sepaa_stacked(
        pos_clip_b, pos_idx, uv, uv_idx, tex, face_neighbors, resolution,
        pair_cap=pair_cap, interpret=interpret, inc=inc)
    ph = idbuf.shape[0] // B
    C = aa.shape[0]
    img = jnp.where(idbuf >= 0, aa, background)       # (C, B*ph, pw)
    img = img.reshape(C, B, ph, idbuf.shape[1])[:, :, :h, :w]
    return jnp.moveaxis(img, 0, -1)                   # (B, H, W, C)


def _bary_db_to_uv_da(db: Array, uv: Array, uv_idx: Array,
                      rast: Array) -> Array:
    """(du/dx, du/dy, dv/dx, dv/dy) bary derivatives -> uv-space texd.

    Mirrors ops.interpolate's diff_attrs='all' chain for the fused path:
    texc = u*c0 + v*c1 + (1-u-v)*c2, so d texc/d screen = (c0-c2) du +
    (c1-c2) dv. Held out of the gradient path (mip LOD selection only).
    """
    ids = jnp.maximum(rast[..., 3].astype(jnp.int32) - 1, 0)
    corners = uv[uv_idx.astype(jnp.int32)]            # (T, 3, 2)
    c = jax.lax.stop_gradient(corners[ids])           # (H, W, 3, 2)
    d0 = c[..., 0, :] - c[..., 2, :]
    d1 = c[..., 1, :] - c[..., 2, :]
    du_dx, du_dy = db[..., 0], db[..., 1]
    dv_dx, dv_dy = db[..., 2], db[..., 3]
    ds_dx = d0[..., 0] * du_dx + d1[..., 0] * dv_dx
    ds_dy = d0[..., 0] * du_dy + d1[..., 0] * dv_dy
    dt_dx = d0[..., 1] * du_dx + d1[..., 1] * dv_dx
    dt_dy = d0[..., 1] * du_dy + d1[..., 1] * dv_dy
    return jnp.stack([ds_dx, ds_dy, dt_dx, dt_dy], axis=-1)

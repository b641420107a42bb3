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
                     "aa_max_pairs"))
def render(mvp: Array, pos: Array, pos_idx: Array, uv: Array, uv_idx: Array,
           tex: Array, resolution: Tuple[int, int], face_neighbors: Array,
           enable_mip: bool = False, max_mip_level: int = 0,
           impl: str = "auto", background: float = BACKGROUND,
           aa_max_pairs: int | None = None) -> Array:
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
    resolved_impl = impl
    if resolved_impl == "auto":
        resolved_impl = "pallas" if jax.default_backend() == "tpu" else "scan"

    if enable_mip:
        # db (bary screen derivatives) is only consumed by mip filtering
        rast, rast_db = rasterize(pos_clip, pos_idx, resolution, impl=impl,
                                  with_db=True)
        texc, texd = interpolate(uv, rast, uv_idx, rast_db=rast_db,
                                 diff_attrs="all")
        colour = texture(tex, texc, uv_da=texd,
                         filter_mode="linear-mipmap-linear",
                         max_mip_level=max_mip_level)
    else:
        from fpc_diffrend_tpu.ops.rasterize import rasterize_with_uv

        rast, texc = rasterize_with_uv(pos_clip, pos_idx, uv, uv_idx,
                                       resolution, impl=impl)
        if resolved_impl == "pallas" and tex.shape[-1] == 1:
            # tile-patch matmul sampler (no gathers); clamp boundary —
            # identical to wrap for uv inside [0,1) away from the border
            from fpc_diffrend_tpu.ops.pallas.texture_tpu import (
                texture_bilinear_pallas)

            colour = texture_bilinear_pallas(tex, texc, False)
        else:
            colour = texture(tex, texc, filter_mode="linear")

    colour = antialias(colour, rast, pos_clip, pos_idx, face_neighbors,
                       max_pairs=aa_max_pairs)
    colour = jnp.where(rast[..., 3:] > 0, colour, background)
    return colour

"""Pallas TPU visibility kernel (tile-binned z-buffered rasterization).

Production visibility path for ops/rasterize.py. Until the tiled kernel
lands, this module exposes the same interface backed by the XLA scan
implementation so the pipeline runs end-to-end on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from fpc_diffrend_tpu.ops import rasterize as _r


def visibility_pallas(pos_clip, faces, height: int, width: int) -> jnp.ndarray:
    """(H, W) int32 winning triangle ids; -1 = background."""
    # TODO(pallas): replace with the tile-binned Pallas kernel.
    return _r.visibility_scan(pos_clip, faces, height, width)

"""Differentiable rendering ops: the TPU-native nvdiffrast replacement.

Submodules keep their own namespaces (``ops.rasterize.rasterize`` etc.); the
composed pipeline entry point is re-exported here as ``ops.render``.
"""

from fpc_diffrend_tpu.ops import antialias as antialias_mod
from fpc_diffrend_tpu.ops import interpolate as interpolate_mod
from fpc_diffrend_tpu.ops import mesh_ops
from fpc_diffrend_tpu.ops import rasterize as rasterize_mod
from fpc_diffrend_tpu.ops import texture as texture_mod
from fpc_diffrend_tpu.ops.pipeline import BACKGROUND, render

__all__ = [
    "antialias_mod", "interpolate_mod", "mesh_ops", "rasterize_mod",
    "texture_mod", "render", "BACKGROUND",
]

"""fpc_diffrend_tpu — TPU-native differentiable rasterization + facial performance capture.

A from-scratch JAX/Pallas framework with the capabilities of the reference
pipeline (henkkagee/fpc-diffrend): markerless facial performance capture via
analysis-by-synthesis — render a blendshape-rigged face from calibrated
cameras, compare against reference video, and optimize rig activations, head
pose, camera corrections and texture by gradient descent.

Where the reference delegates rendering to nvdiffrast's CUDA/OpenGL kernels
(reference fit.py:151-160), this package implements the full differentiable
rasterization pipeline natively for TPU:

  * ``ops.rasterize``    — tile-binned z-buffered visibility (Pallas kernel)
                            + differentiable barycentric recompute (XLA)
  * ``ops.interpolate``  — perspective-correct attribute interpolation
  * ``ops.texture``      — bilinear / trilinear-mipmap texture sampling
  * ``ops.antialias``    — analytic silhouette-edge antialiasing (the
                            coverage-gradient path for vertex positions)

and TPU-first training infrastructure:

  * ``fit``       — jit-compiled batched fit loop (optax, lax.scan)
  * ``parallel``  — jax.sharding meshes: frame/view/tile axes, shard_map
  * ``data``      — OBJ / calibration / frame ingestion with prefetch
  * ``tools``     — offline renderers, comparisons, calibration tooling
"""

from fpc_diffrend_tpu.version import __version__

__all__ = ["__version__"]

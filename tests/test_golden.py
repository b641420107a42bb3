"""Golden regression: pins the full render pipeline's conventions.

Guards against drift in the clip transform, rasterization rules, UV
addressing, antialias blending and background compositing. Values were
generated from this implementation (no nvdiffrast runtime exists on this
machine to capture from; gradient correctness is covered by the
finite-difference / torch cross-check / interpret-parity suites).
"""

import numpy as np
import jax.numpy as jnp

from fpc_diffrend_tpu.data import obj as objlib
from fpc_diffrend_tpu.models import camera
from fpc_diffrend_tpu.ops.pipeline import render

GOLDEN_MEAN = 0.4121726453304291
GOLDEN_COVERAGE = 0.940185546875
GOLDEN_SAMPLES = [((10, 10), 0.570485), ((32, 32), 0.7579),
                  ((20, 40), 0.414111), ((45, 25), 0.499508),
                  ((55, 55), 0.445096)]


def test_golden_cube_render():
    verts = np.array([[x, y, z] for z in (-1, 1) for y in (-1, 1)
                      for x in (-1, 1)], np.float32) * 2.0
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
        [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
        np.int32)
    uv = (verts[:, :2] * 0.25 + 0.5).astype(np.float32)
    topo = objlib.build_topology(faces, 8)
    yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    tex = (((yy + xx) % 7) / 7.0).astype(np.float32)[..., None]
    proj = camera.default_projection()
    mv = (camera.default_modelview(zoffset=-25) @ camera.rotate_y(0.6)
          @ camera.rotate_x(0.4))
    img = render(jnp.asarray(proj @ mv), jnp.asarray(verts),
                 jnp.asarray(faces), jnp.asarray(uv), jnp.asarray(faces),
                 jnp.asarray(tex), (64, 64),
                 jnp.asarray(topo.face_neighbors), impl="scan")
    a = np.asarray(img)[..., 0]
    np.testing.assert_allclose(a.mean(), GOLDEN_MEAN, atol=1e-4)
    np.testing.assert_allclose((a != 45 / 255).mean(), GOLDEN_COVERAGE,
                               atol=2e-3)
    for (p, want) in GOLDEN_SAMPLES:
        np.testing.assert_allclose(a[p], want, atol=1e-4, err_msg=str(p))

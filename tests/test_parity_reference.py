"""Full-pipeline numerical parity vs the independent torch reference.

The correctness anchor demanded by the north star: renders and pixel
gradients of the JAX pipeline (rasterize -> interpolate -> texture ->
antialias -> composite, reference fit.py:151-161) must match an
independently written PyTorch implementation of nvdiffrast's published
semantics (tests/reference_impl/nvdiff_torch.py) on scenes covering
shared edges, occlusion/silhouettes, near-clip discards and texture
boundary modes. This replaces the self-referential golden constants of
test_golden.py as the primary correctness evidence.

The Pallas kernels are tied into this anchor transitively: the
pallas-vs-scan equality tests (test_rasterize_pallas.py,
test_raster_grad_pallas.py, test_pipeline_fused.py) pin the production
TPU path to the scan path verified here.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fpc_diffrend_tpu.data.obj import build_topology
from fpc_diffrend_tpu.models import camera
from fpc_diffrend_tpu.ops import pipeline

from tests.reference_impl import nvdiff_torch as ref

RES = (48, 64)   # (H, W) non-square to catch axis swaps


def _mvp():
    return (camera.default_projection(x=0.4)
            @ camera.translate(0.0, 0.0, -3.0)).astype(np.float32)


def _tex(rng, n=16, c=1):
    return rng.uniform(0.1, 0.9, size=(n, n, c)).astype(np.float32)


def _scene_single(rng):
    """One triangle — silhouette edges everywhere."""
    pos = np.array([[-0.8, -0.6, 0.0], [0.9, -0.4, 0.1], [0.0, 0.8, -0.1]],
                   np.float32)
    faces = np.array([[0, 1, 2]], np.int64)
    uv = np.array([[0.1, 0.1], [0.9, 0.2], [0.5, 0.95]], np.float32)
    return pos, faces, uv


def _jitter(pos, rng, amp=0.04):
    """Break axis/pixel-grid alignment: an edge that lies exactly on a
    pixel-row boundary puts every pair's blend at xi ~ 0.5, where the
    f32-vs-f64 sign of (xi - 0.5) — and hence the blend DIRECTION — is
    decided by rounding noise. Real meshes never align like that; jitter
    keeps the scenes generic."""
    return (pos + rng.uniform(-amp, amp, size=pos.shape)).astype(np.float32)


def _scene_quad(rng):
    """Two triangles sharing an edge — the interior edge must NOT blend."""
    pos = np.array([[-0.7, -0.7, 0.0], [0.7, -0.7, 0.0],
                    [0.7, 0.7, 0.0], [-0.7, 0.7, 0.0]], np.float32)
    # small z tilt so depths differ slightly across the shared edge
    pos[:, 2] = [0.0, 0.05, 0.1, 0.05]
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    uv = np.array([[0.05, 0.05], [0.95, 0.05], [0.95, 0.95], [0.05, 0.95]],
                  np.float32)
    return _jitter(pos, rng), faces, uv


def _scene_occlusion(rng):
    """Small near triangle over a large far quad — occlusion silhouette."""
    pos = np.array([
        [-0.9, -0.9, 0.3], [0.9, -0.9, 0.3], [0.9, 0.9, 0.3],
        [-0.9, 0.9, 0.3],                                       # far quad
        [-0.3, -0.2, -0.4], [0.4, -0.1, -0.4], [0.0, 0.5, -0.4]  # near tri
    ], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6]], np.int64)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1],
                   [0.2, 0.2], [0.8, 0.3], [0.5, 0.9]], np.float32)
    return _jitter(pos, rng), faces, uv


def _scene_nearclip(rng):
    """One visible triangle + one with a vertex behind the camera (w <= 0)
    that both implementations must discard identically."""
    pos = np.array([[-0.5, -0.5, 0.0], [0.6, -0.4, 0.0], [0.0, 0.6, 0.0],
                    [-0.5, -0.5, -5.0], [0.5, -0.5, -5.0], [0.0, 0.5, 4.0]],
                   np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int64)
    uv = np.array([[0.1, 0.1], [0.9, 0.1], [0.5, 0.9],
                   [0, 0], [1, 0], [0.5, 1]], np.float32)
    return _jitter(pos, rng), faces, uv


def _scene_soup(rng):
    """Seeded random soup — many overlaps and silhouettes."""
    v = rng.uniform(-0.9, 0.9, size=(24, 3)).astype(np.float32)
    v[:, 2] *= 0.5
    faces = rng.integers(0, 24, size=(12, 3)).astype(np.int64)
    keep = [(a != b) and (b != c) and (a != c) for a, b, c in faces]
    faces = faces[np.array(keep)]
    uv = rng.uniform(0.0, 1.0, size=(24, 2)).astype(np.float32)
    return v, faces, uv


SCENES = [_scene_single, _scene_quad, _scene_occlusion, _scene_nearclip,
          _scene_soup]


def _renders(scene_fn, rng, boundary="wrap", uv_scale=1.0):
    pos, faces, uv = scene_fn(rng)
    uv = uv * uv_scale
    tex = _tex(rng)
    mvp = _mvp()
    topo = build_topology(faces, pos.shape[0])
    h, w = RES

    g_img = rng.normal(size=(h, w, 1)).astype(np.float32)

    def loss_jax(p, u, t):
        img = pipeline.render(jnp.asarray(mvp), p, jnp.asarray(faces),
                              u, jnp.asarray(faces), t, RES,
                              jnp.asarray(topo.face_neighbors),
                              impl="scan")
        return jnp.sum(img * g_img), img

    (lj, img_j), grads_j = jax.value_and_grad(loss_jax, argnums=(0, 1, 2),
                                              has_aux=True)(
        jnp.asarray(pos), jnp.asarray(uv), jnp.asarray(tex))

    pos_t = torch.tensor(pos, dtype=torch.float64, requires_grad=True)
    uv_t = torch.tensor(uv, dtype=torch.float64, requires_grad=True)
    tex_t = torch.tensor(tex, dtype=torch.float64, requires_grad=True)
    img_t = ref.render(torch.tensor(mvp, dtype=torch.float64), pos_t,
                       torch.tensor(faces), uv_t, torch.tensor(faces),
                       tex_t, h, w, boundary_mode=boundary)
    (img_t * torch.tensor(g_img, dtype=torch.float64)).sum().backward()
    grads_t = (pos_t.grad, uv_t.grad, tex_t.grad)
    return np.asarray(img_j), img_t.detach().numpy(), grads_j, grads_t


@pytest.mark.parametrize("scene_fn", SCENES,
                         ids=[f.__name__[7:] for f in SCENES])
def test_image_and_gradient_parity(scene_fn, rng):
    img_j, img_t, grads_j, grads_t = _renders(scene_fn, rng)

    # forward image parity (f32 pipeline vs f64 oracle)
    np.testing.assert_allclose(img_j, img_t, rtol=1e-4, atol=2e-4)

    names = ("d/dpos", "d/duv", "d/dtex")
    for name, gj, gt in zip(names, grads_j, grads_t):
        gj = np.asarray(gj)
        gt = gt.numpy()
        scale = max(np.abs(gt).max(), 1e-6)
        np.testing.assert_allclose(
            gj / scale, gt / scale, rtol=2e-3, atol=2e-3,
            err_msg=f"{name} mismatch in {scene_fn.__name__}")


def test_texture_boundary_modes_parity(rng):
    """Out-of-range UVs exercise wrap vs clamp; op-level check."""
    from fpc_diffrend_tpu.ops.texture import texture as texture_jax

    tex = _tex(rng, n=8, c=3)
    uvq = rng.uniform(-1.2, 2.2, size=(17, 13, 2)).astype(np.float32)
    for mode in ("wrap", "clamp"):
        out_j = np.asarray(texture_jax(jnp.asarray(tex), jnp.asarray(uvq),
                                       boundary_mode=mode))
        out_t = ref.texture(torch.tensor(tex, dtype=torch.float64),
                            torch.tensor(uvq, dtype=torch.float64),
                            boundary_mode=mode).numpy()
        np.testing.assert_allclose(out_j, out_t, rtol=1e-5, atol=1e-5,
                                   err_msg=f"boundary={mode}")


def test_texture_mipmap_parity(rng):
    """Trilinear mipmap sampling against the torch pyramid oracle."""
    from fpc_diffrend_tpu.ops.texture import texture as texture_jax

    tex = _tex(rng, n=32, c=1)
    uvq = rng.uniform(0.05, 0.95, size=(9, 11, 2)).astype(np.float32)
    # uv footprints spanning several octaves of minification
    da = rng.uniform(-0.3, 0.3, size=(9, 11, 4)).astype(np.float32)
    out_j = np.asarray(texture_jax(
        jnp.asarray(tex), jnp.asarray(uvq), uv_da=jnp.asarray(da),
        filter_mode="linear-mipmap-linear", max_mip_level=4))
    out_t = ref.texture(torch.tensor(tex, dtype=torch.float64),
                        torch.tensor(uvq, dtype=torch.float64),
                        uv_da=torch.tensor(da, dtype=torch.float64),
                        filter_mode="linear-mipmap-linear",
                        max_mip_level=4).numpy()
    np.testing.assert_allclose(out_j, out_t, rtol=1e-4, atol=1e-4)


def test_rasterize_op_parity(rng):
    """Op-level rast buffer parity (u, v, z, id) on the occlusion scene."""
    from fpc_diffrend_tpu.ops.rasterize import rasterize

    pos, faces, _ = _scene_occlusion(rng)
    mvp = _mvp()
    h, w = RES
    pos_clip = np.concatenate([pos, np.ones((pos.shape[0], 1), np.float32)],
                              axis=1) @ mvp.T
    rast_j = np.asarray(rasterize(jnp.asarray(pos_clip), jnp.asarray(faces),
                                  RES, impl="scan", with_db=False))
    rast_t = ref.rasterize(torch.tensor(pos_clip, dtype=torch.float64),
                           torch.tensor(faces), h, w).numpy()
    # f32 vs f64 edge functions may disagree on knife-edge pixels
    agree = rast_j[..., 3] == rast_t[..., 3]
    assert agree.mean() > 0.995, f"winner ids differ on {(~agree).sum()} px"
    np.testing.assert_allclose(rast_j[..., :3][agree], rast_t[..., :3][agree],
                               rtol=1e-4, atol=1e-5)

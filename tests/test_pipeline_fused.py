"""End-to-end fused-pipeline parity: render(impl='pallas') vs 'scan'.

Runs the production TPU path (fused rasterize+interpolate kernel,
VMEM-resident texture kernel, elementwise antialias, Pallas gradient
kernel) under the Pallas interpreter and checks values and gradients
against the pure-XLA scan path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from fpc_diffrend_tpu.data import obj as objlib
from fpc_diffrend_tpu.ops.pipeline import render
from fpc_diffrend_tpu.utils.debugging import pallas_interpret_mode

import pytest

# interpret-mode Pallas kernel tests dominate suite runtime (round-4
# VERDICT #8): run with `pytest -m slow`; the default fast set keeps
# scan-path parity + golden coverage for every kernel.
pytestmark = pytest.mark.slow


def scene(rng):
    # deformed grid dome, the capture workload shape
    n = 9
    ys, xs = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n),
                         indexing="ij")
    z = 0.3 * np.exp(-(xs ** 2 + ys ** 2)) + 0.02 * rng.normal(size=xs.shape)
    verts = np.stack([xs * 1.2, ys * 1.2, z], -1).reshape(-1, 3)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    faces = np.asarray(faces, np.int32)
    uv = (verts[:, :2] * 0.4 + 0.5).astype(np.float32)
    topo = objlib.build_topology(faces, verts.shape[0])
    mvp = np.eye(4, dtype=np.float32)
    mvp[2, 3] = 0.0
    return (jnp.asarray(mvp), jnp.asarray(verts.astype(np.float32)),
            jnp.asarray(faces), jnp.asarray(uv), jnp.asarray(faces),
            jnp.asarray(topo.face_neighbors))


def test_fused_pipeline_matches_scan(rng):
    mvp, verts, faces, uv, uv_idx, neigh = scene(rng)
    tex = jnp.asarray(rng.uniform(size=(64, 128, 1)).astype(np.float32))
    res = (48, 128)

    img_scan = render(mvp, verts, faces, uv, uv_idx, tex, res, neigh,
                      impl="scan", aa_max_pairs=None)
    with pallas_interpret_mode():
        img_pl = render(mvp, verts, faces, uv, uv_idx, tex, res, neigh,
                        impl="pallas")
    a = np.asarray(img_scan)
    b = np.asarray(img_pl)
    # coverage-edge pixels may disagree (float associativity in the two
    # visibility formulations); the overwhelming majority must match
    close = np.isclose(a, b, atol=2e-4)
    assert close.mean() > 0.995, f"{(~close).sum()} of {close.size} differ"


def test_fused_pipeline_gradients_match_scan(rng):
    mvp, verts, faces, uv, uv_idx, neigh = scene(rng)
    tex = jnp.asarray(rng.uniform(size=(64, 128, 1)).astype(np.float32))
    res = (48, 128)
    ref = jnp.asarray(rng.uniform(size=res + (1,)).astype(np.float32))

    def loss(v, t, impl):
        img = render(mvp, v, faces, uv, uv_idx, t, res, neigh, impl=impl,
                     aa_max_pairs=None)
        return jnp.mean((ref - img) ** 2)

    gv_s, gt_s = jax.grad(lambda v, t: loss(v, t, "scan"),
                          argnums=(0, 1))(verts, tex)
    with pallas_interpret_mode():
        gv_p, gt_p = jax.grad(lambda v, t: loss(v, t, "pallas"),
                              argnums=(0, 1))(verts, tex)

    # texture gradients: dense and smooth, must match tightly
    np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_s),
                               atol=5e-5, rtol=5e-3)
    # vertex gradients: small boundary-mode differences allowed (wrap vs
    # wrap via different samplers is exact; visibility edge pixels differ)
    gs = np.asarray(gv_s)
    gp = np.asarray(gv_p)
    denom = np.abs(gs).max()
    assert np.abs(gp - gs).max() / denom < 0.02, (
        np.abs(gp - gs).max(), denom)


def test_render_multichannel_texture_scan():
    """C=3 texture renders through the pipeline (nvdiffrast supports
    C>1; the reference uses C=1 but the API must not)."""
    import numpy as np
    import jax.numpy as jnp
    from fpc_diffrend_tpu.data.obj import build_topology
    from fpc_diffrend_tpu.ops import pipeline

    rng = np.random.default_rng(0)
    pos = np.array([[-0.8, -0.8, 0], [0.8, -0.8, 0], [0.8, 0.8, 0],
                    [-0.8, 0.8, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    tex = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    topo = build_topology(faces, 4)
    img = pipeline.render(jnp.eye(4), jnp.asarray(pos), jnp.asarray(faces),
                          jnp.asarray(uv), jnp.asarray(faces),
                          jnp.asarray(tex), (48, 48),
                          jnp.asarray(topo.face_neighbors), impl="scan")
    img = np.asarray(img)
    assert img.shape == (48, 48, 3)
    assert np.isfinite(img).all()
    # interior pixels carry the three distinct channels
    assert np.abs(img[24, 24] - img[24, 24].mean()).max() > 1e-4


def test_fused_texture_matches_separate_kernels(rng, monkeypatch):
    """FPC_FUSE_TEX=1 (texture sampled inside the raster kernel) must
    match FPC_FUSE_TEX=0 (separate planes texture kernel) exactly in
    value and in all gradients — same math, same origins."""
    mvp, verts, faces, uv, uv_idx, neigh = scene(rng)
    tex = jnp.asarray(rng.uniform(size=(64, 128, 1)).astype(np.float32))
    res = (48, 128)
    ref = jnp.asarray(rng.uniform(size=res + (1,)).astype(np.float32))

    def loss(v, t):
        img = render(mvp, v, faces, uv, uv_idx, t, res, neigh,
                     impl="pallas")
        return jnp.mean((ref - img) ** 2), img

    with pallas_interpret_mode():
        monkeypatch.setenv("FPC_FUSE_TEX", "0")
        (l0, img0), (gv0, gt0) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(verts, tex)
        jax.clear_caches()
        monkeypatch.setenv("FPC_FUSE_TEX", "1")
        (l1, img1), (gv1, gt1) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(verts, tex)
        jax.clear_caches()

    np.testing.assert_allclose(np.asarray(img1), np.asarray(img0),
                               atol=1e-6)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt0),
                               atol=1e-7, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv0),
                               atol=1e-6, rtol=1e-5)


def test_fused_aa_multichannel(rng, monkeypatch):
    """The fused-AA kernel's per-channel loops (carries, side outputs,
    boundary pairs) must reproduce the separate path for C=3 too."""
    mvp, verts, faces, uv, uv_idx, neigh = scene(rng)
    tex = jnp.asarray(rng.uniform(size=(32, 128, 3)).astype(np.float32))
    res = (32, 128)

    def img_of(v):
        return render(mvp, v, faces, uv, uv_idx, tex, res, neigh,
                      impl="pallas")

    with pallas_interpret_mode():
        monkeypatch.setenv("FPC_AA_FUSE", "0")
        img0 = np.asarray(img_of(verts))
        jax.clear_caches()
        monkeypatch.setenv("FPC_AA_FUSE", "1")
        img1 = np.asarray(img_of(verts))
        jax.clear_caches()

    assert img0.shape == res + (3,)
    np.testing.assert_allclose(img1, img0, atol=1e-6)


def test_fused_aa_matches_separate_kernel(rng, monkeypatch):
    """FPC_AA_FUSE=1 (antialias evaluated inside the raster kernel, with
    boundary pairs re-anchored at the right/bottom tile and a-side
    deltas folded back XLA-side) must match the separate AA kernel to
    float-add reassociation (the boundary a-side delta is added in a
    different order), in value and in all gradients."""
    mvp, verts, faces, uv, uv_idx, neigh = scene(rng)
    tex = jnp.asarray(rng.uniform(size=(64, 128, 1)).astype(np.float32))
    res = (48, 128)
    ref = jnp.asarray(rng.uniform(size=res + (1,)).astype(np.float32))

    def loss(v, t):
        img = render(mvp, v, faces, uv, uv_idx, t, res, neigh,
                     impl="pallas")
        return jnp.mean((ref - img) ** 2), img

    with pallas_interpret_mode():
        monkeypatch.setenv("FPC_AA_FUSE", "0")
        (l0, img0), (gv0, gt0) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(verts, tex)
        jax.clear_caches()
        monkeypatch.setenv("FPC_AA_FUSE", "1")
        (l1, img1), (gv1, gt1) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(verts, tex)
        jax.clear_caches()

    np.testing.assert_allclose(np.asarray(img1), np.asarray(img0),
                               atol=1e-6)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt0),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv0),
                               atol=1e-6, rtol=1e-5)

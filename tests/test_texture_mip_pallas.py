"""Pallas trilinear-mip sampler vs the XLA mip path (interpret mode).

The two implementations share semantics when fed the same LOD field: the
XLA path derives lod from uv_da, so tests synthesize uv_da = [2^lam / tw,
0, 0, 0] to pin lod == lam exactly (ops/texture.py:99-105).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpc_diffrend_tpu.ops.pallas.texture_mip_tpu import (
    lod_from_texc, mip_texture_pallas)
from fpc_diffrend_tpu.ops.texture import texture as texture_xla


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _scene(rng, th=64, tw=64, C=1, H=16, W=256, lo=0.3, hi=2.6):
    tex = rng.uniform(size=(th, tw, C)).astype(np.float32)
    yy, xx = np.meshgrid(np.linspace(0.15, 0.85, H),
                         np.linspace(0.1, 0.9, W), indexing="ij")
    uv = np.stack([xx, yy], axis=-1).astype(np.float32)
    lam = np.linspace(lo, hi, H * W).reshape(H, W).astype(np.float32)
    uv_da = np.zeros((H, W, 4), np.float32)
    uv_da[..., 0] = (2.0 ** lam) / tw
    return (jnp.asarray(tex), jnp.asarray(uv), jnp.asarray(lam),
            jnp.asarray(uv_da))


def test_mip_forward_matches_xla(rng):
    tex, uv, lam, uv_da = _scene(rng)
    got = mip_texture_pallas(tex, uv, lam, 3, interpret=True)
    want = texture_xla(tex, uv, uv_da=uv_da,
                       filter_mode="linear-mipmap-linear",
                       boundary_mode="wrap", max_mip_level=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_mip_forward_multichannel(rng):
    tex, uv, lam, uv_da = _scene(rng, C=3)
    got = mip_texture_pallas(tex, uv, lam, 3, interpret=True)
    want = texture_xla(tex, uv, uv_da=uv_da,
                       filter_mode="linear-mipmap-linear",
                       boundary_mode="wrap", max_mip_level=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_mip_gradients_match_xla(rng):
    tex, uv, lam, uv_da = _scene(rng)

    def loss_p(t, c):
        out = mip_texture_pallas(t, c, lam, 3, interpret=True)
        return jnp.sum(out * out)

    def loss_x(t, c):
        out = texture_xla(t, c, uv_da=uv_da,
                          filter_mode="linear-mipmap-linear",
                          boundary_mode="wrap", max_mip_level=3)
        return jnp.sum(out * out)

    gt_p, gc_p = jax.grad(loss_p, argnums=(0, 1))(tex, uv)
    gt_x, gc_x = jax.grad(loss_x, argnums=(0, 1))(tex, uv)
    np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_x),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gc_p), np.asarray(gc_x),
                               atol=2e-3, rtol=1e-3)


def test_mip_level_zero_matches_bilinear(rng):
    """lam == 0 everywhere reduces to plain bilinear sampling."""
    tex, uv, _lam, _ = _scene(rng)
    lam0 = jnp.zeros(uv.shape[:2], jnp.float32)
    got = mip_texture_pallas(tex, uv, lam0, 3, interpret=True)
    want = texture_xla(tex, uv, filter_mode="linear",
                       boundary_mode="wrap")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_lod_from_texc_matches_analytic():
    """FD lod on a linear uv image equals the analytic footprint."""
    H, W, th, tw = 24, 256, 128, 128
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    # 3 texels per pixel in s, 1 in t -> lod = log2(3)
    uv = np.stack([3.0 * xx / tw, 1.0 * yy / th],
                  axis=-1).astype(np.float32)
    ids = np.ones((H, W), np.int32)
    lam = lod_from_texc(jnp.asarray(uv), jnp.asarray(ids), th, tw)
    interior = np.asarray(lam)[1:-1, 1:-1]
    np.testing.assert_allclose(interior, np.log2(3.0), atol=1e-3)


def test_mip_branch_against_analytic_lod_pipeline(rng):
    """The pipeline's Pallas mip branch (FD LOD + packed-pyramid kernel)
    vs the XLA branch (analytic LOD + gather trilinear) on a rendered
    scene: interiors must agree closely (LOD differs only at triangle
    boundaries, where the FD falls back to one-sided differences)."""
    import numpy as np
    from fpc_diffrend_tpu.models.camera import transform_clip
    from fpc_diffrend_tpu.ops import interpolate as interp_mod
    from fpc_diffrend_tpu.ops import rasterize as rast_mod

    # a quad made of 2 triangles filling most of the frame, minified uv
    pos = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                   np.float32) * 0.9
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uv = np.array([[0, 0], [6, 0], [6, 6], [0, 6]], np.float32)
    tex = rng.uniform(size=(64, 64, 1)).astype(np.float32)
    mvp = np.eye(4, dtype=np.float32)
    H = W = 64

    pos_clip = transform_clip(jnp.asarray(mvp), jnp.asarray(pos))
    rast, rast_db = rast_mod.rasterize(pos_clip, jnp.asarray(faces),
                                       (H, W), impl="scan", with_db=True)
    texc, texd = interp_mod.interpolate(jnp.asarray(uv), rast,
                                        jnp.asarray(faces),
                                        rast_db=rast_db, diff_attrs="all")
    want = texture_xla(jnp.asarray(tex), texc, uv_da=texd,
                       filter_mode="linear-mipmap-linear",
                       boundary_mode="wrap", max_mip_level=4)

    tri_id = rast[..., 3].astype(jnp.int32)
    lam = lod_from_texc(texc, tri_id, 64, 64)
    got = mip_texture_pallas(jnp.asarray(tex), texc, lam, 4,
                             interpret=True)

    inside = np.asarray(tri_id > 0)
    # erode the mask so only same-triangle FD interiors are compared
    er = inside[1:-1, 1:-1] & inside[:-2, 1:-1] & inside[2:, 1:-1] \
        & inside[1:-1, :-2] & inside[1:-1, 2:]
    same_tri = (np.asarray(tri_id)[1:-1, 1:-1] ==
                np.asarray(tri_id)[2:, 1:-1]) & \
               (np.asarray(tri_id)[1:-1, 1:-1] ==
                np.asarray(tri_id)[1:-1, 2:])
    m = er & same_tri
    assert m.sum() > 500
    g = np.asarray(got)[1:-1, 1:-1][m]
    w = np.asarray(want)[1:-1, 1:-1][m]
    err = np.abs(g - w)
    # FD LOD is exact to first order; near mip-level crossings the
    # second-order difference can shift the blend weight slightly. The
    # bulk must match tightly; the tail bound covers the handful of
    # pixels that sit right on a level crossing (the band-reordered
    # face ids shifted which pixels those are).
    assert np.quantile(err, 0.9) < 1e-4, np.quantile(err, 0.9)
    assert np.quantile(err, 0.99) < 2e-2, np.quantile(err, 0.99)
    assert err.max() < 0.1, err.max()

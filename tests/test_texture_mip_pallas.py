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

"""Interpolate + texture tests, incl. cross-validation against torch autograd."""

import numpy as np
import jax
import jax.numpy as jnp

import fpc_diffrend_tpu.ops.rasterize as r
from fpc_diffrend_tpu.ops.interpolate import interpolate
from fpc_diffrend_tpu.ops.texture import texture, build_mip_pyramid


def fullscreen_quad():
    pos = jnp.asarray(np.array([
        [-1, -1, 0, 1], [1, -1, 0, 1], [1, 1, 0, 1], [-1, 1, 0, 1],
    ], dtype=np.float32))
    faces = jnp.asarray(np.array([[0, 1, 2], [0, 2, 3]], np.int32))
    uv = jnp.asarray(np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))
    return pos, faces, uv


def test_interpolate_uv_gradient_field():
    pos, faces, uv = fullscreen_quad()
    H = W = 32
    rast, db = r.rasterize(pos, faces, (H, W), impl="scan")
    texc, texd = interpolate(uv, rast, faces, rast_db=db, diff_attrs="all")
    texc = np.asarray(texc)
    # uv should equal pixel-center normalized coords
    xs = (np.arange(W) + 0.5) / W
    ys = (np.arange(H) + 0.5) / H
    np.testing.assert_allclose(texc[..., 0], np.tile(xs, (H, 1)), atol=1e-5)
    np.testing.assert_allclose(texc[..., 1], np.tile(ys[:, None], (1, W)), atol=1e-5)
    # derivative of u over x is 1/W per pixel
    texd = np.asarray(texd)
    np.testing.assert_allclose(texd[..., 0], 1.0 / W, atol=1e-5)
    np.testing.assert_allclose(texd[..., 1], 0.0, atol=1e-5)
    np.testing.assert_allclose(texd[..., 2], 0.0, atol=1e-5)
    np.testing.assert_allclose(texd[..., 3], 1.0 / H, atol=1e-5)


def test_texture_bilinear_matches_torch(rng):
    """Value + gradient parity with an independent torch implementation."""
    import torch

    TH = TW = 16
    tex_np = rng.uniform(size=(TH, TW, 3)).astype(np.float32)
    uv_np = rng.uniform(low=0.05, high=0.95, size=(50, 2)).astype(np.float32)

    def torch_bilinear(tex_t, uv_t):
        s = uv_t[:, 0] * TW - 0.5
        t = uv_t[:, 1] * TH - 0.5
        s0 = torch.floor(s); t0 = torch.floor(t)
        fs = (s - s0).unsqueeze(1); ft = (t - t0).unsqueeze(1)
        s0 = s0.long() % TW; t0 = t0.long() % TH
        s1 = (s0 + 1) % TW; t1 = (t0 + 1) % TH
        c00 = tex_t[t0, s0]; c01 = tex_t[t0, s1]
        c10 = tex_t[t1, s0]; c11 = tex_t[t1, s1]
        top = c00 * (1 - fs) + c01 * fs
        bot = c10 * (1 - fs) + c11 * fs
        return top * (1 - ft) + bot * ft

    tex_t = torch.tensor(tex_np, requires_grad=True)
    uv_t = torch.tensor(uv_np, requires_grad=True)
    out_t = torch_bilinear(tex_t, uv_t)
    w = torch.linspace(0.5, 1.5, out_t.numel()).reshape(out_t.shape)
    (out_t * w).sum().backward()

    def jax_loss(tex_j, uv_j):
        out = texture(tex_j, uv_j, filter_mode="linear", boundary_mode="wrap")
        wj = jnp.linspace(0.5, 1.5, out.size).reshape(out.shape)
        return jnp.sum(out * wj), out

    (loss, out_j), grads = jax.value_and_grad(jax_loss, argnums=(0, 1),
                                              has_aux=True)(
        jnp.asarray(tex_np), jnp.asarray(uv_np))
    np.testing.assert_allclose(np.asarray(out_j), out_t.detach().numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(grads[0]), tex_t.grad.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(grads[1]), uv_t.grad.numpy(), atol=1e-3)


def test_texture_wrap_vs_clamp():
    tex = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
    uv = jnp.asarray(np.array([[-0.05, 0.5]], np.float32))
    wrapped = np.asarray(texture(tex, uv, boundary_mode="wrap"))
    clamped = np.asarray(texture(tex, uv, boundary_mode="clamp"))
    assert not np.allclose(wrapped, clamped)


def test_mip_pyramid():
    tex = jnp.ones((8, 8, 1)) * jnp.arange(8).reshape(8, 1, 1).astype(jnp.float32)
    levels = build_mip_pyramid(tex, 3)
    assert [lv.shape[0] for lv in levels] == [8, 4, 2, 1]
    np.testing.assert_allclose(float(levels[-1][0, 0, 0]), 3.5)


def test_mipmap_selects_coarse_level_when_minified():
    TH = TW = 64
    # checkerboard -> coarse mip is flat 0.5
    yy, xx = np.meshgrid(np.arange(TH), np.arange(TW), indexing="ij")
    tex = jnp.asarray(((yy + xx) % 2).astype(np.float32)[..., None])
    uv = jnp.asarray(np.array([[0.5, 0.5]], np.float32))
    # footprint of 16 texels -> lod 4 -> flat grey
    uv_da = jnp.asarray(np.array([[16.0 / TW, 0.0, 0.0, 16.0 / TH]], np.float32))
    out = np.asarray(texture(tex, uv, uv_da=uv_da,
                             filter_mode="linear-mipmap-linear",
                             max_mip_level=6))
    np.testing.assert_allclose(out, 0.5, atol=0.05)
    # footprint of 1 texel -> lod 0 -> sharp sample
    uv_da0 = jnp.asarray(np.array([[1.0 / TW, 0.0, 0.0, 1.0 / TH]], np.float32))
    out0 = np.asarray(texture(tex, uv, uv_da=uv_da0,
                              filter_mode="linear-mipmap-linear",
                              max_mip_level=6))
    assert abs(float(out0[0, 0]) - 0.5) <= 0.5  # sharp-ish, just finite
    # and differentiable w.r.t. tex through mip chain
    g = jax.grad(lambda t: jnp.sum(texture(
        t, uv, uv_da=uv_da, filter_mode="linear-mipmap-linear",
        max_mip_level=6)))(tex)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_textured_render_roundtrip():
    """Full-screen quad textured with a gradient reproduces the texture."""
    pos, faces, uv = fullscreen_quad()
    H = W = 64
    tex_np = np.zeros((64, 64, 1), np.float32)
    tex_np[:, :, 0] = np.linspace(0, 1, 64)[None, :]
    rast, db = r.rasterize(pos, faces, (H, W), impl="scan")
    texc, _ = interpolate(uv, rast, faces)
    out = np.asarray(texture(jnp.asarray(tex_np), texc))
    want = np.tile(np.linspace(0, 1, 64)[None, :, None], (H, 1, 1))
    np.testing.assert_allclose(out, want, atol=0.02)

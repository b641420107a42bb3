"""Pallas gradient-kernel parity vs. XLA autodiff (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fpc_diffrend_tpu.ops.rasterize as r


# interpret-mode Pallas kernel tests dominate suite runtime (round-4
# VERDICT #8): run with `pytest -m slow`; the default fast set keeps
# scan-path parity + golden coverage for every kernel.
pytestmark = pytest.mark.slow


def random_scene(rng, n_tris=30, depth_spread=True):
    v = rng.uniform(-1.1, 1.1, size=(n_tris * 3, 2)).astype(np.float32)
    z = (rng.uniform(-0.8, 0.8, size=(n_tris * 3, 1)).astype(np.float32)
         if depth_spread else np.zeros((n_tris * 3, 1), np.float32))
    w = rng.uniform(0.8, 1.5, size=(n_tris * 3, 1)).astype(np.float32)
    pos = np.concatenate([v * w, z * w, w], axis=1)
    faces = np.arange(n_tris * 3, dtype=np.int32).reshape(n_tris, 3)
    return jnp.asarray(pos), jnp.asarray(faces)


def loss_fn(pos, faces, res, impl, interpret=False):
    rast, db = r.rasterize(pos, faces, res, impl=impl, interpret=interpret)
    # weighted sums hit u, v, z with distinct cotangent fields
    wu = jnp.linspace(0.3, 1.7, res[0] * res[1]).reshape(res)
    wv = jnp.linspace(1.1, 0.2, res[0] * res[1]).reshape(res)
    return (jnp.sum(rast[..., 0] * wu) + jnp.sum(rast[..., 1] * wv)
            + 0.31 * jnp.sum(rast[..., 2]))


@pytest.mark.parametrize("res", [(64, 64), (48, 96)])
def test_pallas_forward_matches_scan(rng, res):
    pos, faces = random_scene(rng)
    rast_s, db_s = r.rasterize(pos, faces, res, impl="scan")
    rast_p, db_p = r.rasterize(pos, faces, res, impl="pallas",
                               interpret=True)
    ids_agree = np.asarray(rast_s[..., 3]) == np.asarray(rast_p[..., 3])
    assert ids_agree.mean() > 0.998
    np.testing.assert_allclose(np.asarray(rast_p[..., :3])[ids_agree],
                               np.asarray(rast_s[..., :3])[ids_agree],
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(db_p)[ids_agree],
                               np.asarray(db_s)[ids_agree], atol=2e-3)


def test_pallas_gradient_matches_autodiff(rng):
    pos, faces = random_scene(rng, n_tris=25)
    res = (64, 64)

    g_scan = jax.grad(lambda p: loss_fn(p, faces, res, "scan"))(pos)
    g_pallas = jax.grad(
        lambda p: loss_fn(p, faces, res, "pallas", True))(pos)

    # gradients only comparable where visibility agrees; with identical
    # coverage (same algorithm) they should match closely overall
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_scan),
                               rtol=2e-3, atol=2e-3)


def test_fast_gradient_precision_bounded(rng, monkeypatch):
    """The production default FPC_GRAD_PREC=fast (single bf16 gradient
    contraction; convergence-validated vs SGD seed noise) stays within
    ~1% of the exact 3-way split — and actually engages (nonzero diff)."""
    import fpc_diffrend_tpu.ops.pallas.raster_grad_tpu as rg

    pos, faces = random_scene(rng, n_tris=25)
    res = (64, 64)

    monkeypatch.setattr(rg, "_GRAD_FAST", False)
    jax.clear_caches()      # rasterize is jitted; the knob isn't a key
    g_exact = jax.grad(lambda p: loss_fn(p, faces, res, "pallas", True))(pos)
    monkeypatch.setattr(rg, "_GRAD_FAST", True)
    jax.clear_caches()
    g_fast = jax.grad(lambda p: loss_fn(p, faces, res, "pallas", True))(pos)
    jax.clear_caches()      # don't leak fast-knob traces to other tests

    d = np.asarray(g_fast) - np.asarray(g_exact)
    ge = np.asarray(g_exact)
    assert np.abs(d).max() > 0.0              # the knob really engaged
    # bf16 error is ~4e-3 per contraction, but cancellation amplifies
    # per-element gradient error (measured ~6% normalized RMS on this
    # adversarial random scene). The bound here is a tripwire against
    # structural regressions; the convergence study
    # (results/precision*/precision.md) is the evidence the noise is
    # harmless to a real fit.
    assert np.sqrt((d ** 2).mean()) / np.sqrt((ge ** 2).mean()) < 0.10
    assert np.abs(d).max() / np.abs(ge).max() < 0.5


def test_pallas_gradient_finite_difference(rng):
    pos_np = np.array([
        [-0.7, -0.5, 0.1, 1.0],
        [0.8, -0.4, 0.1, 1.2],
        [0.0, 0.7, 0.1, 0.9],
    ], dtype=np.float32)
    faces = jnp.asarray(np.array([[0, 1, 2]], np.int32))
    res = (48, 48)
    pos = jnp.asarray(pos_np)

    # hold ids fixed for FD (coverage gradients live in antialias); use
    # the Pallas kernel's own coverage so the FD loss and the kernel
    # agree on knife-edge pixels
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
        bin_scene as _bsc, visibility_from_bins as _vfb)

    idbuf = _vfb(_bsc(pos, faces, *res)[1], *res, interpret=True)

    def loss(p):
        """XLA value path with frozen winner ids (differentiable)."""
        u, v, z, mask = r.pixel_attributes(p, faces, idbuf, *res)
        return jnp.sum(u * 1.3) + jnp.sum(v * 0.7) + jnp.sum(z * 0.11)

    def pallas_grad(p):
        """The same cotangents pushed through the Pallas gradient kernel
        exactly as rasterize_fused's custom VJP does."""
        from fpc_diffrend_tpu.ops.pallas.raster_grad_tpu import (
            pixel_grad_pallas)
        from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
            N_PAYLOAD, aux_records, bin_scene, fused_rasterize_from_bins,
            triangle_setup)

        def records(p):
            data, _, _ = triangle_setup(p, faces, *res)
            aux = aux_records(jnp.zeros((p.shape[0], 2)), faces, p, faces,
                              None, res[0], res[1])
            return data, aux

        _, bins = bin_scene(p, faces, *res)
        bins = jax.tree.map(jax.lax.stop_gradient, bins)
        _idb, payload, entry, extra = fused_rasterize_from_bins(
            bins, *res, interpret=True)
        gpl = np.zeros((N_PAYLOAD,) + res, np.float32)
        gpl[0] = 1.3
        gpl[1] = 0.7
        gpl[2] = np.where(np.asarray(idbuf) >= 0, 0.11, 0.0)
        grad_data, grad_aux = pixel_grad_pallas(
            bins, entry, payload[0], payload[1], extra, jnp.asarray(gpl),
            faces.shape[0], *res, interpret=True)
        _, vjp = jax.vjp(records, p)
        return vjp((grad_data, grad_aux))[0]

    g = np.asarray(pallas_grad(pos))
    eps = 1e-3
    for (i, j) in [(0, 0), (1, 1), (2, 3), (0, 3), (1, 2)]:
        pp = pos_np.copy(); pp[i, j] += eps
        pm = pos_np.copy(); pm[i, j] -= eps
        fd = (float(loss(jnp.asarray(pp))) - float(loss(jnp.asarray(pm))))\
            / (2 * eps)
        np.testing.assert_allclose(g[i, j], fd, rtol=5e-3, atol=5e-2,
                                   err_msg=f"vertex {i} comp {j}")


def test_pallas_gradient_oversized_triangle(rng):
    """Gradients flow through the global (oversized) triangle list."""
    big = np.array([[-8, -8, 0.0, 1], [8, -8, 0.0, 1], [0, 8, 0.0, 1]],
                   np.float32)
    pos_small, faces_small = random_scene(rng, n_tris=5)
    pos = jnp.asarray(np.concatenate([big, np.asarray(pos_small)]))
    faces = jnp.asarray(np.concatenate(
        [np.array([[0, 1, 2]], np.int32), np.asarray(faces_small) + 3]))
    res = (128, 128)  # force the big tri past the bin window

    g_scan = jax.grad(lambda p: loss_fn(p, faces, res, "scan"))(pos)
    g_pallas = jax.grad(
        lambda p: loss_fn(p, faces, res, "pallas", True))(pos)
    # the big triangle's vertices must receive matching gradients
    np.testing.assert_allclose(np.asarray(g_pallas)[:3],
                               np.asarray(g_scan)[:3], rtol=5e-3, atol=5e-3)


def test_fused_uv_interpolation_matches_composed(rng):
    """rasterize_with_uv (fused) == rasterize + interpolate, values+grads."""
    from fpc_diffrend_tpu.ops.interpolate import interpolate

    pos, faces = random_scene(rng, n_tris=20)
    uv = jnp.asarray(rng.uniform(size=(60, 2)).astype(np.float32))
    uv_idx = faces
    res = (64, 64)

    rast_c = r.rasterize(pos, faces, res, impl="scan", with_db=False)
    texc_c, _ = interpolate(uv, rast_c, uv_idx)
    rast_f, texc_f = r.rasterize_with_uv(pos, faces, uv, uv_idx, res,
                                         impl="pallas", interpret=True)
    agree = np.asarray(rast_c[..., 3]) == np.asarray(rast_f[..., 3])
    assert agree.mean() > 0.998
    np.testing.assert_allclose(np.asarray(texc_f)[agree],
                               np.asarray(texc_c)[agree], atol=2e-4)

    gimg = jnp.asarray(rng.normal(size=res + (2,)).astype(np.float32))

    def loss_c(p, u):
        rast = r.rasterize(p, faces, res, impl="scan", with_db=False)
        texc, _ = interpolate(u, rast, uv_idx)
        return jnp.sum(texc * gimg)

    def loss_f(p, u):
        _, texc = r.rasterize_with_uv(p, faces, u, uv_idx, res,
                                      impl="pallas", interpret=True)
        return jnp.sum(texc * gimg)

    gp_c, gu_c = jax.grad(loss_c, argnums=(0, 1))(pos, uv)
    gp_f, gu_f = jax.grad(loss_f, argnums=(0, 1))(pos, uv)
    np.testing.assert_allclose(np.asarray(gu_f), np.asarray(gu_c),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_c),
                               rtol=3e-3, atol=3e-3)


def test_gather_fold_matches_segment_fold(rng, monkeypatch):
    """FPC_FOLD_IMPL=gather (inverse-permutation gather + reshape-sum)
    must produce the same per-triangle gradients as the default
    segment-sum fold (different reduction order -> allclose)."""
    pos, faces = random_scene(rng, n_tris=25)
    res = (64, 64)

    g_seg = jax.grad(lambda p: loss_fn(p, faces, res, "pallas", True))(pos)
    jax.clear_caches()   # env is read at trace time; drop cached jits
    monkeypatch.setenv("FPC_FOLD_IMPL", "gather")
    g_gat = jax.grad(lambda p: loss_fn(p, faces, res, "pallas", True))(pos)
    jax.clear_caches()

    np.testing.assert_allclose(np.asarray(g_gat), np.asarray(g_seg),
                               rtol=1e-5, atol=1e-6)


def test_banded_fold_matches_segment_fold(rng, monkeypatch):
    """FPC_FOLD_IMPL=banded (sliding-window Pallas fold) must produce the
    same per-triangle gradients as the segment-sum fold."""
    pos, faces = random_scene(rng, n_tris=25)
    res = (64, 64)

    g_seg = jax.grad(lambda p: loss_fn(p, faces, res, "pallas", True))(pos)
    jax.clear_caches()
    monkeypatch.setenv("FPC_FOLD_IMPL", "banded")
    g_band = jax.grad(lambda p: loss_fn(p, faces, res, "pallas", True))(pos)
    jax.clear_caches()

    np.testing.assert_allclose(np.asarray(g_band), np.asarray(g_seg),
                               rtol=1e-5, atol=1e-6)


def test_banded_fold_unit(rng, monkeypatch):
    """Direct banded_fold vs segment_sum on synthetic banded ids,
    including dead entries, band drift and a multi-window sweep."""
    from fpc_diffrend_tpu.ops.pallas import raster_grad_tpu as rg

    T, P = 700, 1024
    n_live = 900
    # band-limited ids: ascending bands with local oscillation
    base = np.linspace(0, T - 60, P).astype(np.int32)
    ids = np.clip(base + rng.integers(0, 50, size=P), 0, T - 1)
    ids = np.sort(ids)[::1].astype(np.int32)
    grads = rng.normal(size=(rg.REC, P)).astype(np.float32)

    import jax.numpy as jnp

    out, ovf = rg.banded_fold(jnp.asarray(grads), jnp.asarray(ids),
                              jnp.int32(n_live), P, T, interpret=True)
    assert int(ovf) == 0

    live = np.arange(P) < n_live
    expect = np.zeros((T, rg.REC), np.float32)
    np.add.at(expect, ids[live], grads.T[live])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5,
                               atol=1e-5)


def test_banded_fold_unit_many_chunks(rng):
    """Banded fold across many chunks with window slides, band
    oscillation and a dead tail (the headline workload's structure)."""
    from fpc_diffrend_tpu.ops.pallas import raster_grad_tpu as rg

    T, P = 5000, 16384
    n_live = 14000
    base = np.linspace(0, T - 300, n_live).astype(np.int32)
    ids_live = np.sort(np.clip(base + rng.integers(0, 280, size=n_live),
                               0, T - 1)).astype(np.int32)
    ids = np.concatenate([ids_live,
                          rng.integers(0, T, size=P - n_live)
                          .astype(np.int32)])
    grads = rng.normal(size=(rg.REC, P)).astype(np.float32)

    out, ovf = rg.banded_fold(jnp.asarray(grads), jnp.asarray(ids),
                              jnp.int32(n_live), P, T, interpret=True)
    assert int(ovf) == 0

    live = np.arange(P) < n_live
    expect = np.zeros((T, rg.REC), np.float32)
    np.add.at(expect, ids[live], grads.T[live])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4,
                               atol=2e-4)


def test_banded_fold_reverse_descending_bands(rng):
    """banded_fold(reverse=True) handles DESCENDING id bands (the GL
    y-flip case) exactly; forward mode would overflow on the same data."""
    from fpc_diffrend_tpu.ops.pallas import raster_grad_tpu as rg

    T, P = 5000, 8192
    n_live = 7000
    base = np.linspace(T - 300, 0, n_live).astype(np.int32)   # descending
    ids_live = np.clip(base + rng.integers(0, 280, size=n_live),
                       0, T - 1).astype(np.int32)
    ids = np.concatenate([ids_live, np.zeros(P - n_live, np.int32)])
    grads = rng.normal(size=(rg.REC, P)).astype(np.float32)

    out, ovf = rg.banded_fold(jnp.asarray(grads), jnp.asarray(ids),
                              jnp.int32(n_live), P, T, interpret=True,
                              reverse=True)
    assert int(ovf) == 0

    live = np.arange(P) < n_live
    expect = np.zeros((T, rg.REC), np.float32)
    np.add.at(expect, ids[live], grads.T[live])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4,
                               atol=2e-4)

    # sanity: the band-excess measure agrees about direction
    exc_f = int(rg.fold_band_excess(jnp.asarray(ids), jnp.int32(n_live),
                                    P, T, reverse=False))
    exc_r = int(rg.fold_band_excess(jnp.asarray(ids), jnp.int32(n_live),
                                    P, T, reverse=True))
    assert exc_r <= 0 < exc_f

"""Stacked-batch pipeline (FPC_BATCH=stack) parity vs the vmapped path.

The stacked path renders B samples as one vertically stacked virtual
image through single passes of the fused rasterize+texture, antialias,
gradient and texture-backward kernels (rasterize_tpu.bin_scene_stacked).
These tests pin it against the per-sample sepaa pipeline — forward
images AND the full gradient set (clip positions incl. the y-shift
chain rule, texture incl. the cross-batch gtex accumulation).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

# interpret-mode Pallas kernel tests (round-4 VERDICT #8 split): the
# stacked pipeline is CPU-testable only through the interpreter
pytestmark = pytest.mark.slow

from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import pad_resolution
from fpc_diffrend_tpu.ops.rasterize import (
    _rasterize_pallas_textured_sepaa, rasterize_pallas_textured_sepaa_stacked)

RES = (40, 128)          # ph = 40 (5 tile rows), pw = 128 (1 tile col)


def _scene(rng, n_quads=6, v_jitter=0.0):
    """A few overlapping quads with distinct depths + uvs."""
    verts, faces, uvs = [], [], []
    for q in range(n_quads):
        cx = rng.uniform(-0.6, 0.6)
        cy = rng.uniform(-0.6, 0.6)
        z = -0.8 + 0.25 * q
        s = rng.uniform(0.25, 0.55)
        base = len(verts)
        verts += [[cx - s, cy - s, z], [cx + s, cy - s, z + 0.05],
                  [cx + s, cy + s, z], [cx - s, cy + s, z - 0.05]]
        u0, v0 = rng.uniform(0.05, 0.6, 2)
        uvs += [[u0, v0], [u0 + 0.3, v0], [u0 + 0.3, v0 + 0.3],
                [u0, v0 + 0.3]]
        faces += [[base, base + 1, base + 2], [base, base + 2, base + 3]]
    verts = np.asarray(verts, np.float32)
    verts += rng.normal(scale=v_jitter, size=verts.shape).astype(np.float32)
    return (jnp.asarray(verts), jnp.asarray(np.asarray(faces, np.int32)),
            jnp.asarray(np.asarray(uvs, np.float32)))


def _clip_batch(verts, rng, B):
    """(B, V, 4) clip positions: per-sample small rigid jitters, w = 1
    + per-vertex noise so perspective weights differ."""
    out = []
    for b in range(B):
        off = rng.normal(scale=0.08, size=(1, 3)).astype(np.float32)
        w = 1.0 + 0.1 * rng.uniform(size=(verts.shape[0], 1)).astype(
            np.float32)
        xyz = (np.asarray(verts) + off) * w
        out.append(np.concatenate([xyz, w], axis=1))
    return jnp.asarray(np.stack(out))


def _tex(rng):
    return jnp.asarray(rng.uniform(size=(64, 64, 1)).astype(np.float32))


def _neighbors(faces):
    from fpc_diffrend_tpu.data.obj import build_topology

    n_v = int(jnp.max(faces)) + 1
    return jnp.asarray(build_topology(np.asarray(faces), n_v).face_neighbors)


def _per_sample(pos_clip_b, faces, uv, uv_idx, tex, fn):
    outs = []
    for b in range(pos_clip_b.shape[0]):
        idbuf, aa = _rasterize_pallas_textured_sepaa(
            pos_clip_b[b], faces, uv, uv_idx, tex, fn, RES,
            pair_cap=None, interpret=True)
        outs.append((idbuf, aa))
    return outs


def test_stacked_single_sample(rng):
    """B=1 degenerate case (the reference-style batch-1 fits run through
    the same stacked path on TPU)."""
    verts, faces, uv = _scene(rng, n_quads=4)
    fn = _neighbors(faces)
    pos_clip_b = _clip_batch(verts, rng, 1)
    tex = _tex(rng)
    idbuf_s, aa_s = rasterize_pallas_textured_sepaa_stacked(
        pos_clip_b, faces, uv, faces, tex, fn, RES, pair_cap=None,
        interpret=True)
    idbuf_r, aa_r = _per_sample(pos_clip_b, faces, uv, faces, tex, fn)[0]
    np.testing.assert_array_equal(np.asarray(idbuf_s), np.asarray(idbuf_r))
    np.testing.assert_allclose(np.asarray(aa_s), np.asarray(aa_r),
                               atol=1e-5)


def test_stacked_forward_matches_per_sample(rng):
    B = 3
    verts, faces, uv = _scene(rng)
    fn = _neighbors(faces)
    pos_clip_b = _clip_batch(verts, rng, B)
    tex = _tex(rng)

    idbuf_s, aa_s = rasterize_pallas_textured_sepaa_stacked(
        pos_clip_b, faces, uv, faces, tex, fn, RES, pair_cap=None,
        interpret=True)
    ph, pw = pad_resolution(*RES)
    ref = _per_sample(pos_clip_b, faces, uv, faces, tex, fn)
    for b in range(B):
        idbuf_r, aa_r = ref[b]
        np.testing.assert_array_equal(
            np.asarray(idbuf_s[b * ph:(b + 1) * ph]), np.asarray(idbuf_r))
        np.testing.assert_allclose(
            np.asarray(aa_s[:, b * ph:(b + 1) * ph]), np.asarray(aa_r),
            atol=1e-5)


def test_stacked_gradients_match_per_sample(rng):
    B = 2
    verts, faces, uv = _scene(rng, n_quads=4)
    fn = _neighbors(faces)
    pos_clip_b = _clip_batch(verts, rng, B)
    tex = _tex(rng)
    h, w = RES
    gimg = jnp.asarray(rng.normal(size=(B, h, w)).astype(np.float32))
    ph, pw = pad_resolution(*RES)

    def loss_stacked(pos_clip_b, tex):
        _, aa = rasterize_pallas_textured_sepaa_stacked(
            pos_clip_b, faces, uv, faces, tex, fn, RES, pair_cap=None,
            interpret=True)
        img = aa.reshape(aa.shape[0], B, ph, pw)[0, :, :h, :w]
        return jnp.sum(img * gimg)

    def loss_ref(pos_clip_b, tex):
        total = 0.0
        for b in range(B):
            _, aa = _rasterize_pallas_textured_sepaa(
                pos_clip_b[b], faces, uv, faces, tex, fn, RES,
                pair_cap=None, interpret=True)
            total = total + jnp.sum(aa[0, :h, :w] * gimg[b])
        return total

    gs_pos, gs_tex = jax.grad(loss_stacked, argnums=(0, 1))(pos_clip_b, tex)
    gr_pos, gr_tex = jax.grad(loss_ref, argnums=(0, 1))(pos_clip_b, tex)
    np.testing.assert_allclose(np.asarray(gs_pos), np.asarray(gr_pos),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gs_tex), np.asarray(gr_tex),
                               atol=2e-4, rtol=1e-4)


def test_stacked_render_batch_and_loop_path(rng, monkeypatch):
    """render_batch_stacked composite/slicing + the fit-loop dispatch
    (FPC_BATCH=stack picks the stacked path and matches vmapped render)."""
    from fpc_diffrend_tpu.ops.pipeline import (render_batch_stacked,
                                               stacked_batch_eligible)

    B = 2
    verts, faces, uv = _scene(rng, n_quads=4)
    fn = _neighbors(faces)
    pos_clip_b = _clip_batch(verts, rng, B)
    tex = _tex(rng)
    h, w = RES

    imgs = render_batch_stacked(pos_clip_b, faces, uv, faces, tex, RES,
                                fn, interpret=True)
    assert imgs.shape == (B, h, w, 1)
    ref = _per_sample(pos_clip_b, faces, uv, faces, tex, fn)
    for b in range(B):
        idbuf_r, aa_r = ref[b]
        want = jnp.where(idbuf_r >= 0, aa_r, 45.0 / 255.0)[0, :h, :w]
        np.testing.assert_allclose(np.asarray(imgs[b, ..., 0]),
                                   np.asarray(want), atol=1e-5)

    # eligibility gate: pallas+resident+nomip only
    assert not stacked_batch_eligible((8, 8), (64, 64, 1), True, "pallas")
    assert not stacked_batch_eligible((8, 8), (64, 64, 1), False, "scan")
    assert stacked_batch_eligible((8, 8), (64, 64, 1), False, "pallas")


def test_fit_loop_stacked_matches_scan(rng, monkeypatch):
    """FPC_BATCH=stack through the REAL fit loop: loss_fn value + grads
    on a tiny scene match the scan-impl reference path."""
    from tests._tiny_scene import make_batch, make_setup

    scene, config, params = make_setup()
    batch = make_batch(config, scene, params)
    from fpc_diffrend_tpu.fit import loop as fit_loop

    loss_scan, _ = fit_loop.loss_fn(params, config, scene, batch, 0)
    g_scan = jax.grad(lambda p: fit_loop.loss_fn(p, config, scene,
                                                 batch, 0)[0])(params)

    import dataclasses

    config_pl = dataclasses.replace(config, raster_impl="pallas")
    monkeypatch.setenv("FPC_BATCH", "stack")
    monkeypatch.setenv("FPC_INTERPRET", "1")
    loss_st, _ = fit_loop.loss_fn(params, config_pl, scene, batch, 0)
    g_st = jax.grad(lambda p: fit_loop.loss_fn(p, config_pl, scene,
                                               batch, 0)[0])(params)

    np.testing.assert_allclose(float(loss_st), float(loss_scan), rtol=2e-3)
    for k in g_scan:
        a = np.asarray(g_st[k])
        b = np.asarray(g_scan[k])
        if k == "tex":
            # scan-vs-pallas texture gradients differ at exact texel
            # centers (hat subgradient vs lerp branch — see
            # test_texture_pallas) and through the scan path's CAPPED
            # antialias vs the exact payload AA; exact stacked-vs-pallas
            # parity is pinned by test_stacked_gradients_match_per_sample.
            # Here assert the aggregate gradient agrees.
            scale = np.abs(b).mean() + 1e-12
            assert np.abs(a - b).mean() / scale < 0.05, k
            continue
        np.testing.assert_allclose(a, b, atol=2e-2, rtol=2e-2, err_msg=k)


def test_gx_padding_matches_default(rng, monkeypatch):
    """FPC_GX (tile-column padding for mt amortization at prime gx)
    changes no rendered value or gradient — pad tiles stay empty."""
    import fpc_diffrend_tpu.ops.pallas.rasterize_tpu as rt

    verts, faces, uv = _scene(rng, n_quads=4)
    fn = _neighbors(faces)
    pos_clip = _clip_batch(verts, rng, 1)[0]
    tex = _tex(rng)
    h, w = RES
    gimg = jnp.asarray(rng.normal(size=(h, w)).astype(np.float32))

    def loss(pos_clip, tex):
        idbuf, aa = _rasterize_pallas_textured_sepaa(
            pos_clip, faces, uv, faces, tex, fn, RES, pair_cap=None,
            interpret=True)
        return jnp.sum(aa[0, :h, :w] * gimg), (idbuf, aa)

    (l0, (id0, aa0)), g0 = jax.value_and_grad(loss, argnums=(0, 1),
                                              has_aux=True)(pos_clip, tex)
    monkeypatch.setattr(rt, "_GX_MIN", 2)        # pw 128 -> 256
    (l1, (id1, aa1)), g1 = jax.value_and_grad(loss, argnums=(0, 1),
                                              has_aux=True)(pos_clip, tex)
    assert id1.shape[1] == 256 and id0.shape[1] == 128
    np.testing.assert_array_equal(np.asarray(id1[:, :128]),
                                  np.asarray(id0))
    np.testing.assert_allclose(np.asarray(aa1[:, :, :128]),
                               np.asarray(aa0), atol=1e-6)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_phaseb_skip_bit_identical(rng, monkeypatch):
    """FPC_PHASEB_SKIP gates phase-B chunks on the winner-entry range —
    output must be BIT-identical (forward and gradients)."""
    import fpc_diffrend_tpu.ops.pallas.rasterize_tpu as rt

    verts, faces, uv = _scene(rng)
    fn = _neighbors(faces)
    pos_clip = _clip_batch(verts, rng, 1)[0]
    tex = _tex(rng)
    h, w = RES
    gimg = jnp.asarray(rng.normal(size=(h, w)).astype(np.float32))

    def loss(pos_clip, tex):
        idbuf, aa = _rasterize_pallas_textured_sepaa(
            pos_clip, faces, uv, faces, tex, fn, RES, pair_cap=None,
            interpret=True)
        return jnp.sum(aa[0, :h, :w] * gimg), (idbuf, aa)

    (l0, (id0, aa0)), g0 = jax.value_and_grad(loss, argnums=(0, 1),
                                              has_aux=True)(pos_clip, tex)
    monkeypatch.setattr(rt, "_PHASEB_SKIP", True)
    (l1, (id1, aa1)), g1 = jax.value_and_grad(loss, argnums=(0, 1),
                                              has_aux=True)(pos_clip, tex)
    np.testing.assert_array_equal(np.asarray(id1), np.asarray(id0))
    np.testing.assert_array_equal(np.asarray(aa1), np.asarray(aa0))
    for a, b in zip(g1, g0):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fwd_splits2_error_bounded(rng, monkeypatch):
    """FPC_FWD_SPLITS=2 (hi+mid bf16 record gather) keeps the rendered
    values within the documented ~2^-17 relative bound; winner ids stay
    bit-identical (selection happens in phase A)."""
    import fpc_diffrend_tpu.ops.pallas.rasterize_tpu as rt

    verts, faces, uv = _scene(rng)
    fn = _neighbors(faces)
    pos_clip = _clip_batch(verts, rng, 1)[0]
    tex = _tex(rng)

    id0, aa0 = _rasterize_pallas_textured_sepaa(
        pos_clip, faces, uv, faces, tex, fn, RES, pair_cap=None,
        interpret=True)
    monkeypatch.setattr(rt, "_FWD_SPLITS", 2)
    id1, aa1 = _rasterize_pallas_textured_sepaa(
        pos_clip, faces, uv, faces, tex, fn, RES, pair_cap=None,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(id1), np.asarray(id0))
    d = np.abs(np.asarray(aa1) - np.asarray(aa0))
    assert d.max() > 0.0                 # the knob engaged
    assert d.max() < 5e-3                # colour error bound ([0,1] scale)


def test_stacked_binning_invariants(rng):
    """bin_scene_stacked: one live prefix, per-sample ids, record shift."""
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
        aux_records, bin_scene, bin_scene_stacked)

    B = 2
    verts, faces, uv = _scene(rng)
    pos_clip_b = _clip_batch(verts, rng, B)
    h, w = RES
    T = faces.shape[0]
    aux_b = jax.vmap(lambda pc: aux_records(uv, faces, pc, faces, None,
                                            h, w))(pos_clip_b)
    data_s, aux_s, bins = bin_scene_stacked(pos_clip_b, faces, h, w, aux_b)

    n_live = int(bins.bin_start[-1])
    tri = np.asarray(bins.sorted_tri)
    # live prefix: all live ids valid, all dead are the sentinel
    assert (tri[:n_live] < B * T).all()
    assert (tri[n_live:] == B * T).all()
    # per-sample pair counts match the per-sample binning
    for b in range(B):
        _, bins_b = bin_scene(pos_clip_b[b], faces, h, w,
                              aux=aux_b[b])
        live_b = int(bins_b.bin_start[-1])
        got = int(((tri[:n_live] >= b * T)
                   & (tri[:n_live] < (b + 1) * T)).sum())
        assert got == live_b
    # the shifted records evaluate identically at shifted y: spot-check
    # plane 0 of sample 1 at its stacked rows
    ph, pw = pad_resolution(h, w)
    d1 = np.asarray(data_s[1])
    d1_local = np.asarray(jax.vmap(
        lambda pc: __import__(
            "fpc_diffrend_tpu.ops.pallas.rasterize_tpu",
            fromlist=["triangle_setup"]).triangle_setup(
                pc, faces, h, w)[0])(pos_clip_b)[1])
    x, y_local = 13.5, 7.5
    lam_local = d1_local[:, 0] * x + d1_local[:, 1] * y_local + d1_local[:, 2]
    lam_glob = d1[:, 0] * x + d1[:, 1] * (y_local + ph) + d1[:, 2]
    np.testing.assert_allclose(lam_glob, lam_local, rtol=1e-4, atol=1e-2)

"""Pallas visibility kernel parity vs. the XLA scan reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fpc_diffrend_tpu.ops.rasterize as r
from fpc_diffrend_tpu.ops.pallas import rasterize_tpu as rp


# interpret-mode Pallas kernel tests dominate suite runtime (round-4
# VERDICT #8): run with `pytest -m slow`; the default fast set keeps
# scan-path parity + golden coverage for every kernel.
pytestmark = pytest.mark.slow


def random_scene(rng, n_tris=40, depth_spread=True):
    v = rng.uniform(-1.1, 1.1, size=(n_tris * 3, 2)).astype(np.float32)
    z = (rng.uniform(-0.8, 0.8, size=(n_tris * 3, 1)).astype(np.float32)
         if depth_spread else np.zeros((n_tris * 3, 1), np.float32))
    w = np.ones((n_tris * 3, 1), np.float32)
    pos = np.concatenate([v, z, w], axis=1)
    faces = np.arange(n_tris * 3, dtype=np.int32).reshape(n_tris, 3)
    return jnp.asarray(pos), jnp.asarray(faces)


@pytest.mark.parametrize("res", [(64, 64), (96, 160), (50, 70)])
def test_pallas_matches_scan(rng, res):
    pos, faces = random_scene(rng, n_tris=40)
    H, W = res
    ids_scan = np.asarray(r.visibility_scan(pos, faces, H, W))
    ids_pl = np.asarray(rp.visibility_pallas(pos, faces, H, W, interpret=True))
    mismatch = (ids_scan != ids_pl)
    # Allow a tiny fraction of edge-pixel disagreements from float
    # associativity differences between the two formulations.
    assert mismatch.mean() < 0.002, (
        f"{mismatch.sum()} mismatched pixels of {mismatch.size}")


def test_pallas_depth_order(rng):
    # two stacked quads: near must win
    def quad(z, scale, base):
        pos = np.array([
            [-scale, -scale, z, 1], [scale, -scale, z, 1],
            [scale, scale, z, 1], [-scale, scale, z, 1]], np.float32)
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32) + base
        return pos, faces

    p1, f1 = quad(-0.5, 0.4, 0)
    p2, f2 = quad(0.5, 0.9, 4)
    pos = jnp.asarray(np.concatenate([p1, p2]))
    faces = jnp.asarray(np.concatenate([f1, f2]))
    ids = np.asarray(rp.visibility_pallas(pos, faces, 64, 64, interpret=True))
    assert ids[32, 32] in (0, 1)
    assert ids[32, 5] in (2, 3)
    assert ids[2, 2] == -1


def test_pallas_oversized_triangle_global_list(rng):
    """A screen-filling triangle exceeds the 3x3 tile window -> global list."""
    big = np.array([
        [-8, -8, 0.0, 1], [8, -8, 0.0, 1], [0, 8, 0.0, 1]], np.float32)
    pos_small, faces_small = random_scene(rng, n_tris=10)
    pos = jnp.asarray(np.concatenate([big, np.asarray(pos_small)]))
    faces = jnp.asarray(np.concatenate(
        [np.array([[0, 1, 2]], np.int32), np.asarray(faces_small) + 3]))
    H = W = 128  # 4x4 tiles -> the big triangle cannot fit the 3x3 window
    ids = np.asarray(rp.visibility_pallas(pos, faces, H, W, interpret=True))
    ids_ref = np.asarray(r.visibility_scan(pos, faces, H, W))
    assert (ids != ids_ref).mean() < 0.002
    assert (ids == 0).any()  # the big triangle is visible somewhere


def test_pallas_empty_scene():
    pos = jnp.zeros((3, 4), jnp.float32).at[:, 3].set(1.0)
    faces = jnp.asarray(np.array([[0, 1, 2]], np.int32))
    ids = np.asarray(rp.visibility_pallas(pos, faces, 32, 32, interpret=True))
    assert (ids == -1).all()


def test_rasterize_public_api_with_pallas_impl(rng):
    pos, faces = random_scene(rng, n_tris=25)
    rast_scan, _ = r.rasterize(pos, faces, (64, 64), impl="scan")
    # route the pallas interpret path through the public API
    idbuf = rp.visibility_pallas(pos, faces, 64, 64, interpret=True)
    u, v, z, mask = r.pixel_attributes(pos, faces, idbuf, 64, 64)
    agree = np.asarray(mask) == (np.asarray(rast_scan[..., 3]) > 0)
    assert agree.mean() > 0.998


def test_raster_stats(rng):
    pos, faces = random_scene(rng, n_tris=20)
    stats = rp.raster_stats(pos, faces, 64, 64)
    assert int(stats["global_overflow"]) == 0
    assert int(stats["n_valid_pairs"]) > 0
    # a screen-filling triangle lands in the global list
    import numpy as np
    big = jnp.asarray(np.array(
        [[-8, -8, 0, 1], [8, -8, 0, 1], [0, 8, 0, 1]], np.float32))
    pos2 = jnp.concatenate([big, pos])
    faces2 = jnp.concatenate(
        [jnp.asarray(np.array([[0, 1, 2]], np.int32)), faces + 3])
    stats2 = rp.raster_stats(pos2, faces2, 256, 256)
    assert int(stats2["n_global"]) >= 1
    # the screen-filling triangle dominates the bbox extrema
    assert int(stats2["wy_max"]) > int(stats["wy_max"])
    assert int(stats2["wx_max"]) >= 2


def test_raster_stats_window_arg(rng):
    """Explicit window args key the jit cache (window autotune safety)."""
    pos, faces = random_scene(rng, n_tris=30)
    base = rp.raster_stats(pos, faces, 128, 128)
    wide = rp.raster_stats(pos, faces, 128, 128, window_y=8, window_x=2)
    narrow = rp.raster_stats(pos, faces, 128, 128, window_y=1, window_x=1)
    # a wider window only moves triangles global -> binned
    assert int(wide["n_global"]) <= int(base["n_global"])
    assert int(wide["n_valid_pairs"]) >= int(base["n_valid_pairs"])
    assert int(narrow["n_global"]) >= int(base["n_global"])
    # bbox extrema are window-independent
    assert int(narrow["wy_max"]) == int(base["wy_max"])


def test_corner_gather_vjp_matches_scatter(rng):
    """corner_gather's gather-based backward == XLA's scatter-add
    backward of x[idx], on the full triangle_setup + aux_records chain."""
    from fpc_diffrend_tpu.data.obj import corner_incidence

    pos, faces = random_scene(rng, n_tris=25)
    V = pos.shape[0]
    uv = jnp.asarray(rng.uniform(size=(V, 2)).astype(np.float32))
    uv_idx = faces
    vtx_inc = tuple(map(jnp.asarray, corner_incidence(np.asarray(faces), V)))
    uv_inc = vtx_inc

    # direct op: value + vjp equality
    x = jnp.asarray(rng.normal(size=(V, 4)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(faces.shape[0], 3, 4)
                                ).astype(np.float32))
    y_ref, vjp_ref = jax.vjp(lambda q: q[faces], x)
    y_new, vjp_new = jax.vjp(
        lambda q: rp.corner_gather(q, faces, *vtx_inc), x)
    assert np.array_equal(np.asarray(y_ref), np.asarray(y_new))
    np.testing.assert_allclose(np.asarray(vjp_ref(ct)[0]),
                               np.asarray(vjp_new(ct)[0]), rtol=1e-6,
                               atol=1e-6)

    # full setup/aux chain: grads w.r.t. pos_clip and uv
    def loss(pc, uvq, inc):
        data, _, _ = rp.triangle_setup(pc, faces, 64, 64,
                                       vtx_inc=inc and inc[0])
        aux = rp.aux_records(uvq, uv_idx, pc, faces, None, 64, 64,
                             vtx_inc=inc and inc[0], uv_inc=inc and inc[1])
        return jnp.sum(jnp.sin(data)) + jnp.sum(jnp.cos(aux))

    g_ref = jax.grad(loss, argnums=(0, 1))(pos, uv, None)
    g_new = jax.grad(loss, argnums=(0, 1))(pos, uv, (vtx_inc, uv_inc))
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_window_y_shrink_binning_parity(rng):
    """Binning with a smaller WINDOW_Y renders identically: triangles
    that fit keep the same bins, the rest go to the global list."""
    import fpc_diffrend_tpu.ops.pallas.rasterize_tpu as rt

    pos, faces = random_scene(rng, n_tris=40)
    ref = rp.visibility_pallas(pos, faces, 64, 64, interpret=True)
    old = rt.WINDOW_Y
    try:
        rt.WINDOW_Y = 2
        got = jax.jit(
            lambda p, f: rp.visibility_from_bins(
                rp.bin_scene(p, f, 64, 64)[1], 64, 64, interpret=True)
        )(pos, faces)
    finally:
        rt.WINDOW_Y = old
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_tiles_per_program_divides_and_overrides(monkeypatch):
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import tiles_per_program

    for gx in (1, 2, 3, 5, 7, 10, 12, 16):
        for kind in ("fwd", "grad", "tex"):
            mt = tiles_per_program(gx, kind)
            assert gx % mt == 0
    assert tiles_per_program(16, "fwd") == 1      # measured optimum
    assert tiles_per_program(16, "grad") == 8
    monkeypatch.setenv("FPC_MT_GRAD", "4")
    assert tiles_per_program(16, "grad") == 4
    monkeypatch.setenv("FPC_MT_GRAD", "3")        # doesn't divide 16 -> 2
    assert tiles_per_program(16, "grad") == 2


def test_place_rank_matches_sort():
    import numpy as np
    from fpc_diffrend_tpu.ops.pallas import rasterize_tpu as rt

    rng = np.random.default_rng(3)
    T, K, n_tiles = 533, 8, 60
    # each triangle covers K DISTINCT tiles (window slots are distinct);
    # some slots invalid (sentinel n_tiles)
    tile_ids = np.empty((T, K), np.int32)
    for t in range(T):
        picks = rng.choice(n_tiles, size=K, replace=False)
        n_live = rng.integers(0, K + 1)
        picks[n_live:] = n_tiles
        tile_ids[t] = picks
    tid = jnp.asarray(tile_ids)

    live = int((tile_ids < n_tiles).sum())
    for P in (T * K, 128, ((live // 2) // 128) * 128 or 128):
        tri_s, bs_s, inv = rt._place_sort(tid, T, n_tiles, P, want_inv=True)
        tri_r, bs_r = rt._place_rank(tid, T, n_tiles, P)
        np.testing.assert_array_equal(np.asarray(bs_s), np.asarray(bs_r))
        n_live = int(np.asarray(bs_s)[-1])
        np.testing.assert_array_equal(np.asarray(tri_s)[:n_live],
                                      np.asarray(tri_r)[:n_live])

        tri_p, bs_p = rt._place_pallas(tid, T, n_tiles, P, interpret=True)
        np.testing.assert_array_equal(np.asarray(bs_s), np.asarray(bs_p))
        np.testing.assert_array_equal(np.asarray(tri_s)[:n_live],
                                      np.asarray(tri_p)[:n_live])

        # the inverse permutation: every kept (tri, slot) pair's position
        # must map back to that triangle; invalid pairs (sentinel tile)
        # sort past the live prefix and cap-dropped pairs sit at P — the
        # gather fold masks both with pos < n_live
        inv_np = np.asarray(inv)
        tri_np = np.asarray(tri_s)
        for t in range(0, T, 37):
            for k in range(K):
                p = int(inv_np[t, k])
                if tile_ids[t, k] >= n_tiles:
                    assert p >= n_live
                elif p < n_live:
                    assert tri_np[p] == t

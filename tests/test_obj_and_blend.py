"""OBJ parsing, topology and blendshape model tests."""

import numpy as np
import jax.numpy as jnp

from fpc_diffrend_tpu.data import obj as objlib
from fpc_diffrend_tpu.models import blendshape


OBJ_TEXT = """\
# simple quad of two triangles
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 1.0 1.0 0.0
v 0.0 1.0 0.0
vt 0.0 0.0
vt 1.0 0.0
vt 1.0 1.0
vt 0.0 1.0
f 1/1 2/2 3/3
f 1/1 3/3 4/4
"""


def _write_obj(tmp_path, text=OBJ_TEXT, name="quad.obj"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_load_obj(tmp_path):
    mesh = objlib.load_obj(_write_obj(tmp_path))
    assert mesh.vertices.shape == (12,)
    assert mesh.verts3.shape == (4, 3)
    assert mesh.uv.shape == (4, 2)
    np.testing.assert_array_equal(mesh.faces, [[0, 1, 2], [0, 2, 3]])
    np.testing.assert_array_equal(mesh.fuv, [[0, 1, 2], [0, 2, 3]])


def test_load_obj_vertices_fast_path(tmp_path):
    path = _write_obj(tmp_path)
    v = objlib.load_obj_vertices(path)
    full = objlib.load_obj(path)
    np.testing.assert_allclose(v, full.vertices)


def test_save_load_roundtrip(tmp_path):
    mesh = objlib.load_obj(_write_obj(tmp_path))
    out = str(tmp_path / "rt.obj")
    objlib.save_obj(out, mesh.verts3, mesh.uv, mesh.faces, mesh.fuv)
    back = objlib.load_obj(out)
    np.testing.assert_allclose(back.vertices, mesh.vertices)
    np.testing.assert_array_equal(back.faces, mesh.faces)


def test_topology_quad(tmp_path):
    mesh = objlib.load_obj(_write_obj(tmp_path))
    topo = objlib.build_topology(mesh.faces, mesh.n_vertices)
    assert topo.edges.shape == (5, 2)          # 4 boundary + 1 diagonal
    assert topo.edge_face_pairs.shape == (1, 2)  # diagonal shared by 2 faces
    np.testing.assert_array_equal(sorted(topo.edge_face_pairs[0]), [0, 1])
    np.testing.assert_allclose(topo.degree, [3, 2, 3, 2])
    assert topo.neighbor_src.shape == (10,)


def test_blend_prior_matches_onehot_formulation(rng):
    """Index-gather formulation == reference one-hot matmul chain (fit.py:103-122)."""
    V3, B, F = 12, 5, 7
    v_base = rng.normal(size=V3).astype(np.float32)
    deltas = rng.normal(size=(V3, B)).astype(np.float32)
    maps = rng.normal(size=(F, F)).astype(np.float32)
    maps_int = rng.normal(size=(B, F)).astype(np.float32)

    f = 3
    onehot = np.zeros(F, dtype=np.float32)
    onehot[f] = 1.0
    want = v_base + deltas @ (maps_int @ (maps @ onehot))

    got = np.asarray(blendshape.blend_prior(v_base, deltas, maps, maps_int, f))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # batched
    got_b = np.asarray(
        blendshape.blend_prior(v_base, deltas, maps, maps_int, jnp.array([f, 0])))
    assert got_b.shape == (2, V3)
    np.testing.assert_allclose(got_b[0], want, rtol=1e-5)


def test_blend_free_matches_onehot(rng):
    V3, F = 9, 4
    v_base = rng.normal(size=V3).astype(np.float32)
    m1 = rng.normal(size=(F, F)).astype(np.float32)
    m2 = rng.normal(size=(F, F)).astype(np.float32)
    m3 = rng.normal(size=(V3, F)).astype(np.float32)
    f = 2
    onehot = np.zeros(F, dtype=np.float32)
    onehot[f] = 1.0
    want = v_base + m3 @ (m2 @ (m1 @ onehot))
    got = np.asarray(blendshape.blend_free(v_base, m1, m2, m3, f))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_blend_combined(rng):
    V3, B, F = 9, 3, 4
    v_base = rng.normal(size=V3).astype(np.float32)
    deltas = rng.normal(size=(V3, B)).astype(np.float32)
    maps = rng.normal(size=(F, F)).astype(np.float32)
    maps_int = rng.normal(size=(B, F)).astype(np.float32)
    m1, m2, m3 = (np.eye(F, dtype=np.float32), np.eye(F, dtype=np.float32),
                  rng.normal(size=(V3, F)).astype(np.float32))
    f = 1
    onehot = np.zeros(F, dtype=np.float32)
    onehot[f] = 1.0
    want = (v_base + deltas @ (maps_int @ (maps @ onehot))
            + 0.5 * (m3 @ (m2 @ (m1 @ onehot))))
    got = np.asarray(blendshape.blend_combined(
        v_base, m1, m2, m3, maps, maps_int, deltas, f, learned_coefficient=0.5))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_setup_dataset_free_shapes():
    m1, m2, m3 = blendshape.setup_dataset_free(6, 30)
    np.testing.assert_array_equal(m1, np.eye(6))
    np.testing.assert_array_equal(m2, np.eye(6))
    assert m3.shape == (30, 6) and not m3.any()


def test_load_blendshape_deltas(tmp_path, rng):
    base = rng.normal(size=(4, 3)).astype(np.float32)
    bl_dir = tmp_path / "bl"
    bl_dir.mkdir()
    offsets = []
    for i in range(3):
        off = rng.normal(size=(4, 3)).astype(np.float32)
        offsets.append(off)
        objlib.save_obj(str(bl_dir / f"bs_{i}.obj"), base + off,
                        np.zeros((4, 2)), np.array([[0, 1, 2]]))
    deltas = blendshape.load_blendshape_deltas(str(bl_dir), base.reshape(-1),
                                               progress_every=0)
    assert deltas.shape == (12, 3)
    for i in range(3):
        np.testing.assert_allclose(deltas[:, i], offsets[i].reshape(-1), atol=1e-5)

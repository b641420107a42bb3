"""Tooling tests: results save/load, checkpoints, SEQ, comparisons, utils."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from fpc_diffrend_tpu.data import obj as objlib, seq as seqlib
from fpc_diffrend_tpu.fit import checkpoint as ckpt_mod
from fpc_diffrend_tpu.fit import results as results_mod
from fpc_diffrend_tpu.fit import state as state_mod
from fpc_diffrend_tpu.fit.config import FitConfig
from fpc_diffrend_tpu.fit.scene import build_scene
from fpc_diffrend_tpu.models import camera
from fpc_diffrend_tpu.tools import batchmodify, comparisons
from fpc_diffrend_tpu.utils import image as img_utils


@pytest.fixture()
def small_setup():
    verts = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                     np.float32)
    mesh = objlib.MeshData(
        vertices=verts.reshape(-1),
        uv=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
        faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        fuv=np.array([[0, 1, 2], [0, 2, 3]], np.int32))
    proj = np.stack([camera.default_projection()])
    mv = np.stack([camera.default_modelview(-30)])
    scene = build_scene(mesh, proj, mv)
    config = FitConfig(max_iter=10, resolution=(16, 16), texshape=(8, 8, 1),
                       mode="free", cam_idxs=(0,), batch_size=2,
                       raster_impl="scan")
    params = state_mod.init_params(config, 3, scene.v_base.shape[0],
                                   scene.deltas.shape[1],
                                   np.full((8, 8, 1), 0.5, np.float32), 1)
    return scene, config, params


def test_save_results_roundtrip(small_setup, tmp_path):
    scene, config, params = small_setup
    out = str(tmp_path / "run")
    d = results_mod.save_results(config, scene, params, n_frames=3,
                                 out_dir=out)
    assert os.path.exists(os.path.join(d, "0.obj"))
    assert os.path.exists(os.path.join(d, "2.obj"))
    assert os.path.exists(os.path.join(d, "texture.png"))
    assert os.path.exists(os.path.join(out, "config.txt"))

    # meshes readable and match the blended output
    back = objlib.load_obj(os.path.join(d, "0.obj"))
    want = results_mod.final_meshes(config, scene, params, 3)[0]
    np.testing.assert_allclose(back.vertices, want, atol=1e-5)
    np.testing.assert_array_equal(back.faces, np.asarray(scene.faces))

    t, q = results_mod.load_pose(d)
    np.testing.assert_allclose(t, np.asarray(params["per_frame_t"]))
    np.testing.assert_allclose(q, np.asarray(params["per_frame_q"]))


def test_checkpoint_roundtrip(small_setup, tmp_path):
    scene, config, params = small_setup
    state = state_mod.init_state(config, params)
    state = state._replace(step=jnp.asarray(7, jnp.int32))
    ckpt_dir = str(tmp_path / "ckpt")
    ckpt_mod.save_checkpoint(ckpt_dir, state)

    fresh = state_mod.init_state(config, {
        k: jnp.zeros_like(v) for k, v in params.items()})
    latest = ckpt_mod.latest_checkpoint(ckpt_dir)
    assert latest and latest.endswith("step_000000007")
    restored = ckpt_mod.restore_checkpoint(latest, fresh)
    assert int(restored.step) == 7
    for k in params:
        np.testing.assert_allclose(np.asarray(restored.params[k]),
                                   np.asarray(params[k]), err_msg=k)


def test_seq_roundtrip(tmp_path):
    frames = (np.arange(3 * 8 * 16, dtype=np.uint8)
              .reshape(3, 8, 16) * 3 % 251)
    path = str(tmp_path / "test.seq")
    seqlib.write_seq(path, frames, frame_rate=24.0)
    r = seqlib.SeqReader(path)
    assert r.header.width == 16 and r.header.height == 8
    assert r.header.n_frames == 3
    assert not r.header.compressed
    assert len(r) == 3
    for i in range(3):
        np.testing.assert_array_equal(r.read_frame(i), frames[i])
    ts = r.timestamps()
    assert ts == [0.0, 1.0, 2.0]
    r.close()

    out = str(tmp_path / "tifs")
    n = seqlib.extract_to_tif(path, out, "cam0", digits=3)
    assert n == 3
    from PIL import Image
    img = np.array(Image.open(os.path.join(out, "cam0_001.tif")))
    np.testing.assert_array_equal(img, frames[1])


def test_seq_rejects_garbage(tmp_path):
    p = tmp_path / "bad.seq"
    p.write_bytes(b"\x00" * 4096)
    with pytest.raises(ValueError):
        seqlib.SeqReader(str(p))


def test_comparisons_numerical(tmp_path):
    from PIL import Image

    inf = tmp_path / "inf"; ref = tmp_path / "ref"; save = tmp_path / "save"
    inf.mkdir(); ref.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        a = rng.integers(0, 255, (20, 20), dtype=np.uint8)
        b = np.clip(a.astype(np.int32) + 10, 0, 255).astype(np.uint8)
        Image.fromarray(a).save(inf / f"frame{i}_pose.png")
        Image.fromarray(b).save(ref / f"pod2colour_pod2primary_{i:03d}.tif")
    means = comparisons.compare_sequence_numerical(
        str(inf), str(ref), str(save), n_frames=2, rows=(2, 18), cols=(2, 18))
    assert len(means) == 2
    for m in means:
        assert 5.0 < m <= 10.0   # offset 10 with clipping at 255
    assert (save / "numerical_clip.csv").exists()


def test_diff_heatmap_values():
    img = np.full((4, 4), 120, np.uint8)
    ref = np.full((4, 4), 100, np.uint8)
    comp = comparisons.diff_heatmap(img, ref, colour=True)
    # +20 diff -> red tint: R=255, G=B=255-40
    assert (comp[..., 0] == 255).all()
    assert (comp[..., 1] == 215).all()
    assert (comp[..., 2] == 215).all()


def test_batchmodify(tmp_path):
    base = tmp_path / "base.obj"
    base.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\nvt 1 0\nvt 0 1\n"
                    "f 1/1 2/2 3/3\n")
    bl = tmp_path / "bl"
    bl.mkdir()
    (bl / "shape0.obj").write_text("v 0 0 1\nv 1 0 1\nv 0 1 1\n")
    n = batchmodify.rewrite_blendshapes(str(bl), str(base))
    assert n == 1
    mesh = objlib.load_obj(str(bl / "shape0.obj"))
    assert mesh.uv.shape == (3, 2)
    np.testing.assert_allclose(mesh.verts3[:, 2], 1.0)


def test_image_utils(rng):
    img = rng.uniform(size=(8, 8, 1)).astype(np.float32)
    w = np.asarray(img_utils.whiten(img, 0.5, 0.25))
    np.testing.assert_allclose(w, (img - 0.5) / 0.25, rtol=1e-6)

    blurred = np.asarray(img_utils.gaussian_blur(jnp.asarray(img), 5, 2.0))
    assert blurred.shape == img.shape
    assert blurred.std() < img.std()

    grid = img_utils.make_img(np.stack([img, img]), ncols=2)
    assert grid.shape == (8, 16, 1)


def test_undistort_identity():
    from fpc_diffrend_tpu.tools.undistort import undistort_image_jax

    img = np.arange(64, dtype=np.float32).reshape(8, 8)
    intr = np.array([[8.0, 0, 4.0], [0, 8.0, 4.0], [0, 0, 1]], np.float32)
    out = np.asarray(undistort_image_jax(img, intr, np.zeros(5)))
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_progress_video_png_fallback(tmp_path, rng, monkeypatch):
    """ProgressVideo writes PNG frames when no mp4 encoder is available."""
    import builtins

    real_import = builtins.__import__

    def no_imageio(name, *a, **k):
        if name == "imageio":
            raise ImportError("gated for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_imageio)
    from fpc_diffrend_tpu.utils.video import ProgressVideo

    v = ProgressVideo(str(tmp_path))
    ref = rng.uniform(size=(8, 8, 1)).astype(np.float32)
    ren = rng.uniform(size=(8, 8, 1)).astype(np.float32)
    v.append(ref, ren)
    v.append(ref, ren)
    v.close()
    assert (tmp_path / "progress_00000.png").exists()
    assert (tmp_path / "progress_00001.png").exists()


def test_render_result_roundtrip(small_setup, tmp_path):
    """Offline re-render of saved results through a calibrated camera."""
    scene, config, params = small_setup
    out = str(tmp_path / "run")
    result_dir = results_mod.save_results(config, scene, params, n_frames=2,
                                          out_dir=out)
    # also need basemesh + calibration files
    basemesh_path = str(tmp_path / "basemesh.obj")
    objlib.save_obj(basemesh_path,
                    np.asarray(scene.v_base).reshape(-1, 3),
                    np.asarray(scene.uv), np.asarray(scene.faces),
                    np.asarray(scene.uv_idx))
    calib = {"cam0": {
        "intrinsic": [[16.0, 0, 8.0], [0, 16.0, 8.0], [0, 0, 1]],
        "distortion": [[0]] * 5,
        "rotation": np.eye(3).tolist(),
        "translation": [[0.0], [0.0], [30.0]],
    }}
    calibpath = tmp_path / "calib.json"
    calibpath.write_text(json.dumps(calib))

    from fpc_diffrend_tpu.tools.render_result import render_result

    render_result(result_dir, str(calibpath), basemesh_path, ["cam0"],
                  n_frames=2, resolution=(16, 16), mode="plain",
                  write_imgs=True, impl="scan")
    assert os.path.exists(os.path.join(result_dir, "frame0_plain.png"))
    assert os.path.exists(os.path.join(result_dir, "frame1_plain.png"))

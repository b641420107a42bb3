"""fit_take end-to-end: real file layout -> fit -> reference-format results."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from fpc_diffrend_tpu.data import obj as objlib
from fpc_diffrend_tpu.fit import api as fit_api
from fpc_diffrend_tpu.fit.config import FitConfig


RES = (24, 24)


@pytest.fixture()
def take_dirs(tmp_path):
    # base mesh: a quad big enough to be visible from the synthetic camera
    verts = np.array([[-15, -15, 0], [15, -15, 0], [15, 15, 0], [-15, 15, 0]],
                     np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    basemesh = tmp_path / "basemesh.obj"
    objlib.save_obj(str(basemesh), verts, uv, faces)

    # two blendshapes (small vertex offsets)
    bl_dir = tmp_path / "blendshapes"
    bl_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        objlib.save_obj(str(bl_dir / f"bs{i}.obj"),
                        verts + rng.normal(scale=0.1, size=verts.shape)
                        .astype(np.float32), uv, faces)

    # calibration: synthetic pinhole looking at the quad from z=-30 (OpenCV
    # convention: world origin maps to z=+30 in camera space)
    calib = {
        "cam0": {
            "intrinsic": [[24.0, 0, 12.0], [0, 24.0, 12.0], [0, 0, 1]],
            "distortion": [[0], [0], [0], [0], [0]],
            "rotation": np.eye(3).tolist(),
            "translation": [[0.0], [0.0], [30.0]],
        }
    }
    calibpath = tmp_path / "calibration.json"
    calibpath.write_text(json.dumps(calib))

    # reference frames: flat grey images, 2 frames
    imdir = tmp_path / "take"
    camdir = imdir / "take_cam0"
    camdir.mkdir(parents=True)
    for f in range(2):
        img = np.full(RES, 90, np.uint8)
        Image.fromarray(img).save(camdir / f"take_cam0_{f:02d}.tif")

    return tmp_path


def test_fit_take_end_to_end(take_dirs, tmp_path):
    out_dir = str(tmp_path / "out")
    config = FitConfig(
        max_iter=6, lr_base=1e-4, lr_t=1e-4, lr_q=1e-5,
        basemeshpath=str(take_dirs / "basemesh.obj"),
        localblpath=str(take_dirs / "blendshapes"),
        imdir=str(take_dirs / "take"),
        calibpath=str(take_dirs / "calibration.json"),
        out_dir=out_dir, resolution=RES, texshape=(8, 8, 1),
        mode="prior", cam_idxs=(0,), batch_size=2, raster_impl="scan",
        log_interval=2,
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_interval=4)

    state = fit_api.fit_take(config)
    assert int(state.step) == 6
    assert np.isfinite(np.asarray(state.params["tex"])).all()

    result = os.path.join(out_dir, "result")
    assert os.path.exists(os.path.join(result, "0.obj"))
    assert os.path.exists(os.path.join(result, "1.obj"))
    assert os.path.exists(os.path.join(result, "pose.json"))
    assert os.path.exists(os.path.join(out_dir, "config.txt"))

    # checkpoint was written and resume continues from it
    from fpc_diffrend_tpu.fit import checkpoint as ckpt_mod
    assert ckpt_mod.latest_checkpoint(str(tmp_path / "ckpt"))

    import dataclasses
    config2 = dataclasses.replace(config, max_iter=8)
    state2 = fit_api.fit_take(config2, resume=True)
    assert int(state2.step) == 8


def test_fit_take_rejects_bad_mode(take_dirs):
    config = FitConfig(mode="bogus")
    with pytest.raises(ValueError, match="bogus"):
        config.validate()


def test_fit_take_display_interval(take_dirs, tmp_path):
    """display_interval refreshes out_dir/preview.png (headless preview)."""
    out_dir = str(tmp_path / "out_disp")
    config = FitConfig(
        max_iter=3, lr_base=1e-5, lr_t=1e-5, lr_q=1e-6,
        basemeshpath=str(take_dirs / "basemesh.obj"),
        localblpath=str(take_dirs / "blendshapes"),
        imdir=str(take_dirs / "take"),
        calibpath=str(take_dirs / "calibration.json"),
        out_dir=out_dir, resolution=RES, texshape=(8, 8, 1),
        mode="prior", cam_idxs=(0,), batch_size=2, raster_impl="scan",
        log_interval=0, display_interval=2)
    fit_api.fit_take(config, resume=False)
    assert os.path.exists(os.path.join(out_dir, "preview.png"))


def test_fit_take_crash_leaves_resumable_checkpoint(take_dirs, tmp_path):
    """Fault injection: a crash mid-fit must leave a checkpoint of the
    last completed step AND the partial results; a plain re-invocation
    then resumes from it (not from scratch) and completes (elastic
    single-host recovery, SURVEY.md §5)."""
    out_dir = str(tmp_path / "out_crash")
    config = FitConfig(
        max_iter=8, lr_base=1e-4, lr_t=1e-4, lr_q=1e-5,
        basemeshpath=str(take_dirs / "basemesh.obj"),
        localblpath=str(take_dirs / "blendshapes"),
        imdir=str(take_dirs / "take"),
        calibpath=str(take_dirs / "calibration.json"),
        out_dir=out_dir, resolution=RES, texshape=(8, 8, 1),
        mode="prior", cam_idxs=(0,), batch_size=2, raster_impl="scan",
        log_interval=1,
        checkpoint_dir=str(tmp_path / "ckpt_crash"), checkpoint_interval=0)

    calls = []

    def bomb(i, st, metrics):
        calls.append(i)
        if i >= 3:
            raise RuntimeError("injected fault")

    orig_run_fit = fit_api.loop_mod.run_fit

    def run_fit_with_bomb(cfg, scene, frames, n_frames, callbacks=None,
                          state=None, n_steps=None):
        return orig_run_fit(cfg, scene, frames, n_frames,
                            callbacks=(callbacks or []) + [bomb],
                            state=state, n_steps=n_steps)

    fit_api.loop_mod.run_fit = run_fit_with_bomb
    try:
        with pytest.raises(RuntimeError, match="injected fault"):
            fit_api.fit_take(config)
    finally:
        fit_api.loop_mod.run_fit = orig_run_fit

    # crash checkpoint exists and holds the last completed step
    from fpc_diffrend_tpu.fit import checkpoint as ckpt_mod

    latest = ckpt_mod.latest_checkpoint(config.checkpoint_dir)
    assert latest is not None
    # partial results were still written (reference interrupt semantics)
    assert os.path.exists(os.path.join(out_dir, "result", "texture.png"))

    # plain re-invocation resumes from the crash checkpoint and completes
    state = fit_api.fit_take(config)
    assert int(state.step) == 8
    assert np.isfinite(np.asarray(state.params["tex"])).all()


def _adversarial_scene(n_tall: int, n_small: int = 0, res: int = 128):
    """A scene purpose-built to overflow the raster caps: ``n_tall`` thin
    triangles each spanning > WINDOW_Y tile rows (oversized -> global
    list) plus ``n_small`` window-fitting ones (binned pairs), rendered
    through an identity camera (clip == vertex space)."""
    from fpc_diffrend_tpu.fit.scene import build_scene

    rng = np.random.default_rng(7)
    n = n_tall + n_small
    xs = rng.uniform(-0.9, 0.9, size=n).astype(np.float32)
    y0 = rng.uniform(-0.95, 0.2, size=n).astype(np.float32)
    # tall: spans ~0.7 ndc = ~45 px at 128^2 > WINDOW_Y * TILE_H = 32;
    # small: ~0.1 ndc = ~6 px, fits the binning window
    span = np.concatenate([np.full(n_tall, 0.7), np.full(n_small, 0.1)]
                          ).astype(np.float32)
    verts = np.zeros((n * 3, 3), np.float32)
    verts[0::3] = np.stack([xs, y0, np.zeros(n)], axis=1)
    verts[1::3] = np.stack([xs + 0.01, y0, np.zeros(n)], axis=1)
    verts[2::3] = np.stack([xs, y0 + span, np.zeros(n)], axis=1)
    faces = np.arange(n * 3, dtype=np.int32).reshape(n, 3)
    uv = np.tile(np.array([[0.2, 0.2], [0.8, 0.2], [0.5, 0.8]],
                          np.float32), (n, 1))
    mesh = objlib.MeshData(vertices=verts.reshape(-1), uv=uv, faces=faces,
                           fuv=faces)
    proj = np.eye(4, dtype=np.float32)[None]
    mv = np.eye(4, dtype=np.float32)[None]
    scene = build_scene(mesh, proj, mv)
    config = FitConfig(max_iter=2, resolution=(res, res),
                       texshape=(8, 8, 1), mode="free", cam_idxs=(0,),
                       batch_size=1, raster_impl="pallas")
    from fpc_diffrend_tpu.fit import state as state_mod

    tex = np.full((8, 8, 1), 0.5, np.float32)
    params = state_mod.init_params(config, 2, scene.v_base.shape[0],
                                   scene.deltas.shape[1], tex,
                                   scene.n_cameras)
    return config, scene, params


def test_global_list_overflow_aborts_autotune():
    """> MAX_GLOBAL oversized triangles must ABORT cap autotune rather
    than train with silently dropped triangles (no-silent-caps)."""
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import MAX_GLOBAL

    config, scene, params = _adversarial_scene(MAX_GLOBAL + 76)
    health = fit_api.measure_raster_health(config, scene, params)
    assert health["global_overflow"] > 0
    with pytest.raises(RuntimeError, match="global-list overflow"):
        fit_api.autotune_caps(config, scene, params)
    assert "WARNING: raster global-list overflow" in "\n".join(
        fit_api.health_warnings(config, health))


def test_health_warnings_pair_cap_and_band(monkeypatch):
    """Corrupted caps -> the exact WARNING lines (pair_cap overflow and
    banded-fold band overflow; BENCHMARKS.md 532k-entry incident)."""
    import dataclasses

    config, scene, params = _adversarial_scene(0, n_small=8)
    health = fit_api.measure_raster_health(config, scene, params)
    assert health["n_valid_pairs"] > 2
    small = dataclasses.replace(config, pair_cap=2)
    msgs = "\n".join(fit_api.health_warnings(small, health))
    assert "exceed pair_cap" in msgs

    monkeypatch.setenv("FPC_FOLD_IMPL", "banded")
    corrupt = dict(health, fold_band_excess=532000)
    msgs = "\n".join(fit_api.health_warnings(config, corrupt))
    assert "banded-fold window" in msgs and "532000" in msgs
    monkeypatch.delenv("FPC_FOLD_IMPL")
    assert fit_api.health_warnings(config, dict(health, pair_cap=0)) == []


def test_fit_surfaces_cap_overflow_warning(take_dirs, tmp_path, capsys):
    """End-to-end: a fit whose pair_cap is too small for the scene must
    PRINT the overflow warning from the periodic health check — the
    silent-gradient-corruption class must be loud (VERDICT round-4 #7)."""
    out_dir = str(tmp_path / "out_ovf")
    # the fixture's quad sits at the world origin, which the baked +170
    # y-offset (load_calibration / reference fit.py:545) pushes off
    # screen — shift this mesh to y ~ -170 so it actually rasterizes
    verts = np.array([[-15, -185, 0], [15, -185, 0], [15, -155, 0],
                      [-15, -155, 0]], np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    vis_mesh = take_dirs / "basemesh_vis.obj"
    objlib.save_obj(str(vis_mesh), verts, uv, faces)
    bl_dir = take_dirs / "blendshapes_vis"
    bl_dir.mkdir()
    for i in range(2):
        objlib.save_obj(str(bl_dir / f"bs{i}.obj"), verts + 0.1 * i,
                        uv, faces)
    config = FitConfig(
        max_iter=2, lr_base=1e-5, lr_t=1e-5, lr_q=1e-6,
        basemeshpath=str(vis_mesh),
        localblpath=str(bl_dir),
        imdir=str(take_dirs / "take"),
        calibpath=str(take_dirs / "calibration.json"),
        out_dir=out_dir, resolution=RES, texshape=(8, 8, 1),
        mode="prior", cam_idxs=(0,), batch_size=1, raster_impl="scan",
        pair_cap=1, log_interval=1)
    fit_api.fit_take(config, resume=False)
    out = capsys.readouterr().out
    assert "exceed pair_cap" in out


def test_autotune_scene_flips_descending_faces(monkeypatch):
    """A scene whose triangle ids DESCEND along the tile-sorted bin
    order (the GL y-flip's upright-camera signature) gets its face
    order reversed under FPC_BATCH=stack so the forward banded fold
    becomes exact (the stacked pipeline cannot run banded_rev)."""
    import jax.numpy as jnp

    from fpc_diffrend_tpu.fit import state as state_mod
    from fpc_diffrend_tpu.fit.scene import build_scene

    # a tall strip of quads; faces ordered TOP-to-bottom (descending y)
    n_rows = 3000
    ys = np.linspace(0.95, -0.95, n_rows + 1).astype(np.float32)
    verts, faces, uv = [], [], []
    for i in range(n_rows):
        b = len(verts)
        verts += [[-0.5, ys[i], 0], [0.5, ys[i], 0],
                  [-0.5, ys[i + 1], 0], [0.5, ys[i + 1], 0]]
        uv += [[0.2, 0.2]] * 4
        faces += [[b, b + 1, b + 2], [b + 1, b + 3, b + 2]]
    mesh = objlib.MeshData(
        vertices=np.asarray(verts, np.float32).reshape(-1),
        uv=np.asarray(uv, np.float32),
        faces=np.asarray(faces, np.int32),
        fuv=np.asarray(faces, np.int32))
    proj = np.eye(4, dtype=np.float32)[None]
    mv = np.eye(4, dtype=np.float32)[None]
    # keep the authored (descending-in-bin-order) face order
    scene = build_scene(mesh, proj, mv, reorder_faces=False)
    config = FitConfig(max_iter=2, resolution=(256, 128),
                       texshape=(8, 8, 1), mode="free", cam_idxs=(0,),
                       batch_size=1, raster_impl="pallas")
    tex = np.full((8, 8, 1), 0.5, np.float32)
    params = state_mod.init_params(config, 2, scene.v_base.shape[0],
                                   scene.deltas.shape[1], tex, 1)

    health = fit_api.measure_raster_health(config, scene, params)
    assert health["fold_band_excess"] > 0          # fwd unbandable
    assert health["fold_band_excess_rev"] <= -256  # rev would band

    monkeypatch.delenv("FPC_FOLD_IMPL", raising=False)
    monkeypatch.setenv("FPC_BATCH", "vmap")
    assert fit_api.autotune_scene(config, scene, params) is scene

    monkeypatch.setenv("FPC_BATCH", "stack")
    flipped = fit_api.autotune_scene(config, scene, params)
    assert flipped is not scene
    np.testing.assert_array_equal(np.asarray(flipped.faces),
                                  np.asarray(scene.faces)[::-1])
    h2 = fit_api.measure_raster_health(config, flipped, params)
    assert h2["fold_band_excess"] <= -256          # fwd now bands
    # geometry unchanged: same vertices, same uv
    np.testing.assert_array_equal(np.asarray(flipped.v_base),
                                  np.asarray(scene.v_base))


def test_checkpoint_restore_is_bit_exact(take_dirs, tmp_path):
    """save/restore roundtrip of the full TrainState (params, optimizer
    moments, step) is bit-exact — a resumed fit continues from EXACTLY
    the state the crashed run last completed."""
    import jax

    from fpc_diffrend_tpu.fit import checkpoint as ckpt_mod
    from fpc_diffrend_tpu.fit import state as state_mod

    config = FitConfig(
        max_iter=2, resolution=RES, texshape=(8, 8, 1), mode="free",
        cam_idxs=(0,), batch_size=1, raster_impl="scan")
    rng = np.random.default_rng(1)
    tex = rng.uniform(size=(8, 8, 1)).astype(np.float32)
    params = state_mod.init_params(config, 2, 12, 2, tex, 1)
    state = state_mod.init_state(config, params)
    # make optimizer moments nonzero so the roundtrip covers them
    state = state_mod.TrainState(
        step=state.step + 3,
        params=jax.tree.map(lambda x: x + 0.125, state.params),
        opt_state=state.opt_state)

    path = ckpt_mod.save_checkpoint(str(tmp_path / "ck"), state)
    restored = ckpt_mod.restore_checkpoint(path, state)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

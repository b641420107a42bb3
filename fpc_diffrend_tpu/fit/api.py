"""Top-level entry: ``fit_take(config)`` — the public API of the framework.

The TPU-native equivalent of the reference's single public function
``fit.fitTake(**30 kwargs)`` (fit.py:323-658): loads calibration, base
mesh, blendshapes and reference frames from the configured paths, runs the
jitted batched fit, and writes the reference-format results directory.
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from fpc_diffrend_tpu.data import frames as frames_mod
from fpc_diffrend_tpu.data import obj as objlib
from fpc_diffrend_tpu.fit import checkpoint as ckpt_mod
from fpc_diffrend_tpu.fit import loop as loop_mod
from fpc_diffrend_tpu.fit import results as results_mod
from fpc_diffrend_tpu.fit import state as state_mod
from fpc_diffrend_tpu.fit.config import FitConfig
from fpc_diffrend_tpu.fit.scene import build_scene, load_calibration
from fpc_diffrend_tpu.models import blendshape


def load_texture(texpath: str, texshape) -> np.ndarray:
    """Initial texture: file (flipped, normalized; fit.py:433-439) or noise."""
    if texpath:
        from PIL import Image

        tex = np.array(Image.open(texpath)).astype(np.float32) / 255.0
        if tex.ndim == 2:
            tex = tex[..., None]
        return np.flip(tex, 0).copy()
    return np.random.uniform(size=tuple(texshape)).astype(np.float32)


def setup_from_config(config: FitConfig):
    """Load all data for a take; returns (scene, frames_u8, n_frames, cams)."""
    cams = sorted(os.listdir(config.imdir))
    n_frames, _ = frames_mod.assert_num_frames(cams, config.imdir)

    # camera name -> calibration key: directory names look like
    # "<take>_<calibkey>" (reference fit.py:516 splits on "_")
    calib_keys = [c.split("_")[1] if "_" in c else c for c in cams]
    proj, mv = load_calibration(config.calibpath, calib_keys)

    basemesh = objlib.load_obj(config.basemeshpath)
    deltas = None
    if config.localblpath and config.mode in ("prior", "combined"):
        deltas, _, _ = blendshape.setup_dataset(
            config.localblpath, config.globalblpath, n_frames,
            basemesh.vertices.shape[0], basemesh.vertices)
    scene = build_scene(basemesh, proj, mv, deltas)

    frames_u8 = frames_mod.load_take(config.imdir, cams)
    return scene, jnp.asarray(frames_u8), n_frames, cams


def measure_raster_health(config: FitConfig, scene, params) -> dict:
    """Binning/cap health of the initial geometry across all cameras.

    Runs rasterize_tpu.raster_stats for every configured camera at frame 0
    and aggregates the worst case — used to auto-size ``pair_cap`` so the
    backward bin reduction can never silently drop gradient contributions,
    and to detect global-list overflow (VERDICT round-1 item 5).
    """
    import jax

    from fpc_diffrend_tpu.fit import loop as loop_mod
    from fpc_diffrend_tpu.models import blendshape
    from fpc_diffrend_tpu.models.camera import transform_clip
    import fpc_diffrend_tpu.ops.pallas.rasterize_tpu as rt

    h, w = config.resolution
    vtx = blendshape.blend(config.mode, {**params, "deltas": scene.deltas},
                           scene.v_base, jnp.int32(0),
                           config.combined_corrective_coefficient)
    verts3 = vtx.reshape(-1, 3)
    worst = {"n_valid_pairs": 0, "n_global": 0, "global_overflow": 0,
             "wy_max": 0, "wx_max": 0,
             "fold_band_excess": -(1 << 30),
             "fold_band_excess_rev": -(1 << 30)}
    cap = config.pair_cap if config.pair_cap else None
    for cam in config.cam_idxs:
        mvp = loop_mod.build_mvp(scene, params, jnp.int32(cam),
                                 jnp.int32(0))
        pos_clip = transform_clip(mvp, verts3)
        # window passed explicitly: autotune_caps may rebind the module
        # window between calls, and the jit cache must key on the value
        stats = jax.device_get(rt.raster_stats(
            pos_clip, scene.faces, h, w,
            window_y=rt.WINDOW_Y, window_x=rt.WINDOW_X))
        stats["fold_band_excess"] = _band_excess(scene, pos_clip, h, w,
                                                 cap, False)
        stats["fold_band_excess_rev"] = _band_excess(scene, pos_clip, h, w,
                                                     cap, True)
        for k in worst:
            worst[k] = max(worst[k], int(stats[k]))
    return worst


@functools.partial(jax.jit, static_argnames=("h", "w", "cap", "reverse"))
def _band_excess_jit(faces, face_neighbors, uv, uv_idx, pos_clip, h, w, cap,
                     reverse):
    from fpc_diffrend_tpu.ops.pallas.raster_grad_tpu import fold_band_excess
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import bin_scene

    _, bins = bin_scene(pos_clip, faces, h, w, entry_cap=cap)
    return fold_band_excess(bins.sorted_tri, bins.bin_start[-1],
                            cap if cap else bins.sorted_tri.shape[0],
                            faces.shape[0], reverse=reverse)


def _band_excess(scene, pos_clip, h, w, cap, reverse) -> int:
    return int(_band_excess_jit(scene.faces, scene.face_neighbors,
                                scene.uv, scene.uv_idx, pos_clip, h, w,
                                cap, reverse))


def health_warnings(config: FitConfig, health: dict) -> list[str]:
    """Warning lines for a measured health dict (no-silent-caps doctrine).

    Pure so tests can corrupt a scene on purpose and assert the exact
    warnings fire (the 532k-entries-out-of-window incident in
    BENCHMARKS.md must be structurally unrepeatable): global-list
    overflow, pair_cap overflow, and banded-fold band overflow.
    """
    warnings = []
    if health["global_overflow"] > 0:
        warnings.append(
            f"WARNING: raster global-list overflow "
            f"({health['global_overflow']} triangles dropped)")
    if config.pair_cap and health["n_valid_pairs"] > config.pair_cap:
        warnings.append(
            f"WARNING: bin entries ({health['n_valid_pairs']}) "
            f"exceed pair_cap ({config.pair_cap}) — gradient "
            "contributions are being dropped")
    impl = os.environ.get("FPC_FOLD_IMPL")
    exc = {"banded": health["fold_band_excess"],
           "banded_rev": health["fold_band_excess_rev"]}.get(impl)
    if exc is not None and exc > 0:
        warnings.append(
            f"WARNING: triangle-id band exceeds the banded-fold "
            f"window by {exc} — gradient contributions are "
            "being dropped (restart with FPC_FOLD_IMPL=segment)")
    return warnings


def autotune_caps(config: FitConfig, scene, params) -> FitConfig:
    """Resolve pair_cap == 0 (auto) from measured scene statistics.

    The cap is sized at 1.25x the measured bin-entry count (pose and
    expression changes during the fit move triangles across tile
    boundaries) rounded up to a whole chunk; overflow of the oversized-
    triangle list aborts immediately rather than training with silently
    clipped gradients.
    """
    import dataclasses

    if config.pair_cap or config.raster_impl == "scan":
        return config
    health = measure_raster_health(config, scene, params)

    # Binning-window autotune: the (tile, tri) pair list is WINDOW_Y *
    # WINDOW_X entries per triangle and feeds the binning key sort. XLA's
    # TPU sort runs at the next power-of-two size, so shrinking the
    # window only pays when T * K actually crosses a pow2 boundary —
    # measured on-chip 2026-08-20: K 8 -> 6 at T=30k (238k -> 178k keys,
    # both pad to 2^18) was 161.4 -> 171.3 ms, i.e. no sort win and
    # slightly worse XLA glue. Gate the shrink on the crossing. When it
    # fires, triangles that later GROW past the window drop to the
    # global list (rendered correctly up to MAX_GLOBAL; the periodic
    # health re-measure watches overflow). Explicit FPC_WINDOW_Y always
    # wins. The live pair set is unchanged when wy_max fits the new
    # window, so `health` stays valid as measured.
    import fpc_diffrend_tpu.ops.pallas.rasterize_tpu as rt

    if "FPC_WINDOW_Y" not in os.environ:
        wy_fit = max(int(health["wy_max"]), 2)
        T = int(scene.faces.shape[0])
        if wy_fit < rt.WINDOW_Y and (
                (T * wy_fit * rt.WINDOW_X - 1).bit_length()
                < (T * rt.WINDOW_Y * rt.WINDOW_X - 1).bit_length()):
            rt.WINDOW_Y = wy_fit
            print(f"[autotune] window_y={wy_fit} (measured wy_max="
                  f"{health['wy_max']}, {health['n_global']} global; "
                  "pair count crosses a sort pow2 boundary)", flush=True)

    if health["global_overflow"] > 0:
        raise RuntimeError(
            f"raster global-list overflow ({health['global_overflow']} "
            "oversized triangles dropped) — scene exceeds MAX_GLOBAL; "
            "reduce triangle size or raise the cap")
    mult = float(os.environ.get("FPC_CAP_MULT", "1.25"))
    cap = max(int(health["n_valid_pairs"] * mult), 1)
    cap = (cap + 127) // 128 * 128
    print(f"[autotune] pair_cap={cap} (measured {health['n_valid_pairs']} "
          f"bin entries, {health['n_global']} global)", flush=True)

    # Gradient-fold implementation: the banded sliding-window Pallas fold
    # is ~2x faster end-to-end than segment_sum but exact only when the
    # scene's triangle-id bands fit the window. Enable it when measured
    # with a safety margin (pose/expression drift is re-checked by the
    # periodic in-fit health measurement); an explicit FPC_FOLD_IMPL
    # always wins.
    if "FPC_FOLD_IMPL" not in os.environ:
        fwd = health["fold_band_excess"]
        rev = health["fold_band_excess_rev"]
        excess, impl = min((fwd, "banded"), (rev, "banded_rev"))
        if excess <= -256:
            os.environ["FPC_FOLD_IMPL"] = impl
            print(f"[autotune] fold={impl} (band excess fwd {fwd} / "
                  f"rev {rev})", flush=True)
        else:
            print(f"[autotune] fold=segment (band excess fwd {fwd} / "
                  f"rev {rev}; window too small for this scene's id "
                  "bands)", flush=True)
    return dataclasses.replace(config, pair_cap=cap)


def autotune_scene(config: FitConfig, scene, params):
    """Scene-side autotune: face-order orientation for the banded fold.

    The stacked-batch pipeline (FPC_BATCH=stack) cannot run the
    banded_REV fold (reversing the stacked bin order would interleave
    the samples' id bands), so a scene whose triangle ids DESCEND along
    the tile-sorted order — the GL y-flip makes upright-camera scenes
    do exactly that — would silently fall back to the ~2x slower
    segment fold. REVERSING THE FACE ORDER once makes the forward
    banded fold exact instead: rendering is face-order independent, the
    topology tables are rebuilt, and result OBJs inherit the order (same
    geometry; band_reorder already documents this contract).

    Call before :func:`autotune_caps` (which then measures the flipped
    scene's band excess and enables ``banded``). No-op unless
    FPC_BATCH=stack, the scene is rev-banded but not fwd-banded, and no
    explicit FPC_FOLD_IMPL is set.
    """
    if (os.environ.get("FPC_BATCH", "stack") != "stack"
            or "FPC_FOLD_IMPL" in os.environ
            or config.pair_cap or config.raster_impl == "scan"):
        return scene
    health = measure_raster_health(config, scene, params)
    fwd = health["fold_band_excess"]
    rev = health["fold_band_excess_rev"]
    if fwd <= -256 or rev > -256:
        return scene          # fwd already fine, or rev wouldn't help
    from fpc_diffrend_tpu.fit.scene import build_scene

    mesh = objlib.MeshData(
        vertices=np.asarray(scene.v_base),
        uv=np.asarray(scene.uv),
        faces=np.asarray(scene.faces)[::-1].copy(),
        fuv=np.asarray(scene.uv_idx)[::-1].copy())
    flipped = build_scene(mesh, np.asarray(scene.proj), np.asarray(scene.mv),
                          scene.deltas, reorder_faces=False)
    print(f"[autotune] face order reversed for the stacked banded fold "
          f"(band excess fwd {fwd} / rev {rev})", flush=True)
    return flipped


def fit_take(config: FitConfig, resume: bool = True):
    """Run a full fit from configured paths and save results.

    :param resume: restore the latest checkpoint in config.checkpoint_dir.
    :return: final TrainState.
    """
    config.validate()
    os.makedirs(config.out_dir, exist_ok=True)

    scene, frames_u8, n_frames, cams = setup_from_config(config)

    tex_init = load_texture(config.texpath, config.texshape)
    params = state_mod.init_params(config, n_frames, scene.v_base.shape[0],
                                   scene.deltas.shape[1], tex_init,
                                   scene.n_cameras)
    scene = autotune_scene(config, scene, params)
    config = autotune_caps(config, scene, params)
    state = state_mod.init_state(config, params)

    if resume and config.checkpoint_dir:
        latest = ckpt_mod.latest_checkpoint(config.checkpoint_dir)
        if latest:
            print(f"Resuming from {latest}")
            state = ckpt_mod.restore_checkpoint(latest, state)

    t0 = time.time()
    metrics_path = os.path.join(config.out_dir, "metrics.jsonl")
    metrics_file = open(metrics_path, "a")

    health_interval = max(config.log_interval * 20, 1000)

    def log_cb(i, st, metrics):
        if config.log_interval and i % config.log_interval >= max(
                config.steps_per_dispatch, 1):
            return
        loss = float(metrics["loss"])
        rate = (i + 1) / max(time.time() - t0, 1e-9)
        print(f"It[{i}] - Loss: {loss:.4f} - {rate:.2f} it/s", flush=True)
        import json as _json

        record = {"step": int(st.step), "loss": loss, "it_per_s": rate,
                  "pair_cap": config.pair_cap}
        # Periodic cap-health re-measurement at the *current* geometry —
        # a fit can move/scale the mesh until bins overflow the caps;
        # never train silently with clipped gradients (VERDICT item 5).
        # The scan impl has no caps, but an explicitly set pair_cap is
        # still monitored (lets CPU tests exercise the warning path).
        if ((config.raster_impl != "scan" or config.pair_cap)
                and i % health_interval < max(
                    config.steps_per_dispatch, 1)):
            health = measure_raster_health(config, scene, st.params)
            record.update(health)
            for warning in health_warnings(config, health):
                print(warning, flush=True)
        metrics_file.write(_json.dumps(record) + "\n")
        metrics_file.flush()

    # train_step donates the incoming state's buffers, so fit_take's own
    # `state` binding is dead the moment the first step runs — track the
    # last COMPLETED state through the callback stream so the crash path
    # below can checkpoint and save something alive.
    latest = {"state": state}

    def _track(i, st, metrics):
        latest["state"] = st

    callbacks = [_track, log_cb]
    if config.checkpoint_dir and config.checkpoint_interval:
        callbacks.append(ckpt_mod.checkpoint_callback(
            config.checkpoint_dir, config.checkpoint_interval))
    video = None
    if config.mp4_interval:
        from fpc_diffrend_tpu.utils.video import ProgressVideo, \
            progress_callback

        video = ProgressVideo(config.out_dir)
        callbacks.append(progress_callback(
            video, config, scene, config.mp4_interval, frames_u8))
    if config.display_interval:
        # headless stand-in for the reference's live GL preview
        # (fit.py:626-636): refresh out_dir/preview.png periodically
        import jax.numpy as _jnp

        from fpc_diffrend_tpu.fit import loop as _loop
        from fpc_diffrend_tpu.utils.image import display_image, make_img

        def display_cb(i, st, metrics):
            if i % config.display_interval:
                return
            img, _ = _loop.render_sample(config, scene, st.params,
                                         _jnp.int32(0), _jnp.int32(0))
            ref = np.asarray(frames_u8[0, 0], np.float32)[..., None] / 255.0
            grid = make_img(np.stack([ref[::-1],
                                      np.asarray(img)[::-1]]))
            display_image(grid, os.path.join(config.out_dir, "preview.png"))

        callbacks.append(display_cb)

    # Like the reference (fit.py:644-652), an interrupt still saves
    # results. Beyond the reference: SIGTERM (preemption) is converted to
    # the same interrupt path, and ANY exit — interrupt, preemption or a
    # crash mid-fit — leaves a resumable checkpoint of the last completed
    # dispatch, so `fit_take(config)` after a failure continues instead
    # of restarting (elastic single-host recovery; SURVEY.md §5).
    import signal

    def _sigterm(_sig, _frm):
        raise KeyboardInterrupt

    prev_handler = None
    try:
        prev_handler = signal.signal(signal.SIGTERM, _sigterm)
    except ValueError:
        pass   # non-main thread: no handler, plain exception semantics

    try:
        remaining = config.max_iter - int(state.step)
        if remaining > 0:
            state = loop_mod.run_fit(config, scene, frames_u8, n_frames,
                                     callbacks=callbacks, state=state,
                                     n_steps=remaining)
            latest["state"] = state
        jax.block_until_ready(state.params)
    except KeyboardInterrupt:
        print("Interrupted — saving partial results...")
    finally:
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)
        metrics_file.close()
        if video is not None:
            video.close()
        state = latest["state"]
        if config.checkpoint_dir:
            try:
                ckpt_mod.save_checkpoint(config.checkpoint_dir, state)
            except Exception as e:   # keep result saving alive regardless
                print(f"WARNING: final checkpoint failed: {e}")
        try:
            results_mod.save_results(config, scene, state.params, n_frames)
        except Exception as e:
            print(f"WARNING: result saving failed: {e}")
    print("Done")
    return state

"""The jit-compiled batched fit loop — the TPU-native ``fitTake``.

Reference architecture (fit.py:524-642): a Python loop doing one random
(camera, frame) sample per iteration with a per-step PIL disk read, eager
CUDA ops and per-step host sync. Here the whole step — blend -> pose ->
render -> loss -> grad -> multi-group Adam -> quaternion renorm — is one
jitted function, vmapped over a batch of (camera, frame) samples, with
reference frames preloaded to device memory as uint8 (fixing the per-step
disk read at fit.py:529-533).

The mvp construction replicates fit.py:541-553 exactly:
  proj @ rigid(per_frame pose) @ rigid(per-camera correction) @ (mv @ y-offset)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fpc_diffrend_tpu.fit import losses as losses_mod
from fpc_diffrend_tpu.fit import state as state_mod
from fpc_diffrend_tpu.fit.config import FitConfig
from fpc_diffrend_tpu.fit.scene import Scene
from fpc_diffrend_tpu.models import blendshape, pose

Array = jnp.ndarray


class Batch(NamedTuple):
    cam_idx: Array     # (B,) int32
    frame_idx: Array   # (B,) int32
    ref: Array         # (B, H, W, 1) float32 (already clipped + flipped)


def build_mvp(scene: Scene, params: dict, cam_idx, frame_idx) -> Array:
    """Differentiable modelview-projection for one sample (fit.py:541-553)."""
    proj = scene.proj[cam_idx]
    t_mv = scene.mv[cam_idx]          # includes the y-offset translate
    rigid_cam = pose.rigid_from_pose(params["t_opt"][cam_idx],
                                     params["q_opt"][cam_idx])
    rigid_pose = pose.rigid_from_pose(params["per_frame_t"][frame_idx],
                                      params["per_frame_q"][frame_idx])
    return proj @ (rigid_pose @ (rigid_cam @ t_mv))


def sample_clip_positions(config: FitConfig, scene: Scene, params: dict,
                          cam_idx, frame_idx) -> tuple[Array, Array]:
    """Blend + pose prologue shared by the render path and the stage
    profiler (tools/profile_stages.py) so both run the identical graph.

    :return: (pos_clip (V, 4), verts3 (V, 3))
    """
    from fpc_diffrend_tpu.models.camera import transform_clip

    vtx = blendshape.blend(config.mode, {**params, "deltas": scene.deltas},
                           scene.v_base, frame_idx,
                           config.combined_corrective_coefficient)
    verts3 = vtx.reshape(-1, 3)
    mvp = build_mvp(scene, params, cam_idx, frame_idx)
    return transform_clip(mvp, verts3), verts3


def render_sample(config: FitConfig, scene: Scene, params: dict,
                  cam_idx, frame_idx) -> tuple[Array, Array]:
    """Blend + pose + render one (camera, frame) sample.

    :return: (image (H, W, 1), verts3 (V, 3))
    """
    import os

    from fpc_diffrend_tpu.ops.pipeline import render_from_clip

    pos_clip, verts3 = sample_clip_positions(config, scene, params,
                                             cam_idx, frame_idx)
    # FPC_SETUP_VJP=gather routes the triangle-setup/aux backward through
    # the incidence-table gather (rasterize_tpu.corner_gather) instead of
    # XLA's scatter-add — opt-in until chip-validated (round-4 protocol).
    inc = (scene.inc
           if os.environ.get("FPC_SETUP_VJP", "scatter") == "gather"
           and scene.vtx_inc_idx is not None else (None, None))
    img = render_from_clip(pos_clip, scene.faces, scene.uv, scene.uv_idx,
                           params["tex"], tuple(config.resolution),
                           scene.face_neighbors, enable_mip=config.enable_mip,
                           max_mip_level=config.max_mip_level,
                           impl=config.raster_impl,
                           aa_max_pairs=resolve_aa_max_pairs(config),
                           pair_cap=config.pair_cap if config.pair_cap > 0
                           else None, inc=inc)
    return img, verts3


def resolve_aa_max_pairs(config: FitConfig) -> int | None:
    """Config knob -> antialias cap: 0 = auto, -1 = exact full grid."""
    if config.aa_max_pairs == -1:
        return None
    if config.aa_max_pairs == 0:
        h, w = config.resolution
        return 8 * (h + w)
    return config.aa_max_pairs


def render_batch(config: FitConfig, scene: Scene, params: dict,
                 cam_idx, frame_idx) -> tuple[Array, Array]:
    """Render a (B,) batch of samples: the stacked-batch single-kernel-pass
    pipeline when eligible and selected (FPC_BATCH=stack), else vmap of
    :func:`render_sample` (vmap lowers each Pallas call to a B-sized
    while loop + per-sample slice copies — round-4b trace item 3d).

    :return: (imgs (B, H, W, C), verts3 (B, V, 3))
    """
    import os

    from fpc_diffrend_tpu.ops.pipeline import (render_batch_stacked,
                                               stacked_batch_eligible)

    # default "stack" since round 5: bracketed on-chip A/B 120.7 ms vs
    # 127.2/127.3 ms controls at the headline workload (BENCHMARKS.md)
    if (os.environ.get("FPC_BATCH", "stack") == "stack"
            and stacked_batch_eligible(config.resolution,
                                       tuple(config.texshape),
                                       config.enable_mip,
                                       config.raster_impl)):
        pos_clip_b, verts3 = jax.vmap(
            lambda c, f: sample_clip_positions(config, scene, params, c, f)
        )(cam_idx, frame_idx)
        inc = (scene.inc
               if os.environ.get("FPC_SETUP_VJP", "scatter") == "gather"
               and scene.vtx_inc_idx is not None else (None, None))
        imgs = render_batch_stacked(
            pos_clip_b, scene.faces, scene.uv, scene.uv_idx,
            params["tex"], tuple(config.resolution), scene.face_neighbors,
            pair_cap=config.pair_cap if config.pair_cap > 0 else None,
            inc=inc,
            interpret=os.environ.get("FPC_INTERPRET", "0") == "1")
        return imgs, verts3
    return jax.vmap(
        lambda c, f: render_sample(config, scene, params, c, f)
    )(cam_idx, frame_idx)


def loss_fn(params: dict, config: FitConfig, scene: Scene, batch: Batch,
            step) -> tuple[Array, dict]:
    imgs, verts3 = render_batch(config, scene, params, batch.cam_idx,
                                batch.frame_idx)

    pix = jax.vmap(losses_mod.photometric_loss)(batch.ref, imgs).mean()
    # zero-weight regularizers are skipped structurally (config is static):
    # saves their compute entirely — the reported metric is the WEIGHTED
    # term, which is identically zero for an unweighted regularizer
    from fpc_diffrend_tpu.ops import mesh_ops

    zero = jnp.float32(0.0)
    mel_m = lap_m = mnc_m = zero
    if config.weight_meshedge:
        mel = jax.vmap(lambda v: mesh_ops.mesh_edge_loss(
            v, scene.edges, config.meshedge_target))(verts3)
        mel_m = config.weight_meshedge * mel.mean()
    if config.weight_laplacian:
        if scene.nbr_idx is not None:
            lap = jax.vmap(lambda v: mesh_ops.mesh_laplacian_smoothing_padded(
                v, scene.nbr_idx, scene.nbr_mask, scene.degree))(verts3)
        else:
            lap = jax.vmap(lambda v: mesh_ops.mesh_laplacian_smoothing(
                v, scene.neighbor_src, scene.neighbor_dst,
                scene.degree))(verts3)
        lap_m = config.weight_laplacian * (lap ** 2).mean()
    if config.weight_normalconsistency:
        mnc = jax.vmap(lambda v: mesh_ops.mesh_normal_consistency(
            v, scene.faces, scene.edge_face_pairs))(verts3)
        mnc_m = config.weight_normalconsistency * mnc.mean()
    reg = mel_m + lap_m + mnc_m
    extra = losses_mod.staging_regularizers(config, params, batch.frame_idx,
                                            step)
    extra = extra + losses_mod.temporal_smoothness(config, params,
                                                   batch.frame_idx)
    total = pix + reg + extra
    metrics = {"loss": total, "pix": pix,
               "mel": mel_m, "lap": lap_m, "mnc": mnc_m}
    return total, metrics


def _train_step_impl(config: FitConfig, scene: Scene,
                     state: state_mod.TrainState,
                     batch: Batch) -> tuple[state_mod.TrainState, dict]:
    grads, metrics = jax.grad(loss_fn, has_aux=True)(
        state.params, config, scene, batch, state.step)
    grads = state_mod.apply_corrective_gate(config, state.step, grads)
    opt = state_mod.make_optimizer(config)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    # optax schedules read the step from their own counters; our ramp uses
    # scale_by_schedule which tracks update count == state.step.
    params = optax.apply_updates(state.params, updates)
    params = state_mod.normalize_quaternions(params)
    return state_mod.TrainState(step=state.step + 1, params=params,
                                opt_state=opt_state), metrics


@functools.partial(jax.jit, static_argnames=("config",), donate_argnames=("state",))
def train_step(config: FitConfig, scene: Scene, state: state_mod.TrainState,
               batch: Batch) -> tuple[state_mod.TrainState, dict]:
    """One optimization step (the whole body of fit.py:524-642)."""
    return _train_step_impl(config, scene, state, batch)


@functools.partial(jax.jit,
                   static_argnames=("config", "k", "n_frames"),
                   donate_argnames=("state",))
def train_steps(config: FitConfig, scene: Scene,
                state: state_mod.TrainState, frames_u8: Array,
                rng_key: Array, k: int,
                n_frames: int) -> tuple[state_mod.TrainState, dict]:
    """``k`` train steps in one dispatch (lax.scan) with on-device
    (camera, frame) sampling — at sub-50ms step times the per-step Python
    dispatch and remote-attach latency would otherwise dominate.

    :param rng_key: jax PRNG key for this dispatch's samples.
    :return: (state, metrics) with metrics stacked over the k steps.
    """
    cams = jnp.asarray(config.cam_idxs, jnp.int32)

    def body(state, key):
        k1, k2 = jax.random.split(key)
        cam = cams[jax.random.randint(k1, (config.batch_size,), 0,
                                      cams.shape[0])]
        frame = jax.random.randint(k2, (config.batch_size,), 0, n_frames)
        batch = Batch(cam_idx=cam, frame_idx=frame,
                      ref=decode_refs(frames_u8, cam, frame))
        state, metrics = _train_step_impl(config, scene, state, batch)
        return state, metrics

    keys = jax.random.split(rng_key, k)
    return jax.lax.scan(body, state, keys)


def decode_refs(frames_u8: Array, cam_idx, frame_idx) -> Array:
    """Gather + decode reference frames: uint8 (C, F, H, W) -> (B, H, W, 1).

    Frames are stored pre-clipped to [0, 140] and pre-flipped (fit.py:531-533
    does this per step; we do it once at ingest).
    """
    sel = frames_u8[cam_idx, frame_idx]                  # (B, H, W) uint8
    return sel.astype(jnp.float32)[..., None]


def sample_batches(config: FitConfig, n_frames: int, rng: np.random.Generator):
    """Host-side endless sampler of (cam, frame) index batches (fit.py:525-526)."""
    cams = np.asarray(config.cam_idxs, np.int32)
    while True:
        yield (rng.choice(cams, size=config.batch_size),
               rng.integers(0, n_frames, size=config.batch_size,
                            dtype=np.int32))


def run_fit(config: FitConfig, scene: Scene, frames_u8: Array,
            n_frames: int, callbacks=None, state=None, n_steps=None):
    """Drive the fit for ``n_steps`` (default config.max_iter) steps.

    :param frames_u8: (C, F, H, W) uint8 reference frames on device.
    :param callbacks: optional list of fn(step, state, metrics) called every
        log_interval steps (logging, checkpointing, mp4).
    :return: final TrainState.
    """
    config.validate()
    if state is None:
        tex_init = np.random.default_rng(config.seed).uniform(
            size=config.texshape).astype(np.float32)
        params = state_mod.init_params(
            config, n_frames, scene.v_base.shape[0],
            scene.deltas.shape[1], tex_init, scene.n_cameras)
        state = state_mod.init_state(config, params)

    total = config.max_iter if n_steps is None else n_steps
    k = max(int(config.steps_per_dispatch), 1)
    if k > 1:
        # Multi-step dispatch: k scanned steps per host call, sampling on
        # device; callbacks fire once per dispatch with the last step's
        # metrics (they gate on their own intervals — set intervals to
        # multiples of k for exact parity with per-step dispatch).
        key = jax.random.PRNGKey(config.seed + int(state.step))
        i = 0
        while i < total:
            kk = min(k, total - i)
            key, sub = jax.random.split(key)
            state, metrics_k = train_steps(config, scene, state, frames_u8,
                                           sub, kk, n_frames)
            i += kk
            if callbacks:
                last = jax.tree.map(lambda m: m[-1], metrics_k)
                for cb in callbacks:
                    cb(i - 1, state, last)
        return state

    rng = np.random.default_rng(config.seed)
    sampler = sample_batches(config, n_frames, rng)
    for i in range(total):
        cam_np, frame_np = next(sampler)
        cam = jnp.asarray(cam_np)
        frame = jnp.asarray(frame_np)
        batch = Batch(cam_idx=cam, frame_idx=frame,
                      ref=decode_refs(frames_u8, cam, frame))
        state, metrics = train_step(config, scene, state, batch)
        if callbacks:
            # callbacks gate themselves on their own intervals
            for cb in callbacks:
                cb(i, state, metrics)
    return state

"""Multi-device training step: shard_map over ('frame', 'view', 'tile').

Decomposition (SURVEY.md §2c — all new design, the reference is serial):

  * The global (camera, frame) sample batch is split over the 'frame' and
    'view' mesh axes (data/view parallelism). Reference images arrive
    pre-sliced per 'tile' band (no full-frame replication over the tile
    axis).
  * Each sample's render is split over the 'tile' axis into horizontal
    image bands (spatial parallelism) with a one-row ppermute halo for the
    antialias seam (parallel/spatial.py).
  * Each device computes the gradient of its local loss share; one psum
    over all axes yields the exact global gradient (shared parameters —
    texture, rig matrices, camera corrections — are thereby all-reduced
    over ICI).
  * With ``shard_frames=True`` the per-frame parameters and their
    optimizer state live WITH their frame shard (SURVEY §2c: "no
    communication for per-frame params"; the reference's per-frame
    tensors are fit.py:451-454): ``per_frame_t``/``per_frame_q`` rows and
    the frame-indexed columns of ``maps``/``m1`` are sharded over the
    'frame' axis, their gradients are psum'd only over ('view', 'tile'),
    and the temporal-smoothness term exchanges a one-frame pose halo via
    a single ppermute. Each frame shard must sample frames from its own
    contiguous range (``sample_stratified``).

Loss sharing: photometric term is summed per device and pre-divided by the
global pixel count; replicated mesh regularizers are pre-divided by the
tile-axis size, so psum(local) == reference loss (fit.py:579-582).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fpc_diffrend_tpu.fit import losses as losses_mod
from fpc_diffrend_tpu.fit import state as state_mod
from fpc_diffrend_tpu.fit.config import FitConfig
from fpc_diffrend_tpu.fit.loop import Batch, build_mvp, resolve_aa_max_pairs
from fpc_diffrend_tpu.fit.scene import Scene
from fpc_diffrend_tpu.models import blendshape
from fpc_diffrend_tpu.parallel import spatial

import optax

Array = jnp.ndarray

AXES = ("frame", "view", "tile")

# Parameters (and optimizer moments) that live with their frame shard
# when shard_frames=True. per_frame_t/q are row-indexed by frame
# (reference fit.py:451-454); maps and m1 are column-indexed by the frame
# one-hot (reference fit.py:104-129, 47-62).
FRAME_SHARDED = {
    "per_frame_t": P("frame"),
    "per_frame_q": P("frame"),
    "maps": P(None, "frame"),
    "m1": P(None, "frame"),
}


def _temporal_smoothness_sharded(config: FitConfig, params: dict,
                                 frame_idx, local_frame, nf: int):
    """losses.temporal_smoothness over frame-sharded pose rows.

    The only cross-shard coupling is each shard's first frame needing its
    predecessor's pose — one (3,)+(4,) ppermute halo from the previous
    shard's last row.
    """
    if config.weight_temporal == 0.0:
        return jnp.float32(0.0)
    t = params["per_frame_t"]
    q = params["per_frame_q"]
    if nf > 1:
        perm = [(i, i + 1) for i in range(nf - 1)]
        t_halo = jax.lax.ppermute(t[-1], "frame", perm)      # (3,)
        q_halo = jax.lax.ppermute(q[-1], "frame", perm)      # (4,)
    else:
        t_halo = t[-1]
        q_halo = q[-1]
    prev = local_frame - 1
    prev_c = jnp.maximum(prev, 0)
    inside = (prev >= 0)[:, None]
    t_prev = jnp.where(inside, t[prev_c], t_halo[None, :])
    q_prev = jnp.where(inside, q[prev_c], q_halo[None, :])
    dt = t[local_frame] - t_prev
    dq = q[local_frame] - q_prev
    gate = (frame_idx > 0).astype(jnp.float32)
    per = (jnp.sum(dt * dt, axis=-1) + jnp.sum(dq * dq, axis=-1)) * gate
    return config.weight_temporal * jnp.mean(per)


def _local_loss(config: FitConfig, scene: Scene, params: dict, batch: Batch,
                step, n_bands: int, batch_scale: float,
                shard_frames: bool = False, nf: int = 1):
    """Loss share of one device (inside shard_map)."""
    band = jax.lax.axis_index("tile") if n_bands > 1 else jnp.int32(0)
    hb = config.resolution[0] // n_bands
    band_res = (hb, config.resolution[1])

    if shard_frames:
        local_f = params["per_frame_t"].shape[0]
        f_lo = jax.lax.axis_index("frame") * local_f
        local_frame = batch.frame_idx - f_lo
    else:
        local_frame = batch.frame_idx

    def one(cam_idx, frame_idx, ref_band):
        vtx = blendshape.blend(config.mode,
                               {**params, "deltas": scene.deltas},
                               scene.v_base, frame_idx,
                               config.combined_corrective_coefficient)
        verts3 = vtx.reshape(-1, 3)
        mvp = build_mvp(scene, params, cam_idx, frame_idx)
        img = spatial.render_band(
            mvp, verts3, scene.faces, scene.uv, scene.uv_idx, params["tex"],
            band_res, scene.face_neighbors, band, n_bands,
            enable_mip=config.enable_mip, max_mip_level=config.max_mip_level,
            impl=config.raster_impl,
            axis_name="tile" if n_bands > 1 else None,
            aa_max_pairs=resolve_aa_max_pairs(config),
            pair_cap=config.pair_cap if config.pair_cap > 0 else None)
        # ref arrives pre-sliced to this device's band rows
        pix_sum = jnp.sum((ref_band - img * 255.0) ** 2)
        mel, lap, mnc = losses_mod.mesh_regularizers(config, scene, verts3)
        reg = (config.weight_meshedge * mel
               + config.weight_laplacian * lap ** 2
               + config.weight_normalconsistency * mnc)
        return pix_sum, reg

    # per-frame parameter lookups use shard-local frame indices
    pix_sums, regs = jax.vmap(one)(batch.cam_idx, local_frame, batch.ref)
    n_px = config.resolution[0] * config.resolution[1]
    # regs are replicated across 'tile': divide by n_bands so the global
    # psum counts them once; divide by global batch size for the mean.
    local = (jnp.sum(pix_sums) / (batch_scale * n_px)
             + jnp.sum(regs) / (batch_scale * n_bands))
    # staging/temporal terms use this device's local frame batch; divide by
    # the tile replication so the psum counts each sample group once.
    extra = losses_mod.staging_regularizers(config, params, local_frame,
                                            step)
    if shard_frames:
        extra = extra + _temporal_smoothness_sharded(
            config, params, batch.frame_idx, local_frame, nf)
    else:
        extra = extra + losses_mod.temporal_smoothness(config, params,
                                                       batch.frame_idx)
    dp_groups = batch_scale / batch.cam_idx.shape[0]
    return local + extra / (dp_groups * n_bands)


def _opt_state_spec(opt, params_like):
    """PartitionSpec pytree for the optimizer state: Adam moments follow
    their parameter's sharding, step counters are replicated."""
    shapes = jax.eval_shape(opt.init, params_like)

    def leaf_spec(path, leaf):
        if getattr(leaf, "ndim", 0) == 0:
            return P()
        for entry in reversed(path):
            key = getattr(entry, "key", None)
            if key in FRAME_SHARDED and leaf.ndim == len(
                    params_like[key].shape):
                return FRAME_SHARDED[key]
        return P()

    return jax.tree_util.tree_map_with_path(leaf_spec, shapes)


def make_sharded_train_step(config: FitConfig, scene: Scene, mesh: Mesh,
                            shard_frames: bool = False, params_like=None):
    """Build the pjit-ted multi-device train step.

    The global batch size must be divisible by frame_size * view_size.
    Returns fn(state, batch) -> (state, metrics); batch.ref is the
    full-frame reference for each sample (band rows are split over the
    'tile' axis by the batch sharding).

    :param shard_frames: shard the per-frame parameters and their Adam
        moments over the 'frame' axis (their gradients then skip the
        'frame' psum entirely). Requires every sample on frame shard k to
        reference a frame in shard k's contiguous range (use
        ``sample_stratified``) and n_frames divisible by the axis size.
    :param params_like: parameter pytree (or shapes) used to derive the
        optimizer-state sharding; required when shard_frames=True.
    """
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_bands = sizes.get("tile", 1)
    nf = sizes.get("frame", 1)
    dp = nf * sizes.get("view", 1)
    assert config.batch_size % dp == 0, (config.batch_size, dp)
    assert config.resolution[0] % max(n_bands, 1) == 0
    shard_frames = shard_frames and nf > 1

    opt = state_mod.make_optimizer(config)
    axes_all = tuple(mesh.axis_names)
    axes_nofr = tuple(a for a in axes_all if a != "frame")

    def local_step(params, opt_state, step, batch):
        batch_scale = float(config.batch_size)
        loss, grads = jax.value_and_grad(
            lambda p: _local_loss(config, scene, p, batch, step,
                                  n_bands, batch_scale,
                                  shard_frames=shard_frames, nf=nf))(params)
        if shard_frames:
            grads = {
                k: (jax.lax.psum(v, axes_nofr) if k in FRAME_SHARDED
                    else jax.lax.psum(v, axes_all))
                for k, v in grads.items()
            }
        else:
            grads = jax.lax.psum(grads, axes_all)
        loss = jax.lax.psum(loss, axes_all)
        grads = state_mod.apply_corrective_gate(config, step, grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = state_mod.normalize_quaternions(params)
        return params, opt_state, loss

    batch_spec = Batch(cam_idx=P(("frame", "view")),
                       frame_idx=P(("frame", "view")),
                       ref=P(("frame", "view"), "tile"))

    if shard_frames:
        assert params_like is not None, \
            "shard_frames=True requires params_like for the opt-state spec"
        pspec = {k: FRAME_SHARDED.get(k, P()) for k in params_like}
        ospec = _opt_state_spec(opt, params_like)
    else:
        pspec = P()
        ospec = P()

    shard_fn = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(pspec, ospec, P(), batch_spec),
        out_specs=(pspec, ospec, P()),
        check_vma=False)

    @jax.jit
    def train_step(state: state_mod.TrainState, batch: Batch):
        params, opt_state, loss = shard_fn(state.params, state.opt_state,
                                           state.step, batch)
        new_state = state_mod.TrainState(step=state.step + 1, params=params,
                                         opt_state=opt_state)
        return new_state, {"loss": loss}

    return train_step


def shard_batch_for(mesh: Mesh, batch: Batch) -> Batch:
    """Place a global batch with its sample axis over ('frame','view');
    reference rows are split over 'tile' so each device receives only its
    band of each sample."""
    s = NamedSharding(mesh, P(("frame", "view")))
    sref = NamedSharding(mesh, P(("frame", "view"), "tile"))
    return Batch(cam_idx=jax.device_put(batch.cam_idx, s),
                 frame_idx=jax.device_put(batch.frame_idx, s),
                 ref=jax.device_put(batch.ref, sref))


def sample_stratified(rng, config: FitConfig, mesh: Mesh, n_frames: int,
                      n_cams: int):
    """Sample a (cam_idx, frame_idx) batch compatible with shard_frames.

    Sample i of the global batch lands on frame shard i // (B / nf); its
    frame is drawn uniformly from that shard's contiguous range
    [k * n_frames / nf, (k + 1) * n_frames / nf). Cameras are uniform.
    """
    import numpy as np

    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    nf = sizes.get("frame", 1)
    B = config.batch_size
    assert B % nf == 0 and n_frames % nf == 0, (B, n_frames, nf)
    per = B // nf
    fper = n_frames // nf
    frames = np.concatenate([
        rng.integers(k * fper, (k + 1) * fper, per).astype(np.int32)
        for k in range(nf)])
    cams = rng.integers(0, n_cams, B).astype(np.int32)
    return jnp.asarray(cams), jnp.asarray(frames)

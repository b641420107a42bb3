"""Multi-device training step: shard_map over ('frame', 'view', 'tile').

Decomposition (SURVEY.md §2c — all new design, the reference is serial):

  * The global (camera, frame) sample batch is split over the 'frame' and
    'view' mesh axes (data/view parallelism). Parameters are replicated.
  * Each sample's render is split over the 'tile' axis into horizontal
    image bands (spatial parallelism) with a one-row ppermute halo for the
    antialias seam (parallel/spatial.py).
  * Each device computes the gradient of its local loss share; one psum
    over all axes yields the exact global gradient (shared parameters —
    texture, rig matrices, camera corrections — are thereby all-reduced
    over ICI, per-frame pose gradients ride the same reduction).

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


def _local_loss(config: FitConfig, scene: Scene, params: dict, batch: Batch,
                step, n_bands: int, batch_scale: float):
    """Loss share of one device (inside shard_map)."""
    band = jax.lax.axis_index("tile") if n_bands > 1 else jnp.int32(0)
    hb = config.resolution[0] // n_bands
    band_res = (hb, config.resolution[1])

    def one(cam_idx, frame_idx, ref):
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
            aa_max_pairs=resolve_aa_max_pairs(config))
        # ref arrives as the full-frame image; take this band's rows
        ref_band = jax.lax.dynamic_slice_in_dim(ref, band * hb, hb, axis=0)
        pix_sum = jnp.sum((ref_band - img * 255.0) ** 2)
        mel, lap, mnc = losses_mod.mesh_regularizers(config, scene, verts3)
        reg = (config.weight_meshedge * mel
               + config.weight_laplacian * lap ** 2
               + config.weight_normalconsistency * mnc)
        return pix_sum, reg

    pix_sums, regs = jax.vmap(one)(batch.cam_idx, batch.frame_idx, batch.ref)
    n_px = config.resolution[0] * config.resolution[1]
    # regs are replicated across 'tile': divide by n_bands so the global
    # psum counts them once; divide by global batch size for the mean.
    local = (jnp.sum(pix_sums) / (batch_scale * n_px)
             + jnp.sum(regs) / (batch_scale * n_bands))
    # staging/temporal terms use this device's local frame batch; divide by
    # the tile replication so the psum counts each sample group once.
    extra = (losses_mod.staging_regularizers(config, params, batch.frame_idx,
                                             step)
             + losses_mod.temporal_smoothness(config, params,
                                              batch.frame_idx))
    dp_groups = batch_scale / batch.cam_idx.shape[0]
    return local + extra / (dp_groups * n_bands)


def make_sharded_train_step(config: FitConfig, scene: Scene, mesh: Mesh):
    """Build the pjit-ted multi-device train step.

    The global batch size must be divisible by frame_size * view_size.
    Returns fn(state, batch) -> (state, metrics); batch.ref is the
    full-frame reference for each sample (bands sliced on device).
    """
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_bands = sizes.get("tile", 1)
    dp = sizes.get("frame", 1) * sizes.get("view", 1)
    assert config.batch_size % dp == 0, (config.batch_size, dp)
    assert config.resolution[0] % max(n_bands, 1) == 0

    opt = state_mod.make_optimizer(config)

    def local_step(params, opt_state, step, batch):
        batch_scale = float(config.batch_size)
        loss, grads = jax.value_and_grad(
            lambda p: _local_loss(config, scene, p, batch, step,
                                  n_bands, batch_scale))(params)
        grads = jax.lax.psum(grads, AXES[:len(mesh.axis_names)])
        loss = jax.lax.psum(loss, AXES[:len(mesh.axis_names)])
        grads = state_mod.apply_corrective_gate(config, step, grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = state_mod.normalize_quaternions(params)
        return params, opt_state, loss

    axes = tuple(mesh.axis_names)
    batch_spec = Batch(cam_idx=P(("frame", "view")),
                       frame_idx=P(("frame", "view")),
                       ref=P(("frame", "view")))

    shard_fn = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), batch_spec),
        out_specs=(P(), P(), P()),
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
    """Place a global batch with its sample axis over ('frame','view')."""
    s = NamedSharding(mesh, P(("frame", "view")))
    return Batch(cam_idx=jax.device_put(batch.cam_idx, s),
                 frame_idx=jax.device_put(batch.frame_idx, s),
                 ref=jax.device_put(batch.ref, s))

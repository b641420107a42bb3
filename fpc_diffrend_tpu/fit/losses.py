"""Fit-loop loss assembly (photometric + mesh regularizers + staging terms).

Replicates the reference loss exactly (fit.py:579-595):

  loss = mean((ref - colour*255)^2)
       + weight_meshedge * mesh_edge_loss(mesh, meshedge_target)
       + weight_laplacian * laplacian_smoothing(mesh)^2
       + weight_normalconsistency * normal_consistency(mesh)
       [+ mean(corrective_deformations^2)  if regularize_correctives,
          combined mode, second half of training]
       [+ mean(prior_activations^2)        if regularize_prior, prior mode]
"""

from __future__ import annotations

import jax.numpy as jnp

from fpc_diffrend_tpu.fit.config import FitConfig
from fpc_diffrend_tpu.fit.scene import Scene
from fpc_diffrend_tpu.models import blendshape
from fpc_diffrend_tpu.ops import mesh_ops

Array = jnp.ndarray


def photometric_loss(ref: Array, colour: Array) -> Array:
    """L2 in 8-bit units: mean((ref - colour*255)^2) (fit.py:579)."""
    return jnp.mean((ref - colour * 255.0) ** 2)


def mesh_regularizers(config: FitConfig, scene: Scene, verts3: Array):
    """(edge, laplacian, normal-consistency) terms for one mesh."""
    mel = mesh_ops.mesh_edge_loss(verts3, scene.edges, config.meshedge_target)
    lap = mesh_ops.mesh_laplacian_smoothing(
        verts3, scene.neighbor_src, scene.neighbor_dst, scene.degree)
    mnc = mesh_ops.mesh_normal_consistency(
        verts3, scene.faces, scene.edge_face_pairs)
    return mel, lap, mnc


def temporal_smoothness(config: FitConfig, params: dict, frame_idx) -> Array:
    """L2 penalty on pose deltas between each sampled frame and its
    predecessor (BASELINE.json config 3: multi-frame sequences with
    temporal smoothness; new capability, no reference equivalent).

    Uses the per-frame pose tensors directly, so with frame-sharded
    multi-host training only the one-neighbor halo couples shards.
    """
    if config.weight_temporal == 0.0:
        return jnp.float32(0.0)
    prev = jnp.maximum(frame_idx - 1, 0)
    dt = params["per_frame_t"][frame_idx] - params["per_frame_t"][prev]
    dq = params["per_frame_q"][frame_idx] - params["per_frame_q"][prev]
    gate = (frame_idx > 0).astype(jnp.float32)
    per = (jnp.sum(dt * dt, axis=-1) + jnp.sum(dq * dq, axis=-1)) * gate
    return config.weight_temporal * jnp.mean(per)


def staging_regularizers(config: FitConfig, params: dict, frame_idx, step):
    """Optional L2 terms on correctives / prior activations (fit.py:584-595)."""
    extra = jnp.float32(0.0)
    if config.regularize_correctives and config.mode == "combined":
        deform = blendshape.free_deltas(params["m1"], params["m2"],
                                        params["m3"], frame_idx)
        gate = (step > config.max_iter // 2).astype(jnp.float32)
        extra = extra + gate * jnp.mean(deform ** 2)
    if config.regularize_prior and config.mode == "prior":
        act = blendshape.prior_activations(params["maps"],
                                           params["maps_intermediate"],
                                           frame_idx)
        extra = extra + jnp.mean(act ** 2)
    return extra

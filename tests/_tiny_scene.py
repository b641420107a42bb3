"""Shared tiny synthetic scene for multi-device / multi-process tests.

Deterministic by construction: every process that imports this builds the
identical scene, config, params and batch, so cross-process equality
checks are meaningful.
"""

import numpy as np
import jax.numpy as jnp

from fpc_diffrend_tpu.data import obj as objlib
from fpc_diffrend_tpu.fit import loop as fit_loop
from fpc_diffrend_tpu.fit import state as state_mod
from fpc_diffrend_tpu.fit.config import FitConfig
from fpc_diffrend_tpu.fit.scene import build_scene
from fpc_diffrend_tpu.models import camera

RES = (32, 32)
N_CAMS, N_FRAMES = 2, 4


def make_setup():
    verts = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                     np.float32) * 3.0
    mesh_d = objlib.MeshData(
        vertices=verts.reshape(-1),
        uv=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
        faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        fuv=np.array([[0, 1, 2], [0, 2, 3]], np.int32))
    proj = np.stack([camera.default_projection()] * N_CAMS)
    mv0 = camera.default_modelview(zoffset=-40)
    mv1 = camera.default_modelview(zoffset=-42) @ camera.rotate_y(0.2)
    scene = build_scene(mesh_d, proj, np.stack([mv0, mv1]))
    config = FitConfig(max_iter=100, lr_base=1e-4, lr_t=1e-3, lr_q=1e-5,
                       resolution=RES, texshape=(16, 16, 1), mode="free",
                       cam_idxs=(0, 1), batch_size=8, raster_impl="scan",
                       weight_laplacian=10.0, log_interval=0)
    yy, xx = np.meshgrid(np.linspace(-1, 1, 16), np.linspace(-1, 1, 16),
                         indexing="ij")
    tex = (0.3 + 0.6 * np.exp(-(xx ** 2 + yy ** 2) / 0.4)
           ).astype(np.float32)[..., None]
    params = state_mod.init_params(config, N_FRAMES, scene.v_base.shape[0],
                                   scene.deltas.shape[1], tex, N_CAMS)
    return scene, config, params


def make_batch(config, scene, params):
    """Deterministic batch whose refs are renders of a perturbed pose."""
    rng = np.random.default_rng(1)
    n = config.batch_size
    cam = jnp.asarray(rng.integers(0, N_CAMS, n).astype(np.int32))
    frame = jnp.asarray(rng.integers(0, N_FRAMES, n).astype(np.int32))
    ref_params = dict(params)
    ref_params["per_frame_t"] = jnp.asarray(
        rng.normal(0, 0.1, (N_FRAMES, 3)).astype(np.float32))
    refs = []
    for c, f in zip(np.asarray(cam), np.asarray(frame)):
        img, _ = fit_loop.render_sample(config, scene, ref_params,
                                        jnp.int32(c), jnp.int32(f))
        refs.append(np.asarray(img[..., 0]))
    ref = jnp.asarray(np.stack(refs))[..., None] * 255.0
    return fit_loop.Batch(cam_idx=cam, frame_idx=frame, ref=ref)

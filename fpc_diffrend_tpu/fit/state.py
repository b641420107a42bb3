"""Learned parameters and the multi-group Adam optimizer.

Replicates the reference's 10-param-group Adam with per-group learning
rates and the shared exponential LR ramp ``lr_base * lr_ramp^(it/max_iter)``
(reference fit.py:493-505), as one optax ``multi_transform``. Parameter
shapes follow fit.py:439-463.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
import optax

from fpc_diffrend_tpu.fit.config import FitConfig
from fpc_diffrend_tpu.models import blendshape


class TrainState(NamedTuple):
    step: jnp.ndarray            # scalar int32
    params: dict                 # name -> array
    opt_state: optax.OptState


def init_params(config: FitConfig, n_frames: int, n_vertices_x3: int,
                n_blendshapes: int, tex_init: np.ndarray,
                n_cameras: int = 9) -> dict:
    """Initial parameter pytree (reference fit.py:439-463).

    All modes carry all parameters (unused ones receive zero gradients),
    which keeps the train step's structure static across modes.
    """
    m1, m2, m3 = blendshape.setup_dataset_free(n_frames, n_vertices_x3)
    q0 = np.zeros((n_cameras, 4), np.float32)
    q0[:, 3] = 1.0
    qf = np.zeros((n_frames, 4), np.float32)
    qf[:, 3] = 1.0
    return {
        "m1": jnp.asarray(m1),
        "m2": jnp.asarray(m2),
        "m3": jnp.asarray(m3),
        "maps": jnp.zeros((n_frames, n_frames), jnp.float32),
        "maps_intermediate": jnp.asarray(
            np.eye(n_blendshapes, n_frames, dtype=np.float32)),
        "t_opt": jnp.zeros((n_cameras, 3), jnp.float32),
        "q_opt": jnp.asarray(q0),
        "per_frame_t": jnp.zeros((n_frames, 3), jnp.float32),
        "per_frame_q": jnp.asarray(qf),
        "tex": jnp.asarray(tex_init, jnp.float32),
    }


def make_optimizer(config: FitConfig) -> optax.GradientTransformation:
    """Multi-group Adam matching reference fit.py:493-505.

    Group LRs: m1/m2/m3 at ``corrective_lr`` (lr_base, or 0.1x in combined
    mode, fit.py:480), maps/maps_intermediate at lr_base, pose params at
    lr_t/lr_q, tex at lr_base*lr_tex_coef; all scaled by
    ``lr_ramp ** (step / max_iter)`` (the LambdaLR at fit.py:503-505).
    """
    corrective_lr = config.lr_base * (0.1 if config.mode == "combined" else 1.0)

    def ramp(step):
        return config.lr_ramp ** (step / config.max_iter)

    def adam_group(lr):
        return optax.chain(
            optax.scale_by_adam(),
            optax.scale_by_schedule(lambda s: lr * ramp(s)),
            optax.scale(-1.0),
        )

    labels = {
        "m1": "corrective", "m2": "corrective", "m3": "corrective",
        "maps": "rig", "maps_intermediate": "rig",
        "t_opt": "trans", "per_frame_t": "trans",
        "q_opt": "quat", "per_frame_q": "quat",
        "tex": "tex",
    }
    return optax.multi_transform(
        {
            "corrective": adam_group(corrective_lr),
            "rig": adam_group(config.lr_base),
            "trans": adam_group(config.lr_t),
            "quat": adam_group(config.lr_q),
            "tex": adam_group(config.lr_base * config.lr_tex_coef),
        },
        labels,
    )


def init_state(config: FitConfig, params: dict) -> TrainState:
    opt = make_optimizer(config)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt.init(params))


def normalize_quaternions(params: dict) -> dict:
    """Post-step unit renormalization of the pose quaternions.

    The reference divides each whole tensor by its *global* Frobenius norm
    (fit.py:616-618), which for 9 cameras shrinks every quaternion to norm
    ~1/3 — clearly intended as per-quaternion normalization. We normalize
    per row (the evident intent; documented deviation).
    """
    out = dict(params)
    for k in ("q_opt", "per_frame_q"):
        q = out[k]
        # Epsilon guard: a zero quaternion (possible after a pathological
        # update) must not NaN the whole fit; it renormalizes to zero and
        # rigid_from_pose treats it as identity-scale rotation garbage for
        # one step instead of poisoning every parameter.
        norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
        out[k] = q / jnp.maximum(norm, 1e-12)
    return out


def corrective_gate(config: FitConfig, step) -> jnp.ndarray:
    """1.0 when the learned correctives (m1/m2/m3) may update.

    Combined mode freezes them for the first half of training
    (requires_grad flip at fit.py:603-607); free mode always trains them;
    prior mode never uses them.
    """
    if config.mode == "combined":
        return (step > config.max_iter // 2).astype(jnp.float32)
    return jnp.float32(1.0 if config.mode == "free" else 0.0)


def apply_corrective_gate(config: FitConfig, step, grads: dict) -> dict:
    gate = corrective_gate(config, step)
    out = dict(grads)
    for k in ("m1", "m2", "m3"):
        out[k] = grads[k] * gate
    return out

"""Checkpoint / resume for the fit loop (orbax-backed).

The reference has NO mid-run checkpointing — state is written once at the
end (fit.py:651-652; SURVEY.md §5). Here the full TrainState (parameters
AND optimizer state AND step) is checkpointed periodically and restorable,
so long fits survive preemption.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from fpc_diffrend_tpu.fit import state as state_mod


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, state: state_mod.TrainState) -> str:
    """Write a checkpoint for the state's current step; returns its path."""
    step = int(state.step)
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:09d}")
    _checkpointer().save(path, {
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
    }, force=True)
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


def restore_checkpoint(path: str, reference: state_mod.TrainState
                       ) -> state_mod.TrainState:
    """Restore a TrainState; ``reference`` provides the pytree structure."""
    import jax.numpy as jnp

    template = {
        "step": np.asarray(reference.step),
        "params": jax.device_get(reference.params),
        "opt_state": jax.device_get(reference.opt_state),
    }
    restored = _checkpointer().restore(path, item=template)
    return state_mod.TrainState(
        step=jnp.asarray(restored["step"]),
        params=jax.tree.map(jnp.asarray, restored["params"]),
        opt_state=jax.tree.map(jnp.asarray, restored["opt_state"]),
    )


def checkpoint_callback(ckpt_dir: str, interval: int):
    """A run_fit callback writing a checkpoint every ``interval`` steps."""
    def cb(i, state, metrics):
        if interval and i and i % interval == 0:
            save_checkpoint(ckpt_dir, state)
    return cb

"""Blendshape rig models: prior / free / combined vertex blending.

TPU-first reformulation of the reference's one-hot matmul chains
(reference fit.py:47-129). The reference selects the current frame by
multiplying learned matrices with a one-hot frame vector; multiplying a
matrix by a one-hot vector is a (differentiable) column gather, so here
frames are selected by integer index — identical values and identical
gradients to the learned parameters, but it batches cleanly over a
``frame_idx`` vector and keeps the per-step compute on the MXU as dense
matmuls of the full delta matrix.

Parameter shapes follow the reference exactly:
  deltas            (3V, B)   blendshape delta matrix (fit.py:219)
  maps              (F, F)    frame -> frame mapping (fit.py:223, learned)
  maps_intermediate (B, F)    frame -> blendshape activations (fit.py:227, learned)
  m1                (F, F)    free-mode mapping (fit.py:174, learned)
  m2                (F, F)    free-mode mapping (fit.py:175, learned)
  m3                (3V, F)   free-mode learned delta basis (fit.py:176, learned)
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def prior_activations(maps, maps_intermediate, frame_idx) -> Array:
    """Rig activation vector(s) for frame(s): maps_intermediate @ maps[:, f].

    Equivalent to the reference chain ``maps @ onehot`` then
    ``maps_intermediate @ mapped`` (fit.py:118-119), batched over frame_idx.

    :param maps: (F, F) learned frame mapping.
    :param maps_intermediate: (B, F) learned blendshape mapping.
    :param frame_idx: int32 scalar or (N,) frame indices.
    :return: (B,) or (N, B) activations.
    """
    cols = jnp.asarray(maps)[:, frame_idx]            # (F,) or (F, N)
    act = jnp.asarray(maps_intermediate) @ cols        # (B,) or (B, N)
    return jnp.moveaxis(act, -1, 0) if act.ndim == 2 else act


def blend_prior(v_base, deltas, maps, maps_intermediate, frame_idx) -> Array:
    """Rig-prior blending: v = v_base + deltas @ act(frame).

    Reference ``blend`` (fit.py:103-122), 'local'-dataset branch.

    :param v_base: (3V,) flat base vertex positions.
    :param deltas: (3V, B) blendshape deltas.
    :return: (3V,) or (N, 3V) blended flat positions.
    """
    act = prior_activations(maps, maps_intermediate, frame_idx)
    prod = jnp.einsum("vb,...b->...v", jnp.asarray(deltas), act)
    return jnp.asarray(v_base) + prod


def free_deltas(m1, m2, m3, frame_idx) -> Array:
    """Learned-basis deltas for frame(s): m3 @ m2 @ m1[:, f].

    Reference ``blend_free`` matmul chain (fit.py:58-60; Laine et al.
    decomposition).
    """
    cols = jnp.asarray(m1)[:, frame_idx]               # (F,) or (F, N)
    basis = jnp.asarray(m2) @ cols
    prod = jnp.asarray(m3) @ basis                     # (3V,) or (3V, N)
    return jnp.moveaxis(prod, -1, 0) if prod.ndim == 2 else prod


def blend_free(v_base, m1, m2, m3, frame_idx) -> Array:
    """Free-mode blending: v = v_base + m3 @ m2 @ m1[:, f] (fit.py:47-62)."""
    return jnp.asarray(v_base) + free_deltas(m1, m2, m3, frame_idx)


def blend_combined(v_base, m1, m2, m3, maps, maps_intermediate, deltas,
                   frame_idx, learned_coefficient=1.0) -> Array:
    """Prior + scaled learned correctives (reference fit.py:66-99).

    v = v_base + deltas @ act(f) + learned_coefficient * (m3 @ m2 @ m1[:, f])
    """
    act = prior_activations(maps, maps_intermediate, frame_idx)
    bl_res = jnp.einsum("vb,...b->...v", jnp.asarray(deltas), act)
    prod = free_deltas(m1, m2, m3, frame_idx)
    return jnp.asarray(v_base) + bl_res + learned_coefficient * prod


def blend(mode: str, params: dict, v_base, frame_idx,
          learned_coefficient: float = 1.0) -> Array:
    """Dispatch on mode string like the reference loop (fit.py:556-562)."""
    if mode == "prior":
        return blend_prior(v_base, params["deltas"], params["maps"],
                           params["maps_intermediate"], frame_idx)
    if mode == "free":
        return blend_free(v_base, params["m1"], params["m2"], params["m3"], frame_idx)
    if mode == "combined":
        return blend_combined(v_base, params["m1"], params["m2"], params["m3"],
                              params["maps"], params["maps_intermediate"],
                              params["deltas"], frame_idx, learned_coefficient)
    raise ValueError(f"invalid mode {mode!r}; expected prior|free|combined")


# ----------------------------------------------------------------------------
# Dataset / parameter setup (host-side; mirrors fit.py:166-230)
# ----------------------------------------------------------------------------

def setup_dataset_free(n_frames: int, n_vertices_x3: int):
    """Free-mode parameter init (reference setup_dataset_free, fit.py:166-178).

    m1, m2 identity (F, F); m3 zeros (3V, F).
    """
    m1 = np.eye(n_frames, dtype=np.float32)
    m2 = np.eye(n_frames, dtype=np.float32)
    m3 = np.zeros((n_vertices_x3, n_frames), dtype=np.float32)
    return m1, m2, m3


def load_blendshape_deltas(localblpath: str, v_basemesh: np.ndarray,
                           progress_every: int = 50) -> np.ndarray:
    """Load a directory of blendshape OBJs into a (3V, B) delta matrix.

    Reference setup_dataset (fit.py:183-230): each OBJ contributes one
    column of per-vertex deltas vs. the base mesh. Files are read in
    ``sorted(os.listdir)`` order for determinism (the reference relies on
    unspecified listdir order).
    """
    from fpc_diffrend_tpu.data.obj import load_obj_vertices

    objs = sorted(os.listdir(localblpath))
    n = len(objs)
    v_basemesh = np.asarray(v_basemesh, dtype=np.float32).reshape(-1)
    paths = [os.path.join(localblpath, name) for name in objs]

    # fast path: native threaded OBJ vertex parser (runtime/csrc)
    try:
        from fpc_diffrend_tpu.runtime import native

        if native.available():
            out = native.parse_obj_vertices(paths, v_basemesh.shape[0])
            out -= v_basemesh[None, :]
            return out.T.copy()
    except Exception:
        pass

    out = np.empty((n, v_basemesh.shape[0]), dtype=np.float32)
    for i, name in enumerate(objs):
        if progress_every and i % progress_every == 0:
            print(f"Blendshape {i}/{n}")
        verts = load_obj_vertices(paths[i])
        out[i] = verts - v_basemesh
    return out.T.copy()  # (3V, B)


def setup_dataset(localblpath: str, globalblpath: str, n_frames: int,
                  n_vertices_x3: int, v_basemesh: np.ndarray):
    """Prior-mode parameter init (reference setup_dataset, fit.py:183-230).

    Returns (deltas (3V, B), maps (F, F) zeros, maps_intermediate (B, F) eye).
    """
    if globalblpath:
        raise NotImplementedError(
            "global blendshape datasets are not implemented (parity with "
            "reference fit.py:196-197)")
    deltas = load_blendshape_deltas(localblpath, v_basemesh)
    n_meshes = deltas.shape[1]
    maps = np.zeros((n_frames, n_frames), dtype=np.float32)
    maps_intermediate = np.eye(n_meshes, n_frames, dtype=np.float32)
    return deltas, maps, maps_intermediate

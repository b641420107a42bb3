"""Static scene data for the fit loop (mesh, cameras, topology, rig).

Everything host-precomputed once per run and passed through the jitted
train step as a pytree — the TPU-native replacement for the reference's
per-iteration rebuilds (PyTorch3D Meshes at fit.py:578, numpy->GPU matrix
uploads at fit.py:541-546).
"""

from __future__ import annotations

import json
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from fpc_diffrend_tpu.data import obj as objlib
from fpc_diffrend_tpu.models import camera


class Scene(NamedTuple):
    """All non-learned arrays consumed by the train step."""

    v_base: jnp.ndarray           # (3V,) flat base vertex positions
    faces: jnp.ndarray            # (T, 3) int32
    uv: jnp.ndarray               # (U, 2)
    uv_idx: jnp.ndarray           # (T, 3) int32
    proj: jnp.ndarray             # (C, 4, 4) per-camera projections
    mv: jnp.ndarray               # (C, 4, 4) modelview (incl. y-offset)
    deltas: jnp.ndarray           # (3V, B) blendshape deltas (prior/combined)
    # topology (for regularizers + antialias)
    edges: jnp.ndarray
    neighbor_src: jnp.ndarray
    neighbor_dst: jnp.ndarray
    degree: jnp.ndarray
    edge_face_pairs: jnp.ndarray
    face_neighbors: jnp.ndarray
    # padded neighbor table for the scatter-free Laplacian (may be None
    # for Scenes built before this field existed)
    nbr_idx: jnp.ndarray | None = None
    nbr_mask: jnp.ndarray | None = None
    # corner-incidence tables (data.obj.corner_incidence) routing the
    # triangle-setup/aux gradient chain through gather-based backward
    # (rasterize_tpu.corner_gather) instead of XLA scatter-adds
    vtx_inc_idx: jnp.ndarray | None = None
    vtx_inc_mask: jnp.ndarray | None = None
    uv_inc_idx: jnp.ndarray | None = None
    uv_inc_mask: jnp.ndarray | None = None

    @property
    def inc(self):
        """((vtx_inc_idx, vtx_inc_mask), (uv_inc_idx, uv_inc_mask)) in
        the form ops.pipeline.render_from_clip's ``inc`` expects, or
        (None, None) entries when the tables are absent."""
        vtx = (None if self.vtx_inc_idx is None
               else (self.vtx_inc_idx, self.vtx_inc_mask))
        uvi = (None if self.uv_inc_idx is None
               else (self.uv_inc_idx, self.uv_inc_mask))
        return (vtx, uvi)

    @property
    def n_vertices(self) -> int:
        return self.v_base.shape[0] // 3

    @property
    def n_cameras(self) -> int:
        return self.proj.shape[0]


def load_calibration(calibpath: str, cam_names: list[str],
                     y_offset: float = 170.0):
    """Per-camera projection + modelview stacks from calibration.json.

    Mirrors fit.py:515-521 and 541-546, including the baked
    ``translate(0, 170, 0)`` y-offset (fit.py:545) folded into the
    modelview so the train step only multiplies learned transforms.

    :param cam_names: calibration keys in camera-index order.
    :return: (proj (C, 4, 4), mv (C, 4, 4)) numpy float32.
    """
    with open(calibpath) as f:
        calibs = json.load(f)
    projs, mvs = [], []
    trans = camera.translate(0.0, y_offset, 0.0)
    for name in cam_names:
        calib = calibs[name]
        intr = np.asarray(calib["intrinsic"], dtype=np.float32)
        rot = np.asarray(calib["rotation"], dtype=np.float32)
        t = np.asarray(calib["translation"], dtype=np.float32)
        projs.append(np.asarray(camera.intrinsic_to_projection(intr)))
        mvs.append(np.asarray(camera.extrinsic_to_modelview(rot, t)) @ trans)
    return np.stack(projs), np.stack(mvs)


def band_reorder(faces: np.ndarray, fuv: np.ndarray):
    """Spatially coherent face order: stable-sort faces by smallest vertex
    index. Rendering is order-independent (z-buffered; ties at exactly
    equal depth may resolve to a different winner), but the banded
    gradient fold (ops/pallas/raster_grad_tpu.banded_fold) needs triangle
    ids that are band-limited along the tile-sorted bin order — vertex
    indices are spatially coherent for authored meshes, so min-vertex
    order bounds each tile row's id band. Output OBJs inherit the
    reordered face lines (same geometry).

    :return: (faces, fuv) reordered consistently.
    """
    perm = np.argsort(np.asarray(faces).min(axis=1), kind="stable")
    return np.asarray(faces)[perm], np.asarray(fuv)[perm]


def build_scene(basemesh: objlib.MeshData, proj: np.ndarray, mv: np.ndarray,
                deltas: np.ndarray | None = None,
                reorder_faces: bool = True) -> Scene:
    """Assemble the Scene pytree from parsed inputs.

    :param reorder_faces: band-reorder faces for the banded gradient fold
        (see band_reorder); disable to keep the input face order exactly.
    """
    if reorder_faces:
        faces, fuv = band_reorder(basemesh.faces, basemesh.fuv)
        import dataclasses as _dc

        if _dc.is_dataclass(basemesh):
            basemesh = _dc.replace(basemesh, faces=faces, fuv=fuv)
        else:
            basemesh = type(basemesh)(vertices=basemesh.vertices,
                                      uv=basemesh.uv, faces=faces, fuv=fuv)
    topo = objlib.build_topology(basemesh.faces, basemesh.n_vertices)
    vtx_inc = objlib.corner_incidence(basemesh.faces, basemesh.n_vertices)
    uv_inc = objlib.corner_incidence(basemesh.fuv, basemesh.uv.shape[0])
    if deltas is None:
        deltas = np.zeros((basemesh.vertices.shape[0], 1), np.float32)
    return Scene(
        v_base=jnp.asarray(basemesh.vertices),
        faces=jnp.asarray(basemesh.faces),
        uv=jnp.asarray(basemesh.uv),
        uv_idx=jnp.asarray(basemesh.fuv),
        proj=jnp.asarray(proj),
        mv=jnp.asarray(mv),
        deltas=jnp.asarray(deltas),
        edges=jnp.asarray(topo.edges),
        neighbor_src=jnp.asarray(topo.neighbor_src),
        neighbor_dst=jnp.asarray(topo.neighbor_dst),
        degree=jnp.asarray(topo.degree),
        edge_face_pairs=jnp.asarray(topo.edge_face_pairs),
        face_neighbors=jnp.asarray(topo.face_neighbors),
        nbr_idx=jnp.asarray(topo.nbr_idx),
        nbr_mask=jnp.asarray(topo.nbr_mask),
        vtx_inc_idx=jnp.asarray(vtx_inc[0]),
        vtx_inc_mask=jnp.asarray(vtx_inc[1]),
        uv_inc_idx=jnp.asarray(uv_inc[0]),
        uv_inc_mask=jnp.asarray(uv_inc[1]),
    )

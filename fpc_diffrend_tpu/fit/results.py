"""Result saving: per-frame OBJs, texture, pose.json, config record.

Replicates the reference ``save()`` (fit.py:235-286): a ``result/``
directory with ``{i}.obj`` (verts + uv + faces from faces.txt if present),
``texture.png`` (vertically flipped, uint8), ``pose.json`` with
per-frame translation (F, 3) and rotation quaternions (F, 4), plus the
full config dump (fit.py:655-657).

Unlike the reference — which stores whatever mesh was last visited per
frame during training (fit.py:642) — the final meshes are recomputed for
every frame from the final parameters.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from fpc_diffrend_tpu.fit.config import FitConfig
from fpc_diffrend_tpu.fit.scene import Scene
from fpc_diffrend_tpu.models import blendshape


def final_meshes(config: FitConfig, scene: Scene, params: dict,
                 n_frames: int) -> np.ndarray:
    """(F, 3V) blended vertex positions for every frame."""
    frames = jnp.arange(n_frames, dtype=jnp.int32)
    out = blendshape.blend(config.mode, {**params, "deltas": scene.deltas},
                           scene.v_base, frames,
                           config.combined_corrective_coefficient)
    return np.asarray(out)


def save_results(config: FitConfig, scene: Scene, params: dict,
                 n_frames: int, out_dir: str | None = None) -> str:
    """Write the reference-format result directory; returns its path."""
    out_dir = out_dir or config.out_dir
    directory = os.path.join(out_dir, "result")
    os.makedirs(directory, exist_ok=True)

    meshes = final_meshes(config, scene, params, n_frames)
    uv = np.asarray(scene.uv)
    faces = np.asarray(scene.faces)
    fuv = np.asarray(scene.uv_idx)

    # faces.txt interop (reference fit.py:253-257): if present, face lines
    # are taken verbatim; else generated from the topology.
    faces_txt = os.path.join(directory, "faces.txt")
    if os.path.exists(faces_txt):
        with open(faces_txt) as f:
            face_lines = f.readlines()
    else:
        face_lines = [
            f"f {a+1}/{au+1} {b+1}/{bu+1} {c+1}/{cu+1}\n"
            for (a, b, c), (au, bu, cu) in zip(faces, fuv)]

    print(f"Saving {meshes.shape[0]} meshes...")
    for i, mesh in enumerate(meshes):
        with open(os.path.join(directory, f"{i}.obj"), "w") as f:
            v = mesh.reshape(-1, 3)
            for p in v:
                f.write(f"v {p[0]} {p[1]} {p[2]}\n")
            for u in uv:
                f.write(f"vt {u[0]} {u[1]}\n")
            f.writelines(face_lines)

    tex = np.asarray(params["tex"])
    from fpc_diffrend_tpu.utils.image import save_image
    save_image(os.path.join(directory, "texture.png"), np.flip(tex, 0))

    pose = {
        "translation": np.asarray(params["per_frame_t"]).tolist(),
        "rotation": np.asarray(params["per_frame_q"]).tolist(),
    }
    with open(os.path.join(directory, "pose.json"), "w") as f:
        json.dump(pose, f, separators=(",", ":"), sort_keys=True, indent=4)

    config.save(os.path.join(out_dir, "config.txt"))
    print("Everything saved successfully.")
    return directory


def load_pose(result_dir: str):
    """Read back pose.json -> (translation (F, 3), rotation (F, 4))."""
    with open(os.path.join(result_dir, "pose.json")) as f:
        d = json.load(f)
    return (np.asarray(d["translation"], np.float32),
            np.asarray(d["rotation"], np.float32))

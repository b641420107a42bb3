"""Smoke-test renderer: one calibrated view of a mesh to a PNG.

Parity with reference simplerender.py:16-79 — the repo's original "test":
load calibration + mesh + texture, render through one camera, flip
vertically, quantize, save. Validates data/camera conventions end to end.

Usage:
  python -m fpc_diffrend_tpu.tools.simple_render \
      --calib calibration.json --cam pod2texture --mesh basemesh.obj \
      [--tex texture.png] [--res 1600 1200] [--out test.png]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def simple_render(calibpath: str, cam: str, meshpath: str, texpath: str = "",
                  resolution=(1600, 1200), out: str = "test.png",
                  y_offset: float = 0.0, impl: str = "auto") -> np.ndarray:
    import jax.numpy as jnp

    from fpc_diffrend_tpu.data import obj as objlib
    from fpc_diffrend_tpu.models import camera
    from fpc_diffrend_tpu.ops.pipeline import render
    from fpc_diffrend_tpu.utils.image import save_image

    with open(calibpath) as f:
        calibs = json.load(f)
    calib = calibs[cam]
    intr = np.asarray(calib["intrinsic"], np.float32)
    rot = np.asarray(calib["rotation"], np.float32)
    trans = np.asarray(calib["translation"], np.float32)

    mesh = objlib.load_obj(meshpath)
    topo = objlib.build_topology(mesh.faces, mesh.n_vertices)

    if texpath:
        from PIL import Image

        tex = np.array(Image.open(texpath)).astype(np.float32) / 255.0
        if tex.ndim == 2:
            tex = tex[..., None]
        tex = np.flip(tex, 0).copy()
    else:
        tex = np.full((256, 256, 1), 0.7, np.float32)

    proj = np.asarray(camera.intrinsic_to_projection(intr))
    mv = np.asarray(camera.extrinsic_to_modelview(rot, trans))
    mvp = proj @ mv @ camera.translate(0.0, y_offset, 0.0)

    img = render(jnp.asarray(mvp), jnp.asarray(mesh.verts3),
                 jnp.asarray(mesh.faces), jnp.asarray(mesh.uv),
                 jnp.asarray(mesh.fuv), jnp.asarray(tex),
                 tuple(resolution), jnp.asarray(topo.face_neighbors),
                 impl=impl, background=0.0)

    # flip vertically (OpenGL row order) and quantize (simplerender.py:69-76)
    arr = np.asarray(img)[::-1]
    arr = np.clip(np.rint(arr * 255), 0, 255).astype(np.uint8)
    if out:
        save_image(out, arr)
    return arr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calib", required=True)
    ap.add_argument("--cam", default="pod2texture")
    ap.add_argument("--mesh", required=True)
    ap.add_argument("--tex", default="")
    ap.add_argument("--res", nargs=2, type=int, default=[1600, 1200])
    ap.add_argument("--out", default="test.png")
    ap.add_argument("--y-offset", type=float, default=0.0)
    args = ap.parse_args()
    simple_render(args.calib, args.cam, args.mesh, args.tex,
                  tuple(args.res), args.out, args.y_offset)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()

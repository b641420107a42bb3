"""Offline result renderers: re-render fitted sequences for inspection.

Parity with the reference's three result scripts:
  * render_result.py — one camera, side-by-side with reference frames
  * render_result_blended.py — 50/50 alpha blend over the reference
  * render_multicam.py — all-camera grid per frame

All three share one loop here; modes select the compositing. Output is a
sequence of PNGs and (if imageio+ffmpeg available) an mp4.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _load_result_mesh(result_dir: str, i: int) -> np.ndarray:
    """Read verts from a saved {i}.obj (render_result.py:117-122 fast path)."""
    verts = []
    with open(os.path.join(result_dir, f"{i}.obj")) as f:
        for line in f:
            if line.startswith("v "):
                verts.append(line[2:])
            elif line.startswith("vt "):
                break
    return np.array(" ".join(verts).split(), dtype=np.float32)


def _writer(path: str, fps: int = 30):
    try:
        import imageio

        return imageio.get_writer(path, mode="I", fps=fps, codec="libx264",
                                  bitrate="16M")
    except Exception as e:  # pragma: no cover - env-dependent
        print(f"mp4 writer unavailable ({e}); writing PNGs only")
        return None


def render_result(result_dir: str, calibpath: str, basemesh_path: str,
                  cams, n_frames: int, refdir: str = "",
                  resolution=(1600, 1200), mode: str = "side-by-side",
                  y_offset: float = 0.0, reproduce_pose: bool = True,
                  texpath: str = "", out_prefix: str = "result_comparison",
                  write_imgs: bool = False, impl: str = "auto"):
    """Re-render saved frames through calibrated cameras.

    :param cams: list of calibration keys; one -> single-cam modes,
        several -> grid mode (render_multicam.py behavior).
    :param mode: 'side-by-side' | 'blend' | 'grid' | 'plain'
    """
    import jax.numpy as jnp

    from fpc_diffrend_tpu.data import obj as objlib
    from fpc_diffrend_tpu.fit.results import load_pose
    from fpc_diffrend_tpu.models import camera, pose as pose_mod
    from fpc_diffrend_tpu.ops.pipeline import render
    from fpc_diffrend_tpu.utils.image import make_img, save_image

    with open(calibpath) as f:
        calibs = json.load(f)

    basemesh = objlib.load_obj(basemesh_path)
    topo = objlib.build_topology(basemesh.faces, basemesh.n_vertices)
    uv = jnp.asarray(basemesh.uv)
    uv_idx = jnp.asarray(basemesh.fuv)
    faces = jnp.asarray(basemesh.faces)
    fn = jnp.asarray(topo.face_neighbors)

    if not texpath:
        texpath = os.path.join(result_dir, "texture.png")
    from PIL import Image

    tex = np.array(Image.open(texpath)).astype(np.float32) / 255.0
    if tex.ndim == 2:
        tex = tex[..., None]
    tex = jnp.asarray(np.flip(tex, 0).copy())

    pose_t, pose_q = (load_pose(result_dir) if reproduce_pose
                      else (np.zeros((n_frames, 3), np.float32),
                            np.tile([0, 0, 0, 1.0], (n_frames, 1))))

    mvps = {}
    for cam in cams:
        calib = calibs[cam]
        proj = np.asarray(camera.intrinsic_to_projection(
            np.asarray(calib["intrinsic"], np.float32)))
        mv = np.asarray(camera.extrinsic_to_modelview(
            np.asarray(calib["rotation"], np.float32),
            np.asarray(calib["translation"], np.float32)))
        mvps[cam] = (proj, mv @ camera.translate(0.0, y_offset, 0.0))

    writer = _writer(os.path.join(result_dir, f"{out_prefix}_{mode}.mp4"))
    for i in range(n_frames):
        vtx = _load_result_mesh(result_dir, i)
        verts3 = jnp.asarray(vtx.reshape(-1, 3))
        rigid = np.asarray(pose_mod.rigid_from_pose(pose_t[i], pose_q[i]))

        renders = []
        for cam in cams:
            proj, t_mv = mvps[cam]
            mvp = jnp.asarray(proj @ (rigid @ t_mv))
            img = render(mvp, verts3, faces, uv, uv_idx, tex,
                         tuple(resolution), fn, impl=impl)
            img_np = np.asarray(img)[::-1]          # flip to image order
            renders.append(np.clip(img_np * 255.0, 0, 255))

        if mode == "grid":
            n = len(renders)
            ncols = int(np.ceil(np.sqrt(n)))
            while n % ncols:
                renders.append(np.zeros_like(renders[0]))
                n += 1
            frame = make_img(np.stack(renders), ncols=ncols)
        else:
            rendered = renders[0]
            if refdir:
                ref = np.array(Image.open(os.path.join(
                    refdir, f"{cams[0]}_{i:03d}.tif"))).astype(np.float32)
                ref = ref.reshape(ref.shape[0], ref.shape[1], 1)
            else:
                ref = np.zeros_like(rendered)
            if mode == "blend":
                frame = 0.5 * ref + 0.5 * rendered
            elif mode == "side-by-side":
                frame = make_img(np.stack([ref, rendered]))
            else:
                frame = rendered

        frame_u8 = np.clip(np.rint(frame), 0, 255).astype(np.uint8)
        if write_imgs:
            save_image(os.path.join(result_dir, f"frame{i}_{mode}.png"),
                       frame_u8)
        if writer is not None:
            writer.append_data(frame_u8)
        print(f"frame {i}/{n_frames}", flush=True)

    if writer is not None:
        writer.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--result-dir", required=True)
    ap.add_argument("--calib", required=True)
    ap.add_argument("--basemesh", required=True)
    ap.add_argument("--cams", nargs="+", default=["pod2primary"])
    ap.add_argument("--frames", type=int, required=True)
    ap.add_argument("--refdir", default="")
    ap.add_argument("--res", nargs=2, type=int, default=[1600, 1200])
    ap.add_argument("--mode", default="side-by-side",
                    choices=["side-by-side", "blend", "grid", "plain"])
    ap.add_argument("--y-offset", type=float, default=0.0)
    ap.add_argument("--no-pose", action="store_true")
    ap.add_argument("--tex", default="")
    ap.add_argument("--write-imgs", action="store_true")
    args = ap.parse_args()
    render_result(args.result_dir, args.calib, args.basemesh, args.cams,
                  args.frames, args.refdir, tuple(args.res), args.mode,
                  args.y_offset, not args.no_pose, args.tex,
                  write_imgs=args.write_imgs)


if __name__ == "__main__":
    main()

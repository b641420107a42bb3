"""End-to-end rig demo: 9-camera multi-view fit through the real file API.

Exercises the production path exactly as a user would (BASELINE.json
configs 1-2): builds a synthetic head mesh + blendshapes ON DISK, renders
a ground-truth take through the reference rig's real calibration
(9 cameras, OpenCV convention, f~7000px), writes the frames as TIFs in
the reference directory layout, then runs ``fit_take`` from those files
and reports pose/loss recovery.

Usage: python examples/fit_rig_synthetic.py [--cpu] [--res 256]
       [--steps 300] [--cams 9] [--workdir DIR]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

CALIB = os.environ.get("FPC_CALIB",
                       "/root/reference/calibration/calibration.json")


def head_mesh(n_ring=48, n_seg=32, radius=9.0):
    """A closed head-ish ellipsoid mesh with cylindrical uv unwrap."""
    import numpy as np

    verts, uvs = [], []
    for i in range(n_seg + 1):
        theta = np.pi * i / n_seg
        for j in range(n_ring):
            phi = 2 * np.pi * j / n_ring
            x = radius * np.sin(theta) * np.cos(phi)
            y = radius * 1.25 * np.cos(theta)
            z = radius * 0.9 * np.sin(theta) * np.sin(phi)
            # a nose-ish bump toward the cameras (-z in rig space)
            bump = 2.5 * np.exp(-((phi - 4.7) ** 2 * 4 +
                                  (theta - np.pi / 2) ** 2 * 8))
            z -= bump
            verts.append([x, y, z])
            uvs.append([j / (n_ring - 1 + 1e-6), i / n_seg])
    verts = np.asarray(verts, np.float32)
    uvs = np.clip(np.asarray(uvs, np.float32), 0.01, 0.99)

    faces = []
    for i in range(n_seg):
        for j in range(n_ring):
            a = i * n_ring + j
            b = i * n_ring + (j + 1) % n_ring
            c = (i + 1) * n_ring + j
            d = (i + 1) * n_ring + (j + 1) % n_ring
            faces.append([a, b, d])
            faces.append([a, d, c])
    import numpy as np2

    return verts, uvs, np2.asarray(faces, np2.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--cams", type=int, default=9)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8,
                    help="samples per step (1 = reference-style serial SGD)")
    ap.add_argument("--workdir", default="")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from PIL import Image

    from fpc_diffrend_tpu.data import obj as objlib
    from fpc_diffrend_tpu.fit import api as fit_api
    from fpc_diffrend_tpu.fit import loop as fit_loop
    from fpc_diffrend_tpu.fit import state as state_mod
    from fpc_diffrend_tpu.fit.config import FitConfig
    from fpc_diffrend_tpu.fit.scene import build_scene, load_calibration

    work = args.workdir or tempfile.mkdtemp(prefix="fpc_rig_")
    os.makedirs(work, exist_ok=True)
    print("workdir:", work, "| devices:", jax.devices(), flush=True)

    # ---- write the synthetic rig data to disk ----
    verts, uvs, faces = head_mesh()
    # rig head position: origin + y offset 170 handled by the pipeline
    basemesh_path = os.path.join(work, "basemesh.obj")
    objlib.save_obj(basemesh_path, verts, uvs, faces)

    bl_dir = os.path.join(work, "blendshapes")
    os.makedirs(bl_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    n_bl = 4
    for b in range(n_bl):
        # smooth localized deformations (jaw/brow-ish bumps)
        center = verts[rng.integers(0, len(verts))]
        d = np.exp(-np.sum((verts - center) ** 2, 1) / 8.0)[:, None]
        offset = d * rng.normal(scale=0.8, size=(1, 3)).astype(np.float32)
        objlib.save_obj(os.path.join(bl_dir, f"bs{b}.obj"),
                        verts + offset.astype(np.float32), uvs, faces)

    with open(CALIB) as f:
        calib_names = sorted(json.load(f).keys())[:args.cams]

    # ---- ground truth scene + take rendered with our own renderer ----
    res = (args.res, args.res)
    config = FitConfig(
        max_iter=args.steps, lr_base=5e-4, lr_t=8e-3, lr_q=1e-5,
        basemeshpath=basemesh_path, localblpath=bl_dir,
        imdir=os.path.join(work, "take"), calibpath=CALIB,
        out_dir=os.path.join(work, "out"), resolution=res,
        texshape=(256, 256, 1), mode="prior",
        cam_idxs=tuple(range(len(calib_names))),
        batch_size=args.batch, log_interval=max(1, args.steps // 10),
        weight_laplacian=10.0)
    import dataclasses
    config = dataclasses.replace(config, texpath=os.path.join(work, "texture.png"))

    # Note: intrinsics assume the real 1600x1200 sensor; rendering at a
    # reduced resolution scales the FOV via the principal-point ratio
    # (intrinsic_to_projection is resolution-free).
    proj, mv = load_calibration(CALIB, calib_names)
    basemesh = objlib.load_obj(basemesh_path)
    from fpc_diffrend_tpu.models.blendshape import setup_dataset

    deltas, _, _ = setup_dataset(bl_dir, "", args.frames,
                                 basemesh.vertices.shape[0],
                                 basemesh.vertices)
    scene = build_scene(basemesh, proj, mv, deltas)

    # GT texture kept below the reference's [0, 140] ingest clip
    yy, xx = np.meshgrid(np.linspace(-1, 1, 256), np.linspace(-1, 1, 256),
                         indexing="ij")
    tex = (0.18 + 0.2 * np.exp(-(xx ** 2 + yy ** 2) / 0.4)
           + 0.08 * np.sin(xx * 21) * np.sin(yy * 17)).astype(np.float32)
    tex = tex[..., None]
    # the fit starts from the captured texture (reference texpath workflow)
    from fpc_diffrend_tpu.utils.image import save_image
    texpath = os.path.join(work, "texture.png")
    save_image(texpath, np.flip(tex, 0))

    gt = state_mod.init_params(config, args.frames,
                               scene.v_base.shape[0], deltas.shape[1],
                               tex, scene.n_cameras)
    gt_t = (rng.normal(scale=0.4, size=(args.frames, 3))
            .astype(np.float32))
    gt_act = np.zeros((args.frames, args.frames), np.float32)
    gt["per_frame_t"] = jnp.asarray(gt_t)
    gt["maps"] = jnp.asarray(gt_act)

    print("rendering ground-truth take through the rig calibration...",
          flush=True)
    for ci, cam in enumerate(calib_names):
        camdir = os.path.join(config.imdir, f"take_{cam}")
        os.makedirs(camdir, exist_ok=True)
        for f in range(args.frames):
            img, _ = fit_loop.render_sample(config, scene, gt,
                                            jnp.int32(ci), jnp.int32(f))
            arr = np.asarray(img[..., 0])[::-1]  # store in image row order
            arr = np.clip(np.rint(arr * 255), 0, 139).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(camdir, f"take_{cam}_{f:02d}.tif"))
    cov = float((arr > 50).mean())  # above the 45-grey background
    print(f"take written ({len(calib_names)} cams x {args.frames} frames, "
          f"last-frame coverage {cov:.2f})", flush=True)

    # ---- run the public API end to end from the files ----
    state = fit_api.fit_take(config, resume=False)

    got_t = np.asarray(state.params["per_frame_t"])
    err0 = np.abs(gt_t).mean()
    err = np.abs(got_t - gt_t).mean()
    print(f"pose error: init {err0:.3f} -> {err:.3f}")
    result_dir = os.path.join(config.out_dir, "result")
    print("results:", sorted(os.listdir(result_dir)))
    ok = err < err0
    print("RECOVERING" if ok else "NOT RECOVERING")
    if not args.workdir:
        shutil.rmtree(work, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

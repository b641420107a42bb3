"""End-to-end demo: fit pose + texture of a textured cube from renders.

A self-contained miniature of the facial-capture loop (no data downloads):
ground truth = the cube rendered with known per-frame poses; the fit starts
from identity pose and a grey texture and recovers both. Prints the loss
curve and steps/s. Runs on whatever backend JAX selects (TPU in prod,
CPU with --cpu).

Usage:  python examples/fit_cube.py [--cpu] [--steps N] [--res R]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--impl", default="auto")
    ap.add_argument("--save-preview", default="")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from fpc_diffrend_tpu.data import obj as objlib
    from fpc_diffrend_tpu.fit import loop as fit_loop
    from fpc_diffrend_tpu.fit import state as state_mod
    from fpc_diffrend_tpu.fit.config import FitConfig
    from fpc_diffrend_tpu.fit.scene import build_scene
    from fpc_diffrend_tpu.models import camera

    print("devices:", jax.devices(), flush=True)

    # cube mesh
    verts = np.array([[x, y, z] for z in (-1, 1) for y in (-1, 1)
                      for x in (-1, 1)], np.float32) * 2.0
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
        [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
        np.int32)
    uv = (verts[:, :2] * 0.25 + 0.5).astype(np.float32)
    mesh = objlib.MeshData(vertices=verts.reshape(-1), uv=uv, faces=faces,
                           fuv=faces)

    n_cams, n_frames = 2, 2
    proj = np.stack([camera.default_projection()] * n_cams)
    mv0 = camera.default_modelview(zoffset=-28) @ camera.rotate_y(0.5) \
        @ camera.rotate_x(0.35)
    mv1 = camera.default_modelview(zoffset=-30) @ camera.rotate_y(-0.4) \
        @ camera.rotate_x(0.3)
    scene = build_scene(mesh, proj, np.stack([mv0, mv1]))

    config = FitConfig(
        max_iter=args.steps, lr_base=5e-3, lr_t=2e-3, lr_q=1e-5,
        resolution=(args.res, args.res), texshape=(32, 32, 1), mode="free",
        cam_idxs=tuple(range(n_cams)), batch_size=4, raster_impl=args.impl,
        log_interval=max(1, args.steps // 10))

    # ground truth: blob texture + small per-frame pose offsets
    yy, xx = np.meshgrid(np.linspace(-1, 1, 32), np.linspace(-1, 1, 32),
                         indexing="ij")
    tex = (0.3 + 0.6 * np.exp(-(xx ** 2 + yy ** 2) / 0.3)
           ).astype(np.float32)[..., None]
    gt = state_mod.init_params(config, n_frames, scene.v_base.shape[0],
                               scene.deltas.shape[1], tex, n_cams)
    gt_t = np.array([[0.2, -0.15, 0.0], [-0.18, 0.12, 0.0]], np.float32)
    gt["per_frame_t"] = jnp.asarray(gt_t)

    print("rendering ground truth take...", flush=True)
    frames = np.empty((n_cams, n_frames, args.res, args.res), np.uint8)
    for c in range(n_cams):
        for f in range(n_frames):
            img, _ = fit_loop.render_sample(config, scene, gt,
                                            jnp.int32(c), jnp.int32(f))
            frames[c, f] = np.clip(np.rint(np.asarray(img[..., 0]) * 255),
                                   0, 255).astype(np.uint8)
    frames_dev = jnp.asarray(frames)

    init = dict(gt)
    init["per_frame_t"] = jnp.zeros((n_frames, 3), jnp.float32)
    init["tex"] = jnp.full_like(gt["tex"], 0.5)
    state = state_mod.init_state(config, init)

    losses = []
    t_start = [None]

    def log(i, s, m):
        if t_start[0] is None:
            t_start[0] = time.time()
        losses.append(float(m["loss"]))
        print(f"step {i}: loss {losses[-1]:.2f}", flush=True)

    t0 = time.time()
    state = fit_loop.run_fit(config, scene, frames_dev, n_frames,
                             callbacks=[log], state=state)
    jax.block_until_ready(state.params)
    dt = time.time() - t0
    print(f"\n{args.steps} steps in {dt:.1f}s "
          f"({args.steps / dt:.1f} steps/s incl. compile)", flush=True)
    print("loss:", f"{losses[0]:.2f} -> {losses[-1]:.2f}")
    got_t = np.asarray(state.params["per_frame_t"])
    print("gt  t:", gt_t.round(3).tolist())
    print("fit t:", got_t.round(3).tolist())

    if args.save_preview:
        from fpc_diffrend_tpu.utils.image import save_image
        img, _ = fit_loop.render_sample(config, scene, state.params,
                                        jnp.int32(0), jnp.int32(0))
        save_image(args.save_preview, np.asarray(img)[::-1])
        print("preview saved to", args.save_preview)

    ok = losses[-1] < losses[0] * 0.5
    print("CONVERGED" if ok else "DID NOT CONVERGE")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

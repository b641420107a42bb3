"""Convergence validation of the fast gradient-precision knobs.

FPC_TEX_PREC=fast/fast2 and FPC_GRAD_PREC=fast drop selected backward
matmul contractions from HIGHEST (exact f32) to DEFAULT (single-pass
bf16) precision — ~4e-3 relative noise on the affected gradient terms,
measured -18.6 ms on the headline 1600x1200 step (BENCHMARKS.md round
4c). This study answers the question VERDICT round-4 #3 asks before the
defaults may flip: does that gradient noise change what a real fit
converges to?

Method: the 9-camera rig demo fit (real calibration, synthetic head
take — same scene as examples/convergence_study.py) runs once per
precision config FROM THE SAME INIT, each in a fresh child process
(the knobs are read at module import). Loss and pose-error curves land
in results/precision/<tag>.json; the parent writes a comparison table
and a CONVERGED/NOT CONVERGED verdict per config vs exact.

Usage: python examples/precision_study.py [--res 512] [--steps 3000]
       [--cams 9] [--out results/precision]
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "examples")

CALIB = os.environ.get("FPC_CALIB",
                       "/root/reference/calibration/calibration.json")

CONFIGS = {
    "exact": {},
    "fast": {"FPC_TEX_PREC": "fast", "FPC_GRAD_PREC": "fast"},
    "fast2": {"FPC_TEX_PREC": "fast2", "FPC_GRAD_PREC": "fast"},
}


def build_take(args):
    """Scene + ground-truth frames (identical across configs: seed 0)."""
    import numpy as np
    import jax.numpy as jnp

    from fit_rig_synthetic import head_mesh
    from fpc_diffrend_tpu.data import obj as objlib
    from fpc_diffrend_tpu.fit import loop as fit_loop
    from fpc_diffrend_tpu.fit import state as state_mod
    from fpc_diffrend_tpu.fit.config import FitConfig
    from fpc_diffrend_tpu.fit.scene import build_scene, load_calibration

    rng = np.random.default_rng(0)
    verts, uvs, faces = head_mesh()
    mesh = objlib.MeshData(vertices=verts.reshape(-1), uv=uvs, faces=faces,
                           fuv=faces)
    with open(CALIB) as f:
        calib_names = sorted(json.load(f).keys())[:args.cams]
    proj, mv = load_calibration(CALIB, calib_names)

    n_bl = 4
    deltas = np.zeros((verts.size, n_bl), np.float32)
    for b in range(n_bl):
        center = verts[rng.integers(0, len(verts))]
        d = np.exp(-np.sum((verts - center) ** 2, 1) / 8.0)[:, None]
        deltas[:, b] = (d * rng.normal(scale=0.8, size=(1, 3))
                        ).astype(np.float32).reshape(-1)
    scene = build_scene(mesh, proj, mv, jnp.asarray(deltas))

    res = (args.res, args.res)
    yy, xx = np.meshgrid(np.linspace(-1, 1, 256), np.linspace(-1, 1, 256),
                         indexing="ij")
    tex = (0.18 + 0.2 * np.exp(-(xx ** 2 + yy ** 2) / 0.4)
           + 0.08 * np.sin(xx * 21) * np.sin(yy * 17)).astype(
        np.float32)[..., None]

    config = FitConfig(
        max_iter=args.steps, lr_base=5e-4, lr_t=8e-3, lr_q=1e-5,
        resolution=res, texshape=(256, 256, 1), mode="prior",
        cam_idxs=tuple(range(len(calib_names))), batch_size=8,
        log_interval=max(1, args.steps // 40), seed=args.seed,
        steps_per_dispatch=25, weight_laplacian=10.0)

    gt = state_mod.init_params(config, args.frames, scene.v_base.shape[0],
                               n_bl, tex, scene.n_cameras)
    gt_t = rng.normal(scale=0.4, size=(args.frames, 3)).astype(np.float32)
    gt["per_frame_t"] = jnp.asarray(gt_t)
    frames = np.zeros((len(calib_names), args.frames, *res), np.uint8)
    for ci in range(len(calib_names)):
        for f in range(args.frames):
            img, _ = fit_loop.render_sample(config, scene, gt,
                                            jnp.int32(ci), jnp.int32(f))
            frames[ci, f] = np.clip(
                np.rint(np.asarray(img[..., 0]) * 255), 0, 139
            ).astype(np.uint8)
    return (config, scene, jnp.asarray(frames), gt_t, n_bl, tex)


def run_child(args, tag):
    """One fit under the current process's precision knobs."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fpc_diffrend_tpu.fit import api as fit_api
    from fpc_diffrend_tpu.fit import loop as fit_loop
    from fpc_diffrend_tpu.fit import state as state_mod

    config, scene, frames_u8, gt_t, n_bl, tex = build_take(args)
    if jax.default_backend() == "tpu":
        config = fit_api.autotune_caps(
            config, scene,
            state_mod.init_params(config, args.frames,
                                  scene.v_base.shape[0], n_bl, tex,
                                  scene.n_cameras))
    curve = []

    def cb(i, st, metrics):
        loss = float(metrics["loss"])
        perr = float(jnp.mean(jnp.abs(
            st.params["per_frame_t"] - jnp.asarray(gt_t))))
        curve.append({"step": i, "loss": loss, "pose_err": perr})
        if len(curve) % 8 == 1:
            print(f"  [{tag}] step {i} loss {loss:.3f} pose_err "
                  f"{perr:.4f}", flush=True)

    params = state_mod.init_params(config, args.frames,
                                   scene.v_base.shape[0], n_bl, tex,
                                   scene.n_cameras)
    state = state_mod.init_state(config, params)
    state = fit_loop.run_fit(config, scene, frames_u8, args.frames,
                             callbacks=[cb], state=state)
    final_perr = float(jnp.mean(jnp.abs(
        state.params["per_frame_t"] - jnp.asarray(gt_t))))
    out = {"tag": tag, "curve": curve, "final_pose_err": final_perr,
           "final_loss": curve[-1]["loss"] if curve else None,
           "init_pose_err": float(np.abs(gt_t).mean()),
           "env": {k: os.environ.get(k, "") for k in
                   ("FPC_TEX_PREC", "FPC_GRAD_PREC")}}
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, f"{tag}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"[{tag}] final loss {out['final_loss']:.3f} pose_err "
          f"{final_perr:.4f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--cams", type=int, default=9)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--out", default="results/precision")
    ap.add_argument("--child", default=None,
                    help="internal: run one config (tag) in-process")
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--seed", type=int, default=0,
                    help="fit sampling seed (a second exact run at a "
                         "different seed measures SGD trajectory noise — "
                         "the baseline the knob deltas are judged against)")
    args = ap.parse_args()

    if args.child:
        return run_child(args, args.child)

    tags = [t for t in args.configs.split(",") if t]
    for tag in tags:
        env = dict(os.environ)
        env.pop("FPC_TEX_PREC", None)
        env.pop("FPC_GRAD_PREC", None)
        env.update(CONFIGS[tag])
        cmd = [sys.executable, os.path.abspath(__file__), "--child", tag,
               "--res", str(args.res), "--steps", str(args.steps),
               "--cams", str(args.cams), "--frames", str(args.frames),
               "--out", args.out, "--seed", str(args.seed)]
        print(f"=== {tag}: {CONFIGS[tag]} ===", flush=True)
        r = subprocess.run(cmd, env=env, timeout=3600)
        if r.returncode != 0:
            print(f"{tag} FAILED rc={r.returncode}", flush=True)
            return 1

    runs = {}
    for tag in tags:
        with open(os.path.join(args.out, f"{tag}.json")) as f:
            runs[tag] = json.load(f)
    exact = runs["exact"]
    lines = ["# Precision-knob convergence study "
             f"({args.cams}-cam rig, {args.res}^2, {args.steps} steps, "
             "batch 8, same init)", "",
             "| config | final loss | final pose err | vs exact |",
             "|---|---|---|---|"]
    verdicts = {}
    for tag in tags:
        r = runs[tag]
        if tag == "exact":
            rel = "—"
            ok = True
        else:
            # pass = the knob run converges to the same place within a
            # tight budget of the exact run (gradient noise harmless)
            dl = (r["final_loss"] - exact["final_loss"]) / max(
                abs(exact["final_loss"]), 1e-9)
            dp = (r["final_pose_err"] - exact["final_pose_err"]) / max(
                exact["final_pose_err"], 1e-9)
            ok = dl <= 0.02 and dp <= 0.05
            rel = f"loss {dl:+.2%}, pose {dp:+.2%} -> " + (
                "OK" if ok else "WORSE")
        verdicts[tag] = ok
        lines.append(f"| {tag} | {r['final_loss']:.3f} | "
                     f"{r['final_pose_err']:.4f} | {rel} |")
    lines += ["", f"init pose err {exact['init_pose_err']:.4f}; "
              "full curves in <tag>.json."]
    md = os.path.join(args.out, "precision.md")
    with open(md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print("wrote", md)
    bad = [t for t, ok in verdicts.items() if not ok]
    print("ALL CONVERGED" if not bad else f"NOT CONVERGED: {bad}")
    return 0 if not bad else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Headline benchmark: the full fit step at the reference workload.

Times the complete jitted training step — blend -> pose -> fused
rasterize+interpolate (Pallas) -> texture (Pallas) -> antialias ->
photometric + regularizer losses -> backward (Pallas gradient kernels) ->
multi-group Adam — on a face-like connected mesh at the reference
resolution (1600x1200, ~30k triangles, 1024^2 texture), batched over
(camera, frame) samples.

Prints ONE JSON line:
  {"metric": ..., "value": <Mpix/s/chip fwd+bwd>, "unit": "Mpix/s",
   "vs_baseline": <value / BASELINE_MPIX_S>}

BASELINE_MPIX_S is a documented proxy for nvdiffrast-on-A100 fwd+bwd
throughput on a comparable scene (~500 Mpix/s from its published
per-frame millisecond timings; the reference repo publishes no numbers —
BASELINE.md).

Env knobs: FPC_BENCH_RES_H/W (1600/1200), FPC_BENCH_GRID (123 -> ~30k
tris), FPC_BENCH_BATCH (4), FPC_BENCH_ITERS (10), FPC_BENCH_CPU=1 to
force CPU (functional check only).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MPIX_S = 500.0


def build_workload():
    """Construct the headline workload from the FPC_BENCH_* env knobs.

    :return: dict with config, scene, state, frames_u8, batch, faces and
        the scalar knobs — shared by bench.py and tools/profile_stages.py
        so stage timings are taken on exactly the benched graph.
    """
    import jax
    if os.environ.get("FPC_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from fpc_diffrend_tpu.data import obj as objlib
    from fpc_diffrend_tpu.fit import loop as fit_loop
    from fpc_diffrend_tpu.fit import state as state_mod
    from fpc_diffrend_tpu.fit.config import FitConfig
    from fpc_diffrend_tpu.fit.scene import build_scene
    from fpc_diffrend_tpu.models import camera

    H = int(os.environ.get("FPC_BENCH_RES_H", "1600"))
    W = int(os.environ.get("FPC_BENCH_RES_W", "1200"))
    g = int(os.environ.get("FPC_BENCH_GRID", "123"))
    B = int(os.environ.get("FPC_BENCH_BATCH", "8"))
    impl = os.environ.get("FPC_BENCH_IMPL", "auto")
    texn = int(os.environ.get("FPC_BENCH_TEX", "1024"))
    # BASELINE.json config knobs: camera count, frame count, temporal
    # smoothness weight (config 3), mip path (reference main.py:27-28)
    n_cams = int(os.environ.get("FPC_BENCH_CAMS", "3"))
    n_frames = int(os.environ.get("FPC_BENCH_FRAMES", "4"))
    w_temporal = float(os.environ.get("FPC_BENCH_TEMPORAL", "0"))
    mip = int(os.environ.get("FPC_BENCH_MIP", "0"))

    rng = np.random.default_rng(0)

    # face-like scene: connected deformed-grid dome (coherent triangle ids,
    # one real silhouette) seen by narrow-FOV rig-style cameras
    lin = np.linspace(-10, 10, g, dtype=np.float32)
    gy, gx = np.meshgrid(lin, lin, indexing="ij")
    r2 = gx ** 2 + gy ** 2
    gz = (-6 * np.exp(-r2 / 60)
          + 0.1 * rng.normal(size=gx.shape)).astype(np.float32)
    verts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    idx = np.arange(g * g).reshape(g, g)
    quads = np.stack([idx[:-1, :-1], idx[:-1, 1:], idx[1:, :-1], idx[1:, 1:]],
                     axis=-1).reshape(-1, 4)
    faces = np.concatenate([quads[:, [0, 1, 3]], quads[:, [0, 3, 2]]],
                           axis=0).astype(np.int32)
    uv = ((verts[:, :2] / 10) * 0.5 + 0.5).astype(np.float32)
    mesh = objlib.MeshData(vertices=verts.reshape(-1), uv=uv, faces=faces,
                           fuv=faces)

    intr = np.array([[7000.0, 0, 600.0], [0, 7000.0, 800.0], [0, 0, 1]],
                    np.float32)
    # keep the face ~80% of frame at any resolution: f scales with H
    intr[0, 0] = intr[1, 1] = 7000.0 * H / 1600.0
    intr[0, 2] = W * 0.5
    intr[1, 2] = H * 0.5
    projs, mvs = [], []
    for c in range(n_cams):
        R = np.asarray(camera.rotate_y(0.3 * (c - 1)))[:3, :3]
        t = np.array([[0.0], [0.0], [100.0]], np.float32)
        projs.append(np.asarray(camera.intrinsic_to_projection(intr)))
        mvs.append(np.asarray(camera.extrinsic_to_modelview(R, t)))
    scene = build_scene(mesh, np.stack(projs), np.stack(mvs))

    config = FitConfig(max_iter=1000, resolution=(H, W),
                       texshape=(texn, texn, 1), mode="free",
                       cam_idxs=tuple(range(n_cams)), batch_size=B,
                       raster_impl=impl, weight_laplacian=1.0,
                       weight_temporal=w_temporal,
                       enable_mip=bool(mip), max_mip_level=6 if mip else 0,
                       log_interval=0)
    tex = rng.uniform(size=(texn, texn, 1)).astype(np.float32)
    params = state_mod.init_params(config, n_frames, scene.v_base.shape[0],
                                   scene.deltas.shape[1], tex,
                                   scene.n_cameras)
    if jax.default_backend() == "tpu":
        from fpc_diffrend_tpu.fit import api as fit_api

        scene = fit_api.autotune_scene(config, scene, params)
        config = fit_api.autotune_caps(config, scene, params)
    state = state_mod.init_state(config, params)
    frames_u8 = jnp.asarray(
        rng.integers(0, 140, size=(n_cams, n_frames, H, W)).astype(np.uint8))

    cam = jnp.asarray(rng.integers(0, n_cams, B).astype(np.int32))
    fr = jnp.asarray(rng.integers(0, n_frames, B).astype(np.int32))
    batch = fit_loop.Batch(cam, fr, fit_loop.decode_refs(frames_u8, cam, fr))
    return dict(config=config, scene=scene, state=state, params=params,
                frames_u8=frames_u8, batch=batch, faces=faces,
                H=H, W=W, B=B, n_frames=n_frames)


def _wait_for_backend(max_wait_s: float = 600.0) -> None:
    """Wait (up to ``max_wait_s``) until the TPU attach answers a probe.

    The single-chip remote attach has transient outages, and a failing
    remote compile from an earlier process can wedge it for several
    minutes — round 3's driver-run bench hit exactly that window and
    recorded a null result. A wedged attach can HANG rather than raise,
    so the probe runs in a subprocess with its own timeout; the parent
    process touches the backend only after a probe succeeds.
    """
    import subprocess
    import time as _time

    probe = ("import jax, jax.numpy as jnp; "
             "print(float(jnp.sum(jnp.arange(4.0))))")
    deadline = _time.time() + max_wait_s
    delay = 20.0
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe], timeout=90,
                               capture_output=True)
            if r.returncode == 0:
                return
            msg = r.stderr.decode(errors="replace").strip().splitlines()
            msg = msg[-1] if msg else "?"
        except subprocess.TimeoutExpired:
            msg = "probe hang (90s)"
        if _time.time() > deadline:
            print(f"# backend probe still failing: {msg}", file=sys.stderr,
                  flush=True)
            return  # let the real run produce the genuine error
        print(f"# backend probe failed ({msg}); retrying in {delay:.0f}s",
              file=sys.stderr, flush=True)
        _time.sleep(delay)
        delay = min(delay * 1.5, 60.0)


def _supervised_main() -> bool:
    """Run the benchmark in a subprocess with a timeout, retrying once.

    The remote-compile service can stall a compile indefinitely (and a
    killed compile can wedge the attach); running the real benchmark in
    a child process lets this wrapper enforce a deadline and retry after
    a cool-down instead of hanging the driver's round-end bench run.
    Returns True when a child succeeded (its output already went to our
    stdout/stderr).
    """
    import subprocess
    import time as _time

    env = dict(os.environ, FPC_BENCH_INNER="1")
    for attempt in range(2):
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, timeout=1500)
            if r.returncode == 0:
                return True
            print(f"# bench child failed rc={r.returncode} "
                  f"(attempt {attempt + 1})", file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"# bench child timed out after 1500s "
                  f"(attempt {attempt + 1}) — compile stall",
                  file=sys.stderr, flush=True)
        if attempt == 0:
            _time.sleep(300)
    return False


def main():
    import jax
    import jax.numpy as jnp

    if not os.environ.get("FPC_BENCH_CPU"):
        _wait_for_backend()
    wl = build_workload()
    config, scene, state = wl["config"], wl["scene"], wl["state"]
    frames_u8, batch, faces = wl["frames_u8"], wl["batch"], wl["faces"]
    H, W, B, n_frames = wl["H"], wl["W"], wl["B"], wl["n_frames"]
    iters = int(os.environ.get("FPC_BENCH_ITERS", "10"))

    from fpc_diffrend_tpu.fit import loop as fit_loop

    # The production loop scans k steps per host dispatch with on-device
    # sampling (fit_loop.train_steps); k > 1 removes the per-step remote
    # dispatch latency from the measurement, matching run_fit's
    # steps_per_dispatch mode. FPC_BENCH_DISPATCH=1 times the single-step
    # path instead.
    k = int(os.environ.get("FPC_BENCH_DISPATCH", "5"))
    key = jax.random.PRNGKey(0)

    def run(state, n):
        if k > 1:
            nonlocal key
            for _ in range(n):
                key, sub = jax.random.split(key)
                state, met = fit_loop.train_steps(config, scene, state,
                                                  frames_u8, sub, k,
                                                  n_frames)
            return state, jax.tree.map(lambda m: m[-1], met)
        for _ in range(n * 1):
            state, met = fit_loop.train_step(config, scene, state, batch)
        return state, met

    t0 = time.time()
    state, met = run(state, 1)
    _ = float(met["loss"])
    compile_s = time.time() - t0

    t0 = time.time()
    state, met = run(state, iters)
    _ = float(met["loss"])
    dt = (time.time() - t0) / (iters * k if k > 1 else iters)

    mpix = B * H * W / dt / 1e6
    fv_hour = 3600.0 / (H * W / (mpix * 1e6))
    result = {
        "metric": "Mpixels/s/chip fwd+bwd fit step "
                  f"({faces.shape[0]} tris, {H}x{W}, batch {B}, "
                  f"~{fv_hour:.0f} frame-views/hour)",
        "value": round(mpix, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix / BASELINE_MPIX_S, 3),
    }
    print(json.dumps(result))
    print(f"# step={dt*1e3:.1f}ms compile={compile_s:.0f}s "
          f"backend={jax.default_backend()}", file=sys.stderr)


if __name__ == "__main__":
    if os.environ.get("FPC_BENCH_CPU") or os.environ.get("FPC_BENCH_INNER"):
        main()
    elif not _supervised_main():
        sys.exit(1)

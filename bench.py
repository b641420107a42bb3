"""Headline benchmark: Mpixels/s/chip, forward+backward differentiable render.

Times the full differentiable pipeline — rasterize (Pallas visibility +
bary recompute), interpolate, texture, antialias, photometric loss — and
its backward pass (gradients w.r.t. vertex positions and texture) on a
face-like scene (many small triangles over most of the frame), the shape
of the reference workload (SURVEY.md §6: 1600x1200, ~tens of k triangles).

Prints ONE JSON line:
  {"metric": ..., "value": <Mpix/s/chip fwd+bwd>, "unit": "Mpix/s",
   "vs_baseline": <value / BASELINE_MPIX_S>}

BASELINE_MPIX_S is a documented proxy for nvdiffrast-on-A100 fwd+bwd
throughput on a comparable scene (~500 Mpix/s, from nvdiffrast's published
per-frame millisecond timings at 1-2 Mpix with gradients; the reference
repo itself publishes no numbers, BASELINE.md).

Env knobs: FPC_BENCH_RES (default 512), FPC_BENCH_TRIS (default 10000),
FPC_BENCH_ITERS (default 20), FPC_BENCH_IMPL (default auto).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MPIX_S = 500.0


def main():
    import jax
    if os.environ.get("FPC_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from fpc_diffrend_tpu.data import obj as objlib
    from fpc_diffrend_tpu.ops.pipeline import render

    res = int(os.environ.get("FPC_BENCH_RES", "512"))
    n_tris = int(os.environ.get("FPC_BENCH_TRIS", "10000"))
    iters = int(os.environ.get("FPC_BENCH_ITERS", "20"))
    impl = os.environ.get("FPC_BENCH_IMPL", "auto")

    rng = np.random.default_rng(0)

    # face-like scene: a connected deformed-grid dome (coherent triangle
    # ids, one real silhouette) covering most of the frame — the shape of
    # the capture workload, unlike random triangle soup.
    g = max(2, int(np.sqrt(n_tris / 2)) + 1)
    lin = np.linspace(-0.85, 0.85, g, dtype=np.float32)
    gy, gx = np.meshgrid(lin, lin, indexing="ij")
    r2 = gx ** 2 + gy ** 2
    gz = (-0.3 * np.exp(-r2 * 2)
          + 0.02 * rng.normal(size=gx.shape)).astype(np.float32)
    verts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    idx = np.arange(g * g).reshape(g, g)
    quads = np.stack([idx[:-1, :-1], idx[:-1, 1:], idx[1:, :-1], idx[1:, 1:]],
                     axis=-1).reshape(-1, 4)
    faces = np.concatenate([quads[:, [0, 1, 3]], quads[:, [0, 3, 2]]],
                           axis=0).astype(np.int32)
    n_tris = faces.shape[0]
    uv = ((verts[:, :2] / 0.85) * 0.5 + 0.5).astype(np.float32)
    topo = objlib.build_topology(faces, verts.shape[0])
    tex = rng.uniform(size=(1024, 1024, 1)).astype(np.float32)
    ref = rng.uniform(size=(res, res, 1)).astype(np.float32) * 255.0

    faces_j = jnp.asarray(faces)
    uv_j = jnp.asarray(uv)
    tex_j = jnp.asarray(tex)
    ref_j = jnp.asarray(ref)
    fn_j = jnp.asarray(topo.face_neighbors)
    mvp = jnp.eye(4)
    aa_pairs = 8 * (res + res)

    def loss(pos3, tex):
        img = render(mvp, pos3, faces_j, uv_j, faces_j, tex, (res, res),
                     fn_j, impl=impl, aa_max_pairs=aa_pairs)
        return jnp.mean((ref_j - img * 255.0) ** 2)

    pos3 = jnp.asarray(verts)

    vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

    t0 = time.time()
    out = vg(pos3, tex_j)
    sync = float(out[0])
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        out = vg(pos3, tex_j)
    _ = float(out[0])  # scalar fetch forces completion
    dt = (time.time() - t0) / iters

    mpix = res * res / dt / 1e6
    result = {
        "metric": "Mpixels/s/chip fwd+bwd differentiable render "
                  f"({n_tris} tris, {res}x{res}, impl={impl})",
        "value": round(mpix, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix / BASELINE_MPIX_S, 3),
    }
    print(json.dumps(result))
    print(f"# step={dt*1e3:.2f}ms compile={compile_s:.0f}s "
          f"backend={jax.default_backend()}", file=sys.stderr)


if __name__ == "__main__":
    main()

"""On-chip proof for the sharded production pipeline (VERDICT r4 #4).

Compiles and times `parallel.train.make_sharded_train_step` with
raster_impl="pallas" (the fused kernel pipeline, via the rewritten
spatial.render_band) on the REAL TPU with a (1, 1, 1) mesh — one chip,
so no collectives traffic, but the full shard_map + Pallas graph
compiles and executes on hardware, and its steady-state step time is
directly comparable to the unsharded jitted step on the identical
workload (bench.build_workload).

Usage: python tools/sharded_onchip.py [--iters 10]
Prints one JSON line: {"sharded_ms": ..., "unsharded_ms": ..., "ratio": ...}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--inner", action="store_true",
                    help="internal: run the measurement in-process")
    ap.add_argument("--timeout", type=int, default=2100)
    args = ap.parse_args()

    if not args.inner:
        # a stalled remote compile can only be abandoned by killing the
        # process — and killing an in-flight compile wedges the shared
        # attach less badly than killing the whole supervisor chain.
        # Mirror bench.py: child process with a deadline, one retry.
        import subprocess
        import time as _time

        cmd = [sys.executable, os.path.abspath(__file__), "--inner",
               "--iters", str(args.iters)]
        for attempt in range(2):
            try:
                r = subprocess.run(cmd, timeout=args.timeout)
                if r.returncode == 0:
                    return
                print(f"# child failed rc={r.returncode}", file=sys.stderr)
            except subprocess.TimeoutExpired:
                print(f"# child timed out after {args.timeout}s "
                      f"(attempt {attempt + 1}) — compile stall",
                      file=sys.stderr, flush=True)
            if attempt == 0:
                _time.sleep(300)
        sys.exit(1)

    import jax
    import jax.numpy as jnp

    import bench
    from fpc_diffrend_tpu.fit import loop as fit_loop
    from fpc_diffrend_tpu.fit import state as state_mod
    from fpc_diffrend_tpu.parallel import mesh as mesh_mod
    from fpc_diffrend_tpu.parallel import train as ptrain

    wl = bench.build_workload()
    config, scene, state, batch = (wl["config"], wl["scene"], wl["state"],
                                   wl["batch"])

    mesh = mesh_mod.make_mesh(("frame", "view", "tile"), (1, 1, 1),
                              jax.devices()[:1])
    sharded_step = ptrain.make_sharded_train_step(config, scene, mesh)
    sbatch = ptrain.shard_batch_for(mesh, batch)

    def timed(fn, st, tag):
        t0 = time.time()
        st, met = fn(st, sbatch if tag == "sharded" else batch)
        _ = float(met["loss"])
        compile_s = time.time() - t0
        t0 = time.time()
        for _i in range(args.iters):
            st, met = fn(st, sbatch if tag == "sharded" else batch)
        _ = float(met["loss"])
        dt = (time.time() - t0) / args.iters * 1e3
        print(f"# {tag}: step={dt:.1f}ms compile={compile_s:.0f}s",
              file=sys.stderr, flush=True)
        return dt

    st2 = state_mod.init_state(config, wl["params"])
    sharded_ms = timed(sharded_step, st2, "sharded")

    def unsharded(st, b):
        return fit_loop.train_step(config, scene, st, b)

    st3 = state_mod.init_state(config, wl["params"])
    unsharded_ms = timed(unsharded, st3, "unsharded")

    print(json.dumps({"sharded_ms": round(sharded_ms, 1),
                      "unsharded_ms": round(unsharded_ms, 1),
                      "ratio": round(sharded_ms / unsharded_ms, 3)}))


if __name__ == "__main__":
    main()

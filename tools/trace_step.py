"""Device-trace op profile of the headline fit step (ground truth).

Runs a few steps of the bench workload under jax.profiler.trace and
aggregates the chrome-trace device events into a per-op table — the
round-4b methodology that produced the BENCHMARKS.md op ranking
(isolated-graph subtraction profiles overstate stages by their own
dispatch/pad overheads; the trace is authoritative).

Usage: python tools/trace_step.py [--steps 3] [--top 30]
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--dir", default="/tmp/fpc_trace")
    args = ap.parse_args()

    import jax

    import bench
    from fpc_diffrend_tpu.fit import loop as fit_loop

    wl = bench.build_workload()
    config, scene, state, batch = (wl["config"], wl["scene"], wl["state"],
                                   wl["batch"])

    # warm up (compile outside the trace)
    state, met = fit_loop.train_step(config, scene, state, batch)
    _ = float(met["loss"])

    jax.profiler.start_trace(args.dir)
    for _ in range(args.steps):
        state, met = fit_loop.train_step(config, scene, state, batch)
    _ = float(met["loss"])
    jax.profiler.stop_trace()

    files = sorted(glob.glob(
        os.path.join(args.dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not files:
        print("no trace.json.gz produced", file=sys.stderr)
        return 1
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)

    events = tr.get("traceEvents", [])
    # device lanes: process names containing TPU; fall back to pids whose
    # events carry XLA op names
    dev_pids = set()
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))):
            dev_pids.add(e["pid"])
    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        agg[name] = agg.get(name, 0.0) + dur
        total += dur
    per_step = {k: v / args.steps / 1e3 for k, v in agg.items()}
    rows = sorted(per_step.items(), key=lambda kv: -kv[1])[:args.top]
    tot_ms = total / args.steps / 1e3
    print(f"# device total {tot_ms:.1f} ms/step over {args.steps} steps "
          f"({files[-1]})")
    print("| op | ms/step | share |")
    print("|---|---|---|")
    for name, ms in rows:
        print(f"| {name[:70]} | {ms:.2f} | {ms / tot_ms:.1%} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

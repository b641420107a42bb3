"""Run bench.py across the BASELINE.json workload configs.

BASELINE.json lists five configs; four are benchable on one chip (the
fifth is the multi-host sharded batch, exercised by dryrun_multichip and
tests/test_parallel.py instead). Each run shells out to bench.py with
the config's env knobs and collects its JSON line into
results/bench_matrix.json plus a markdown table for BENCHMARKS.md.

Usage: python tools/bench_matrix.py [--quick]
"""

import argparse
import json
import os
import subprocess
import sys

CONFIGS = [
    ("256sq-1cam", "single-frame single-camera 256^2 (BASELINE config 1)",
     {"FPC_BENCH_RES_H": "256", "FPC_BENCH_RES_W": "256",
      "FPC_BENCH_CAMS": "1", "FPC_BENCH_GRID": "63",
      "FPC_BENCH_TEX": "256"}),
    ("512sq-9cam", "single-frame 9-camera 512^2 shared texture (config 2)",
     {"FPC_BENCH_RES_H": "512", "FPC_BENCH_RES_W": "512",
      "FPC_BENCH_CAMS": "9", "FPC_BENCH_GRID": "87",
      "FPC_BENCH_TEX": "512"}),
    ("temporal-100f-2cam", "100-frame sequence, temporal smoothness, "
     "2 cameras (config 3)",
     {"FPC_BENCH_RES_H": "512", "FPC_BENCH_RES_W": "512",
      "FPC_BENCH_CAMS": "2", "FPC_BENCH_FRAMES": "100",
      "FPC_BENCH_TEMPORAL": "10.0", "FPC_BENCH_GRID": "87",
      "FPC_BENCH_TEX": "512"}),
    ("1600x1200-headline", "full-resolution 9-view sequence fit "
     "(config 4; the headline bench.py config)", {}),
    ("1600x1200-mip", "full-resolution with trilinear mipmap sampling "
     "(reference main.py:27-28 max_mip_level=6)",
     {"FPC_BENCH_MIP": "1"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="3 timing iters instead of 10")
    ap.add_argument("--only", default="",
                    help="comma-separated config name filter")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    only = [s for s in args.only.split(",") if s]
    rows = []
    for name, desc, env in CONFIGS:
        if only and name not in only:
            continue
        run_env = dict(os.environ, **env)
        if args.quick:
            run_env["FPC_BENCH_ITERS"] = "3"
        print(f"=== {name}: {desc}", flush=True)
        r = subprocess.run([sys.executable, "bench.py"], cwd=repo,
                           env=run_env, capture_output=True, text=True,
                           timeout=1800)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("{")), None)
        meta = next((ln for ln in r.stderr.splitlines()
                     if ln.startswith("# step=")), "")
        if line is None:
            print(f"  FAILED rc={r.returncode}:", r.stderr[-400:],
                  flush=True)
            rows.append({"config": name, "desc": desc, "error": True})
            continue
        rec = json.loads(line)
        rec.update({"config": name, "desc": desc, "meta": meta.strip()})
        rows.append(rec)
        print(f"  {rec['value']} {rec['unit']}  {meta.strip()}",
              flush=True)

    os.makedirs(os.path.join(repo, "results"), exist_ok=True)
    out = os.path.join(repo, "results", "bench_matrix.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print("\n| config | Mpix/s | step | vs baseline proxy |")
    print("|---|---|---|---|")
    for r in rows:
        if r.get("error"):
            print(f"| {r['config']} | FAILED | | |")
        else:
            step = r["meta"].split("step=")[-1].split(" ")[0] if r["meta"] else ""
            print(f"| {r['config']} | {r['value']} | {step} | "
                  f"{r.get('vs_baseline', '')} |")
    print("wrote", out)


if __name__ == "__main__":
    main()

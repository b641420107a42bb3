#!/bin/bash
# Round-4 on-chip A/B queue. Waits for the TPU attach to heal, then
# benches candidate configs SAFEST FIRST, each in its own subprocess
# with a timeout, appending results to results/ab_round4.log. Stops at
# the first timeout: a stalled remote compile wedges the single-chip
# attach for hours.
#
# Usage: bash tools/ab_round4.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p results
LOG=results/ab_round4.log
echo "=== ab_round4 $(date -u +%FT%TZ) ===" >> "$LOG"

# wait (up to ~5h) for the attach to answer a tiny op
for i in $(seq 1 60); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.arange(4.0))))" >/dev/null 2>&1; then
    echo "attach healthy after probe $i" | tee -a "$LOG"
    break
  fi
  if [ "$i" = 60 ]; then echo "attach never healed" | tee -a "$LOG"; exit 1; fi
  sleep 300
done

run() {
  local name="$1"; shift
  echo "--- $name ($*) $(date -u +%H:%M:%SZ)" | tee -a "$LOG"
  local out
  out=$(env FPC_BENCH_INNER=1 "$@" timeout 1200 python bench.py 2>&1)
  local rc=$?
  echo "$out" | grep -E '^\{|^# step|autotune' >> "$LOG"
  echo "$out" | tail -2
  if [ $rc -eq 124 ] || [ $rc -eq 143 ]; then
    echo "!!! $name TIMED OUT (stall class) — aborting queue" | tee -a "$LOG"
    exit 1
  fi
  if [ $rc -ne 0 ]; then
    echo "!!! $name failed rc=$rc" | tee -a "$LOG"
  fi
}

# 1. defaults — round-3-proven kernel structure (phase-A argmin,
#    global-list sort, hat texture, separate AA). The same graphs
#    compiled in 64 s when the remote-compile service was healthy, so a
#    timeout here means the SERVICE is degraded — retry patiently
#    rather than abort (each attempt is a fresh process; nothing is
#    cached across processes).
ok=""
for try in $(seq 1 8); do
  echo "--- baseline try $try $(date -u +%H:%M:%SZ)" | tee -a "$LOG"
  out=$(FPC_BENCH_INNER=1 timeout 1200 python bench.py 2>&1)
  rc=$?
  echo "$out" | grep -E '^\{|^# step|autotune' >> "$LOG"
  echo "$out" | tail -2
  if [ $rc -eq 0 ]; then ok=1; break; fi
  echo "baseline try $try rc=$rc; sleeping 600" | tee -a "$LOG"
  sleep 600
done
if [ -z "$ok" ]; then
  echo "baseline never completed — compile service down" | tee -a "$LOG"
  exit 1
fi
# 2. one candidate at a time, least exotic first
run phasea-slots FPC_PHASEA=slots
run tex-onehot FPC_TEX_IMPL=onehot
run aa-fuse FPC_AA_FUSE=1
run bin-pallas FPC_BIN_IMPL=pallas
run global-scatter FPC_GLOBAL_IMPL=scatter
# 3. combination of whatever got this far (inspect log before trusting)
run combo FPC_PHASEA=slots FPC_TEX_IMPL=onehot FPC_AA_FUSE=1 FPC_BIN_IMPL=pallas
echo "=== ab_round4 done ===" | tee -a "$LOG"

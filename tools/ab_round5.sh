#!/bin/bash
# Round-5 on-chip A/B queue with the TWO-CONTROL BRACKETING policy
# (VERDICT round-4 #9): every candidate run is preceded and followed by
# a default-config control so ±2 ms attach drift cannot decide a
# winner. Candidates run SAFEST FIRST, each in its own subprocess with
# a timeout; the queue aborts at the first timeout (a stalled remote
# compile wedges the single-chip attach for hours).
#
# Usage: bash tools/ab_round5.sh [candidate ...]
#   candidates: stack (FPC_BATCH=stack), default list below if none.
set -u
cd "$(dirname "$0")/.."
mkdir -p results
LOG=results/ab_round5.log
echo "=== ab_round5 $(date -u +%FT%TZ) ===" >> "$LOG"

probe() {
  for i in $(seq 1 60); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.arange(4.0))))" >/dev/null 2>&1; then
      return 0
    fi
    sleep 300
  done
  echo "attach never healed" | tee -a "$LOG"; exit 1
}

bench_once() {  # name env...
  local name="$1"; shift
  echo "--- $name $(date -u +%H:%M:%SZ)" | tee -a "$LOG"
  local out rc
  out=$(env FPC_BENCH_INNER=1 "$@" timeout 1500 python bench.py 2>&1)
  rc=$?
  echo "$out" | grep -E '^\{|^# step|autotune' | sed "s/^/[$name] /" >> "$LOG"
  echo "$out" | tail -2
  if [ $rc -eq 124 ] || [ $rc -eq 143 ]; then
    echo "!!! $name TIMED OUT (stall class) — aborting queue" | tee -a "$LOG"
    exit 1
  fi
  if [ $rc -ne 0 ]; then
    echo "!!! $name failed rc=$rc" | tee -a "$LOG"
  fi
  return 0
}

bracketed() {  # name env...
  local name="$1"; shift
  bench_once "control-pre-$name"
  bench_once "$name" "$@"
  bench_once "control-post-$name"
}

probe
if [ $# -gt 0 ]; then
  for cand in "$@"; do
    case "$cand" in
      stack) bracketed stack FPC_BATCH=stack ;;
      *) echo "unknown candidate $cand" | tee -a "$LOG" ;;
    esac
  done
else
  bracketed stack FPC_BATCH=stack
fi
echo "=== ab_round5 done ===" | tee -a "$LOG"

#!/bin/bash
# Round-5 on-chip A/B queue with the TWO-CONTROL BRACKETING policy
# (VERDICT round-4 #9): every candidate is bracketed by default-config
# controls so ±2 ms attach drift cannot decide a winner; adjacent
# candidates share the control between them (control, cand1, control,
# cand2, control, ...). Candidates run SAFEST FIRST, each in its own
# subprocess with a timeout; the queue aborts at the first timeout (a
# stalled remote compile wedges the single-chip attach for hours).
#
# NOTE the round-5 defaults already include FPC_TEX_PREC=fast2 +
# FPC_GRAD_PREC=fast (convergence-validated), so `prec-exact` is the
# REVERSE A/B quantifying what the flip bought.
#
# Usage: bash tools/ab_round5.sh [candidate ...]
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

run_cand() {  # name env...
  local name="$1"; shift
  bench_once "$name" "$@"
  bench_once "control"
}

probe
bench_once "control"
if [ $# -gt 0 ]; then CANDS=("$@"); else
  CANDS=(prec-exact gx14 stack stack-gx14)
fi
for cand in "${CANDS[@]}"; do
  case "$cand" in
    prec-exact) run_cand prec-exact FPC_TEX_PREC=exact FPC_GRAD_PREC=exact ;;
    gx14)       run_cand gx14 FPC_GX=14 ;;
    gx16)       run_cand gx16 FPC_GX=16 ;;
    stack)      run_cand stack FPC_BATCH=stack ;;
    stack-gx14) run_cand stack-gx14 FPC_BATCH=stack FPC_GX=14 ;;
    *) echo "unknown candidate $cand" | tee -a "$LOG" ;;
  esac
done
echo "=== ab_round5 done ===" | tee -a "$LOG"

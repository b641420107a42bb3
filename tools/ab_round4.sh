#!/bin/bash
# Round-4 on-chip A/B queue. Runs each candidate config of bench.py in
# its own subprocess with a timeout, SAFEST FIRST, appending one line per
# config to results/ab_round4.log. Stops at the first timeout: a stalled
# remote compile wedges the single-chip attach for everything after it.
#
# Usage: bash tools/ab_round4.sh [quick]
set -u
cd "$(dirname "$0")/.."
mkdir -p results
LOG=results/ab_round4.log
echo "=== ab_round4 $(date -u +%FT%TZ) ===" >> "$LOG"

run() {
  local name="$1"; shift
  echo "--- $name ($*)" | tee -a "$LOG"
  local out
  out=$(env "$@" timeout 600 python bench.py 2>&1)
  local rc=$?
  echo "$out" | grep -E '^\{|^# step' >> "$LOG"
  echo "$out" | tail -2
  if [ $rc -eq 124 ] || [ $rc -eq 143 ]; then
    echo "!!! $name TIMED OUT (stall class) — aborting queue" | tee -a "$LOG"
    exit 1
  fi
  if [ $rc -ne 0 ]; then
    echo "!!! $name failed rc=$rc" | tee -a "$LOG"
  fi
}

# 1. committed defaults (phase-A slot accumulators, dynamic mip loop)
run baseline FPC_DUMMY=0
# 2. one-hot texture X-selection (fwd fused sampler + bwd)
run tex-onehot FPC_TEX_IMPL=onehot
# 3. fused antialias (+ onehot texture)
run aa-fuse FPC_AA_FUSE=1 FPC_TEX_IMPL=onehot
# 4. improved Pallas counting-rank binning
run bin-pallas FPC_BIN_IMPL=pallas
# 5. best-guess combination
run combo FPC_TEX_IMPL=onehot FPC_AA_FUSE=1 FPC_BIN_IMPL=pallas
# 6. riskier: 16-row placement programs (compile-size probe)
run bin-pallas-16 FPC_BIN_IMPL=pallas FPC_PLACE_ROWS=16
echo "=== ab_round4 done ===" | tee -a "$LOG"

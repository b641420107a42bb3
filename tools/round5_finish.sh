#!/bin/bash
# Round-5 finishing queue: waits for the attach to heal, then runs the
# remaining on-chip work in increasing-risk order, logging everything.
#   1. bracketed A/B of the two new forward-kernel knobs
#   2. sharded (1,1,1)-mesh step timing (child-supervised)
#   3. device-trace op table at the new default step
#   4. BASELINE config matrix (quick mode)
#   5. mip config 5 (the known stall class — LAST)
set -u
cd "$(dirname "$0")/.."
mkdir -p results
LOG=results/ab_round5.log
echo "=== round5_finish $(date -u +%FT%TZ) ===" >> "$LOG"

for i in $(seq 1 90); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.arange(4.0))))" >/dev/null 2>&1; then
    echo "attach healthy (probe $i)" >> "$LOG"; break
  fi
  if [ "$i" = 90 ]; then echo "attach never healed" >> "$LOG"; exit 1; fi
  sleep 240
done

bench_once() {
  local name="$1"; shift
  echo "--- $name $(date -u +%H:%M:%SZ)" >> "$LOG"
  local out rc
  out=$(env FPC_BENCH_INNER=1 "$@" timeout 1500 python bench.py 2>&1)
  rc=$?
  echo "$out" | grep -E '^\{|^# step|autotune|face order' | sed "s/^/[$name] /" >> "$LOG"
  if [ $rc -eq 124 ] || [ $rc -eq 143 ]; then
    echo "!!! $name TIMED OUT — aborting queue" >> "$LOG"; exit 1
  fi
  [ $rc -ne 0 ] && echo "[$name] rc=$rc" >> "$LOG"
  return 0
}

# 1. knob A/B, shared-control bracketing
bench_once control
bench_once phaseb-skip FPC_PHASEB_SKIP=1
bench_once control
bench_once fwd-splits2 FPC_FWD_SPLITS=2
bench_once control
bench_once skip-splits2 FPC_PHASEB_SKIP=1 FPC_FWD_SPLITS=2
bench_once control

# 2. sharded step on the real chip (self-supervised child)
echo "--- sharded_onchip $(date -u +%H:%M:%SZ)" >> "$LOG"
timeout 4500 python tools/sharded_onchip.py >> "$LOG" 2>&1
echo "--- sharded_onchip rc=$? ---" >> "$LOG"

# 3. device trace at the default step
echo "--- trace_step $(date -u +%H:%M:%SZ)" >> "$LOG"
timeout 1500 python tools/trace_step.py --steps 3 > results/trace_round5.md 2>>"$LOG"
echo "--- trace_step rc=$? ---" >> "$LOG"

# 4. BASELINE config matrix (quick; mip row runs separately below)
echo "--- bench_matrix $(date -u +%H:%M:%SZ)" >> "$LOG"
timeout 6000 python tools/bench_matrix.py --quick \
  --only 256sq-1cam,512sq-9cam,temporal-100f-2cam,1600x1200-headline \
  >> "$LOG" 2>&1
echo "--- bench_matrix rc=$? ---" >> "$LOG"

# 5. mip config 5 LAST (stall class)
echo "--- mip-config5 $(date -u +%H:%M:%SZ)" >> "$LOG"
out=$(env FPC_BENCH_INNER=1 FPC_BENCH_MIP=1 timeout 1500 python bench.py 2>&1)
rc=$?
echo "$out" | grep -E '^\{|^# step|autotune' | sed 's/^/[mip-config5] /' >> "$LOG"
echo "--- mip-config5 rc=$rc ---" >> "$LOG"
echo "=== round5_finish done $(date -u +%FT%TZ) ===" >> "$LOG"

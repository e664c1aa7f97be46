#!/bin/bash
# Turnkey hardware-measurement session for round 4 (VERDICT r3 asks #1/#2/#6).
#
# Run this THE MOMENT the axon TPU tunnel returns (probe:
#   timeout 90 python -u -c "import jax; print(jax.devices())").
# Order matters: bench.py first populates /tmp/jax_comp_cache so the
# experiment scripts reuse executables instead of re-paying 60-100 s
# remote compiles per variant. Expect ~30-45 min total on a cold cache.
#
# Outputs land in /tmp/r4_hw/ as JSON/logs; fold the numbers into PERF.md
# ("Pending hardware measurements" section) and bench_history afterward.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/r4_hw
mkdir -p "$OUT"
stamp() { date -u +%FT%TZ; }

echo "[$(stamp)] 0/4 probe"
if ! timeout 120 python -u -c "import jax; print(jax.devices())" > "$OUT/probe.txt" 2>&1; then
  echo "tunnel still down — aborting (see $OUT/probe.txt)"; exit 1
fi
cat "$OUT/probe.txt"

echo "[$(stamp)] 1/4 bench.py all configs (headline + config1-5 + streaming-under-load + int4 step)"
python bench.py > "$OUT/bench.json" 2> "$OUT/bench.err" || true
tail -1 "$OUT/bench.json"

echo "[$(stamp)] 2/4 burst profile (drainer-thread verdict: harvest stall should be gone)"
timeout 900 python scripts/exp_burst_profile.py > "$OUT/burst_profile.txt" 2>&1 || true
tail -20 "$OUT/burst_profile.txt"

echo "[$(stamp)] 2b/4 INT4 verdict (split vs dequant vs int8 baseline; decision rule in the script)"
timeout 1800 python scripts/exp_int4_step.py > "$OUT/int4_step.txt" 2>&1 || true
tail -5 "$OUT/int4_step.txt"

echo "[$(stamp)] 3/4 slot scaling 8/16/32 (int8+KV, k=64 -> the ~400x device-bound estimate)"
SLOTS_LIST=8,16,32 Q=1 K=64 timeout 1800 python scripts/exp_slot_scaling.py > "$OUT/slot_scaling.txt" 2>&1 || true
tail -20 "$OUT/slot_scaling.txt"

echo "[$(stamp)] 4/4 second bench.py pass (fully warm cache; the history entry that counts)"
python bench.py > "$OUT/bench_warm.json" 2> "$OUT/bench_warm.err" || true
tail -1 "$OUT/bench_warm.json"

echo "[$(stamp)] done. Next: fold $OUT into PERF.md (empty the Pending section),"
echo "check bench_history.jsonl gate output, settle the INT4 verdict"
echo "(batched_step_ms_batch8_int4 vs 0.238 int8+KV), and commit."

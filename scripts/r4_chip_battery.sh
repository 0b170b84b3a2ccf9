#!/usr/bin/env bash
# Round-4 measurement battery on the real chip (run serially; ONE process
# may hold the TPU at a time).  Produces log/r4_battery.txt.
set -u
cd "$(dirname "$0")/.."
OUT=log/r4_battery.txt
echo "=== r4 chip battery $(date -u +%FT%TZ) ===" >> "$OUT"

run() {  # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "--- $name ($(date -u +%T)) ---" >> "$OUT"
  timeout "$to" "$@" >> "$OUT" 2>&1 || echo "FAILED: $name" >> "$OUT"
}

# 1. hardware kernel pins (pallas==lax on the real chip)
run selftest 1800 python scripts/tpu_selftest.py

# 2. env benchmark: fused kernel vs composable-API(auto) vs pure lax
run bench 1800 python bench.py

# 3. PPO breakdown at the headline shape — exact-SB3-stream path
#    (VERDICT item 3: target <= 33 ms/iter) with roofline attribution
run breakdown_exact 2400 python scripts/breakdown_bench.py \
  --update-impl pallas --repeats 10

# 4. same shape, shuffle-once fast path (the sustained-throughput row)
run breakdown_fast 2400 python scripts/breakdown_bench.py \
  --update-impl pallas-fast --repeats 10

# 5. CNN family (VERDICT item 6: target >= 500k transitions/s) at the
#    CNN preset's shape: 9x9, pool 30
run breakdown_cnn 3600 python scripts/breakdown_bench.py \
  --policy CNN --board-size 9 --n-envs 256 --buffer-size 30 \
  --minibatch-size 4096 --repeats 3 --superstep 4

# 6. single-chip basis + analytic multi-host prediction at 11x11
run scaling_predict 2400 python scripts/scaling_bench.py \
  --devices 1 --board-size 11 --envs-per-device 256 --iters 5 \
  --no-attribution --predict

echo "=== battery done $(date -u +%FT%TZ) ===" >> "$OUT"

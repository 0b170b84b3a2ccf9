#!/usr/bin/env bash
# Round-5 battery phase 3 (runs after r5_chip_battery2.sh):
#   1. CNN gathered-bank at 512 envs (the rollout is scan-overhead-bound
#      at 256; doubling envs amortizes the per-step launch glue) + the
#      512-env dense control;
#   2. a second true-n_envs=1 seed at 6x6@71M (the load-bearing
#      degradation claim moves from n=1 to n=2 at the true config).
set -u
cd "$(dirname "$0")/.."
OUT=log/r5_battery3.txt
echo "=== r5 battery3 waiting for battery2 $(date -u +%FT%TZ) ===" >> "$OUT"
for _ in $(seq 1 420); do
  grep -q "r5 battery2 done" log/r5_battery2.txt 2>/dev/null && break
  sleep 60
done
echo "=== r5 battery3 start $(date -u +%FT%TZ) ===" >> "$OUT"

for mode in gathered dense; do
  echo "--- breakdown CNN 512env cnn_bank_mode=$mode ($(date -u +%T)) ---" >> "$OUT"
  timeout 2400 python scripts/breakdown_bench.py --policy CNN --board-size 9 \
    --buffer-size 30 --n-envs 512 --n-steps 128 --minibatch-size 2048 \
    --cnn-bank-mode "$mode" --repeats 3 --superstep 4 >> "$OUT" 2>&1 \
    || echo "BREAKDOWN 512 $mode FAILED" >> "$OUT"
done

name=6x6_strict_1env71_s1
echo "--- ${name} train ($(date -u +%T)) ---" >> "$OUT"
timeout 10800 python scripts/train.py --experiment 6x6_strict_sb3 \
  --seed 1 --model-name "$name" --total-timesteps 71000000 \
  --n-envs 1 --iters-per-dispatch 4 >> "$OUT" 2>&1 \
  && timeout 900 python scripts/export_agent.py --cpu --experiment 6x6_strict_sb3 \
    --n-envs 1 --model-name "$name" --out "models/$name/agent_final" >> "$OUT" 2>&1 \
  || echo "TRAIN/EXPORT FAILED ${name}" >> "$OUT"
for which in final best; do
  if [ "$which" = final ]; then
    spec="orbax:models/$name/agent_final"
  else
    best=$(printf '%s\n' "models/$name"/best_* 2>/dev/null \
      | awk -F'best_' 'NF > 1 {print $NF, $0}' | sort -g | tail -1 \
      | cut -d' ' -f2-)
    [ -n "${best:-}" ] && [ -d "$best" ] || { echo "NO BEST ${name}" >> "$OUT"; continue; }
    spec="orbax:$best"
  fi
  echo "--- ${name} match($which) ($(date -u +%T)) ---" >> "$OUT"
  mres=$(timeout 1800 python scripts/match.py --board-size 6 --games 1024 \
    --a "$spec" --b "sb3:/root/reference/models/6x6_MLP-default_lr-0.0003_71" \
    2>> "$OUT") || { echo "MATCH FAILED ${name} $which" >> "$OUT"; continue; }
  echo "$mres" >> "$OUT"
  printf '{"run": "%s", "board": 6, "seed": 1, "total": 71000000, "n_envs": 1, "which": "%s", "ref": "6x6_MLP-default_lr-0.0003_71", "match": %s}\n' \
    "$name" "$which" "$(echo "$mres" | tail -1)" >> log/strict_sweep_r5.jsonl
done

echo "=== r5 battery3 done $(date -u +%FT%TZ) ===" >> "$OUT"

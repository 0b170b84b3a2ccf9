#!/usr/bin/env bash
# Round-5 post-sweep chip battery.  Waits for strict_sweep_r5.sh to finish
# (single-process chip discipline), then runs:
#   1. CNN family throughput: dense vs gathered opponent bank
#      (VERDICT r4 item 4 — the builder's own ~2x lever, now built);
#   2. symmetric-eval controlled rerun of the 118-vs-1 seat-specialist
#      seed (5x5 strict seed 2 @ 31M, VERDICT item 7);
#   3. tpu_selftest + headline bench with repeats (items 5/8).
set -u
cd "$(dirname "$0")/.."
OUT=log/r5_battery.txt
echo "=== r5 battery waiting for sweep $(date -u +%FT%TZ) ===" >> "$OUT"

for _ in $(seq 1 360); do
  grep -q "sweep r5 done" log/strict_sweep_r5.txt 2>/dev/null && break
  sleep 60
done
if ! grep -q "sweep r5 done" log/strict_sweep_r5.txt 2>/dev/null; then
  echo "SWEEP NEVER FINISHED — proceeding anyway $(date -u +%FT%TZ)" >> "$OUT"
fi
echo "=== r5 battery start $(date -u +%FT%TZ) ===" >> "$OUT"

# --- 1. CNN bank: dense vs gathered ---------------------------------------
for mode in dense gathered; do
  echo "--- breakdown CNN cnn_bank_mode=$mode ($(date -u +%T)) ---" >> "$OUT"
  timeout 2400 python scripts/breakdown_bench.py --policy CNN --board-size 9 \
    --buffer-size 30 --n-envs 256 --n-steps 128 --minibatch-size 1024 \
    --cnn-bank-mode "$mode" --repeats 3 --superstep 4 >> "$OUT" 2>&1 \
    || echo "BREAKDOWN $mode FAILED" >> "$OUT"
done

# --- 2. symmetric-eval rerun of the seat-specialist seed ------------------
name=5x5_strict_symeval_s2
echo "--- ${name} train ($(date -u +%T)) ---" >> "$OUT"
timeout 3600 python scripts/train.py --experiment 5x5_strict_sb3 \
  --seed 2 --model-name "$name" --total-timesteps 31000000 \
  --symmetric-eval --iters-per-dispatch 4 >> "$OUT" 2>&1 \
  || echo "TRAIN FAILED ${name}" >> "$OUT"
timeout 900 python scripts/export_agent.py --cpu --experiment 5x5_strict_sb3 \
  --model-name "$name" --out "models/$name/agent_final" >> "$OUT" 2>&1 \
  || echo "EXPORT FAILED ${name}" >> "$OUT"
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
  mres=$(timeout 1800 python scripts/match.py --board-size 5 --games 1024 \
    --a "$spec" --b "sb3:/root/reference/models/5x5_MLP-default_lr-0.0003_31" \
    2>> "$OUT") || { echo "MATCH FAILED ${name} $which" >> "$OUT"; continue; }
  echo "$mres" >> "$OUT"
  # SEPARATE log: this run deviates from the strict protocol (symmetric
  # eval), so it must NOT merge into the strict band jsonls the sweep
  # report averages
  printf '{"run": "%s", "board": 5, "seed": 2, "total": 31000000, "n_envs": 8, "protocol": "symmetric_eval", "which": "%s", "ref": "5x5_MLP-default_lr-0.0003_31", "match": %s}\n' \
    "$name" "$which" "$(echo "$mres" | tail -1)" >> log/symeval_r5.jsonl
done

# --- 3. selftest + headline bench with spread -----------------------------
echo "--- tpu_selftest ($(date -u +%T)) ---" >> "$OUT"
timeout 1800 python scripts/tpu_selftest.py >> "$OUT" 2>&1 \
  || echo "SELFTEST FAILED" >> "$OUT"
echo "--- bench.py --repeats 7 ($(date -u +%T)) ---" >> "$OUT"
timeout 1800 python bench.py --repeats 7 >> "$OUT" 2>&1 \
  || echo "BENCH FAILED" >> "$OUT"

echo "=== r5 battery done $(date -u +%FT%TZ) ===" >> "$OUT"

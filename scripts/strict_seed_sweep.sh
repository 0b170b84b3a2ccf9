#!/usr/bin/env bash
# Seed-variance sweep for the strict-SB3-protocol replication (BASELINE
# config 4: "match 5x5/6x6/7x7 SB3 curves within seed variance").  Runs the
# strict presets under additional PRNG seeds and matches each final agent
# against the budget-matched reference artifact; results append to
# log/strict_seed_sweep.txt.
set -u
cd "$(dirname "$0")/.."
OUT=log/strict_seed_sweep.txt
echo "=== strict seed sweep $(date -u +%FT%TZ) ===" >> "$OUT"

run_one() {  # board seed ref_zip
  local n=$1 seed=$2 ref=$3
  local name="${n}x${n}_strict_sb3_seed${seed}"
  echo "--- ${name} train ---" >> "$OUT"
  timeout 1200 python scripts/train.py --experiment "${n}x${n}_strict_sb3" \
    --seed "$seed" --model-name "$name" --iters-per-dispatch 4 \
    >> "$OUT" 2>&1 || { echo "TRAIN FAILED ${name}" >> "$OUT"; return 1; }
  local step agent="models/$name/agent_final"
  step=$(ls models/"$name" | grep -E '^[0-9]+$' | sort -n | tail -1)
  timeout 600 python scripts/export_agent.py --experiment "${n}x${n}_strict_sb3" \
    --model-name "$name" --step "$step" --out "$agent" >> "$OUT" 2>&1 \
    || { echo "EXPORT FAILED ${name}" >> "$OUT"; return 1; }
  echo "--- ${name} match vs ${ref} ---" >> "$OUT"
  timeout 600 python scripts/match.py --board-size "$n" --games 1024 \
    --a "orbax:$agent" --b "sb3:/root/reference/models/$ref" \
    >> "$OUT" 2>&1 || echo "MATCH FAILED ${name}" >> "$OUT"
}

for seed in 1 2; do
  run_one 6 "$seed" 6x6_buffer_64_10.zip
done
for seed in 1 2; do
  run_one 5 "$seed" 5x5_MLP-default_lr-0.0003_31
done
echo "=== sweep done $(date -u +%FT%TZ) ===" >> "$OUT"

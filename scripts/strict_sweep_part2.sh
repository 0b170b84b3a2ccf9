#!/usr/bin/env bash
# Continuation of strict_seed_sweep.sh for round 3: the 6x6 seed-2 rerun
# (its first attempt hit a wedged-tunnel hang) and the 7x7 @ 30M seeds.
# Exports run on CPU (--cpu): exporting params needs no TPU, and eager
# restore ops over the ~1s-RTT tunnel were costing ~11 min per export.
set -u
cd "$(dirname "$0")/.."
OUT=log/strict_seed_sweep.txt
JSONL=log/strict_sweep_results.jsonl
echo "=== strict sweep part 2 $(date -u +%FT%TZ) ===" >> "$OUT"

run_one() {  # board seed total ref_spec
  local n=$1 seed=$2 total=$3 ref=$4
  local name="${n}x${n}_strict_r3_s${seed}"
  echo "--- ${name} train ($(date -u +%T)) ---" >> "$OUT"
  timeout 4000 python scripts/train.py --experiment "${n}x${n}_strict_sb3" \
    --seed "$seed" --model-name "$name" --total-timesteps "$total" \
    --iters-per-dispatch 4 \
    >> "$OUT" 2>&1 || { echo "TRAIN FAILED ${name}" >> "$OUT"; return 1; }
  local agent="models/$name/agent_final"
  echo "--- ${name} export ($(date -u +%T)) ---" >> "$OUT"
  timeout 900 python scripts/export_agent.py --cpu --experiment "${n}x${n}_strict_sb3" \
    --model-name "$name" --out "$agent" >> "$OUT" 2>&1 \
    || { echo "EXPORT FAILED ${name}" >> "$OUT"; return 1; }
  echo "--- ${name} match vs ${ref} ($(date -u +%T)) ---" >> "$OUT"
  local mres
  mres=$(timeout 1200 python scripts/match.py --board-size "$n" --games 1024 \
    --a "orbax:$agent" --b "sb3:/root/reference/models/$ref" 2>> "$OUT") \
    || { echo "MATCH FAILED ${name}" >> "$OUT"; return 1; }
  echo "$mres" >> "$OUT"
  printf '{"run": "%s", "board": %s, "seed": %s, "total": %s, "ref": "%s", "match": %s}\n' \
    "$name" "$n" "$seed" "$total" "$ref" "$(echo "$mres" | tail -1)" >> "$JSONL"
}

run_one 6 2 10000000 6x6_buffer_64_10.zip
for seed in 0 1 2; do
  run_one 7 "$seed" 30000000 7x7_MLP-default_lr-0.0003_56
done
echo "=== part 2 done $(date -u +%FT%TZ) ===" >> "$OUT"

#!/usr/bin/env bash
# Seed-variance sweep for the strict-SB3-protocol replication (BASELINE
# config 4: "match 5x5/6x6/7x7 SB3 curves within seed variance").
#
# 3 seeds x {5x5 @ 10M, 6x6 @ 10M, 7x7 @ 30M} strict presets, each run
# matched 1024 games vs the closest-budget reference artifact.  Per-seed
# eval curves land in log/<run>/metrics.jsonl; match outcomes append to
# log/strict_seed_sweep.txt and log/strict_sweep_results.jsonl.
#
# Eval-seat note: these runs use the round-3 evaluator, which pins eval
# seats to the rollout envs' fixed seats under seat_mode="fixed_random"
# (the round-2 sweep redrew seats every eval; see VERDICT.md weakness 3).
set -u
cd "$(dirname "$0")/.."
OUT=log/strict_seed_sweep.txt
JSONL=log/strict_sweep_results.jsonl
echo "=== strict seed sweep (r3) $(date -u +%FT%TZ) ===" >> "$OUT"

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
  timeout 900 python scripts/export_agent.py --experiment "${n}x${n}_strict_sb3" \
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

for seed in 0 1 2; do
  run_one 6 "$seed" 10000000 6x6_buffer_64_10.zip
done
for seed in 0 1 2; do
  run_one 5 "$seed" 10000000 5x5_MLP-default_lr-0.0003_31
done
for seed in 0 1 2; do
  run_one 7 "$seed" 30000000 7x7_MLP-default_lr-0.0003_56
done
echo "=== sweep done $(date -u +%FT%TZ) ===" >> "$OUT"

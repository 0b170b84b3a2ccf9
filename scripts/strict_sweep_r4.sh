#!/usr/bin/env bash
# Round-4 strict-protocol sweep: BUDGET-MATCHED closure of BASELINE config 4
# (VERDICT r3 "Next round" items 1 and 2).
#
#   - 7x7: 3 seeds x 56M agent transitions vs 7x7_MLP-default_lr-0.0003_56
#     (the reference artifact's own budget; r3 ran only 30M and only 2 seeds
#     reached the log).
#   - 5x5: 3 seeds x 31M vs 5x5_MLP-default_lr-0.0003_31 (r3 ran 10M — a
#     3.1x handicap).
#
# Each seed is matched TWICE: the final agent (agent_final) and the
# protocol's own deliverable — the best-model snapshot the eval callback
# promotes (reference saves its best pool model every checkpoint period,
# EvaluationCallback.py:53-55; our trainer mirrors this as
# models/<run>/best_<score>/).  Checkpoint selection is a candidate
# explanation for the r3 7x7 seed band.
#
# Results append to log/strict_sweep_r4.jsonl with "which": final|best.
set -u
cd "$(dirname "$0")/.."
OUT=log/strict_sweep_r4.txt
JSONL=log/strict_sweep_r4.jsonl
echo "=== strict sweep r4 $(date -u +%FT%TZ) ===" >> "$OUT"

match_one() {  # name board seed total ref_spec which policy_spec
  local name=$1 n=$2 seed=$3 total=$4 ref=$5 which=$6 spec=$7
  echo "--- ${name} match(${which}) vs ${ref} ($(date -u +%T)) ---" >> "$OUT"
  local mres
  mres=$(timeout 1800 python scripts/match.py --board-size "$n" --games 1024 \
    --a "$spec" --b "sb3:/root/reference/models/$ref" 2>> "$OUT") \
    || { echo "MATCH FAILED ${name} ${which}" >> "$OUT"; return 1; }
  echo "$mres" >> "$OUT"
  printf '{"run": "%s", "board": %s, "seed": %s, "total": %s, "which": "%s", "ref": "%s", "match": %s}\n' \
    "$name" "$n" "$seed" "$total" "$which" "$ref" "$(echo "$mres" | tail -1)" >> "$JSONL"
}

run_one() {  # board seed total ref_spec
  local n=$1 seed=$2 total=$3 ref=$4
  local name="${n}x${n}_strict_r4_s${seed}"
  echo "--- ${name} train ($(date -u +%T)) ---" >> "$OUT"
  timeout 3600 python scripts/train.py --experiment "${n}x${n}_strict_sb3" \
    --seed "$seed" --model-name "$name" --total-timesteps "$total" \
    --iters-per-dispatch 4 \
    >> "$OUT" 2>&1 || { echo "TRAIN FAILED ${name}" >> "$OUT"; return 1; }
  local agent="models/$name/agent_final"
  echo "--- ${name} export ($(date -u +%T)) ---" >> "$OUT"
  timeout 900 python scripts/export_agent.py --cpu --experiment "${n}x${n}_strict_sb3" \
    --model-name "$name" --out "$agent" >> "$OUT" 2>&1 \
    || { echo "EXPORT FAILED ${name}" >> "$OUT"; return 1; }
  match_one "$name" "$n" "$seed" "$total" "$ref" final "orbax:$agent"
  # best-model snapshot = highest-score best_* params dir the trainer
  # saved; the score is everything after the LAST "best_" in the path
  # (run names themselves contain underscores, so field-based sort keys
  # would land on the wrong token)
  local best
  best=$(printf '%s\n' "models/$name"/best_* 2>/dev/null \
    | awk -F'best_' 'NF > 1 {print $NF, $0}' | sort -g | tail -1 \
    | cut -d' ' -f2-)
  if [ -n "${best:-}" ] && [ -d "$best" ]; then
    match_one "$name" "$n" "$seed" "$total" "$ref" best "orbax:$best"
  else
    echo "NO BEST SNAPSHOT ${name}" >> "$OUT"
  fi
}

for seed in 0 1 2; do
  run_one 7 "$seed" 56000000 7x7_MLP-default_lr-0.0003_56
done
for seed in 0 1 2; do
  run_one 5 "$seed" 31000000 5x5_MLP-default_lr-0.0003_31
done
echo "=== sweep r4 done $(date -u +%FT%TZ) ===" >> "$OUT"

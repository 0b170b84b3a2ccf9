#!/usr/bin/env bash
# Round-5 battery phase 2 (runs after r5_chip_battery.sh):
#   1. a second n_envs=1 seed at 6x6@10M (widen the true-config evidence);
#   2. the combined-mitigation run at the 71M budget: pool_score_decay +
#      symmetric_eval on 8 envs — the framework-recommended protocol vs
#      the reference's strongest artifact (logged as a deviation run,
#      NOT into the strict band jsonl).
set -u
cd "$(dirname "$0")/.."
OUT=log/r5_battery2.txt
echo "=== r5 battery2 waiting for battery1 $(date -u +%FT%TZ) ===" >> "$OUT"
for _ in $(seq 1 420); do
  grep -q "r5 battery done" log/r5_battery.txt 2>/dev/null && break
  sleep 60
done
echo "=== r5 battery2 start $(date -u +%FT%TZ) ===" >> "$OUT"

best_of() {
  printf '%s\n' "models/$1"/best_* 2>/dev/null \
    | awk -F'best_' 'NF > 1 {print $NF, $0}' | sort -g | tail -1 \
    | cut -d' ' -f2-
}

match_into() {  # jsonl row_prefix name board ref spec which
  local jsonl=$1 prefix=$2 name=$3 n=$4 ref=$5 spec=$6 which=$7
  echo "--- ${name} match(${which}) vs ${ref} ($(date -u +%T)) ---" >> "$OUT"
  local mres
  mres=$(timeout 1800 python scripts/match.py --board-size "$n" --games 1024 \
    --a "$spec" --b "sb3:/root/reference/models/$ref" 2>> "$OUT") \
    || { echo "MATCH FAILED ${name} ${which}" >> "$OUT"; return 1; }
  echo "$mres" >> "$OUT"
  printf '%s, "which": "%s", "ref": "%s", "match": %s}\n' \
    "$prefix" "$which" "$ref" "$(echo "$mres" | tail -1)" >> "$jsonl"
}

# --- 1. second 1-env seed at 10M -----------------------------------------
name=6x6_strict_1env_s1
echo "--- ${name} train ($(date -u +%T)) ---" >> "$OUT"
timeout 5400 python scripts/train.py --experiment 6x6_strict_sb3 \
  --seed 1 --model-name "$name" --total-timesteps 10000000 \
  --n-envs 1 --iters-per-dispatch 4 >> "$OUT" 2>&1 \
  && timeout 900 python scripts/export_agent.py --cpu --experiment 6x6_strict_sb3 \
    --n-envs 1 --model-name "$name" --out "models/$name/agent_final" >> "$OUT" 2>&1 \
  || echo "TRAIN/EXPORT FAILED ${name}" >> "$OUT"
pfx='{"run": "6x6_strict_1env_s1", "board": 6, "seed": 1, "total": 10000000, "n_envs": 1'
match_into log/strict_sweep_r5.jsonl "$pfx" "$name" 6 6x6_buffer_64_10.zip \
  "orbax:models/$name/agent_final" final
b=$(best_of "$name")
[ -n "${b:-}" ] && [ -d "$b" ] && match_into log/strict_sweep_r5.jsonl "$pfx" \
  "$name" 6 6x6_buffer_64_10.zip "orbax:$b" best

# --- 2. combined-mitigation 71M (deviation run) --------------------------
name=6x6_mitigated71_s1
echo "--- ${name} train ($(date -u +%T)) ---" >> "$OUT"
timeout 5400 python scripts/train.py --experiment 6x6_strict_sb3 \
  --seed 1 --model-name "$name" --total-timesteps 71000000 \
  --pool-score-decay 0.001 --symmetric-eval --iters-per-dispatch 4 \
  >> "$OUT" 2>&1 \
  && timeout 900 python scripts/export_agent.py --cpu --experiment 6x6_strict_sb3 \
    --model-name "$name" --out "models/$name/agent_final" >> "$OUT" 2>&1 \
  || echo "TRAIN/EXPORT FAILED ${name}" >> "$OUT"
pfx='{"run": "6x6_mitigated71_s1", "board": 6, "seed": 1, "total": 71000000, "n_envs": 8, "protocol": "decay+symmetric_eval"'
match_into log/symeval_r5.jsonl "$pfx" "$name" 6 6x6_MLP-default_lr-0.0003_71 \
  "orbax:models/$name/agent_final" final
b=$(best_of "$name")
[ -n "${b:-}" ] && [ -d "$b" ] && match_into log/symeval_r5.jsonl "$pfx" \
  "$name" 6 6x6_MLP-default_lr-0.0003_71 "orbax:$b" best

echo "=== r5 battery2 done $(date -u +%FT%TZ) ===" >> "$OUT"

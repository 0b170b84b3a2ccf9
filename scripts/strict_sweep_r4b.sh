#!/usr/bin/env bash
# Round-4b strict sweep: the LAST artifact row — 6x6 at the reference's
# strongest artifact budget (71M, `6x6_MLP-default_lr-0.0003_71`), 3 seeds,
# final + best-snapshot matches.  Also backfills best-snapshot matches for
# the round-3 6x6 @ 10M runs (r3 matched finals only).
set -u
cd "$(dirname "$0")/.."
OUT=log/strict_sweep_r4b.txt
JSONL=log/strict_sweep_r4b.jsonl
echo "=== strict sweep r4b $(date -u +%FT%TZ) ===" >> "$OUT"

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

best_of() {  # run-name -> path of highest-score best_* snapshot (or empty)
  printf '%s\n' "models/$1"/best_* 2>/dev/null \
    | awk -F'best_' 'NF > 1 {print $NF, $0}' | sort -g | tail -1 \
    | cut -d' ' -f2-
}

# --- backfill: r3 6x6 best-snapshot matches vs the 10M artifact ----------
for seed in 0 1 2; do
  name="6x6_strict_r3_s${seed}"
  best=$(best_of "$name")
  if [ -n "${best:-}" ] && [ -d "$best" ]; then
    match_one "$name" 6 "$seed" 10000000 6x6_buffer_64_10.zip best "orbax:$best"
  else
    echo "NO BEST SNAPSHOT ${name}" >> "$OUT"
  fi
done

# --- 6x6 @ 71M (the reference's strongest artifact, budget-matched) ------
run_one() {  # board seed total ref_spec
  local n=$1 seed=$2 total=$3 ref=$4
  local name="${n}x${n}_strict_r4b_s${seed}"
  echo "--- ${name} train ($(date -u +%T)) ---" >> "$OUT"
  timeout 4500 python scripts/train.py --experiment "${n}x${n}_strict_sb3" \
    --seed "$seed" --model-name "$name" --total-timesteps "$total" \
    --iters-per-dispatch 4 \
    >> "$OUT" 2>&1 || { echo "TRAIN FAILED ${name}" >> "$OUT"; return 1; }
  local agent="models/$name/agent_final"
  echo "--- ${name} export ($(date -u +%T)) ---" >> "$OUT"
  timeout 900 python scripts/export_agent.py --cpu --experiment "${n}x${n}_strict_sb3" \
    --model-name "$name" --out "$agent" >> "$OUT" 2>&1 \
    || { echo "EXPORT FAILED ${name}" >> "$OUT"; return 1; }
  match_one "$name" "$n" "$seed" "$total" "$ref" final "orbax:$agent"
  local best
  best=$(best_of "$name")
  if [ -n "${best:-}" ] && [ -d "$best" ]; then
    match_one "$name" "$n" "$seed" "$total" "$ref" best "orbax:$best"
  else
    echo "NO BEST SNAPSHOT ${name}" >> "$OUT"
  fi
}

for seed in 0 1 2; do
  run_one 6 "$seed" 71000000 6x6_MLP-default_lr-0.0003_71
done
echo "=== sweep r4b done $(date -u +%FT%TZ) ===" >> "$OUT"

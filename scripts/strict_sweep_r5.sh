#!/usr/bin/env bash
# Round-5 strict-protocol sweep (VERDICT r4 "Next round" items 1-3):
#
#   A. TRUE n_envs=1 replication of the reference's actual configuration
#      (checkpoint metadata n_envs=1, SURVEY §6): 6x6 @ 10M vs the
#      budget-matched `6x6_buffer_64_10`.  The r2-r4 strict presets batch
#      8 protocol streams — the one batched concession — and the r4b 71M
#      degradation made that concession a live suspect.
#   B. Widen the matched-budget bands to >=5 seeds: +2 seeds each for
#      6x6@10M (8-env), 5x5@31M, 7x7@56M.
#   C. The big one: n_envs=1 @ 71M vs `6x6_MLP-default_lr-0.0003_71`
#      (the reference's strongest artifact, its exact config + budget).
#
# Every run matches BOTH the final agent and the promoted best snapshot.
# Results append to log/strict_sweep_r5.jsonl with an "n_envs" field.
set -u
cd "$(dirname "$0")/.."
OUT=log/strict_sweep_r5.txt
JSONL=log/strict_sweep_r5.jsonl
echo "=== strict sweep r5 $(date -u +%FT%TZ) ===" >> "$OUT"

match_one() {  # name board seed total n_envs ref_file which policy_spec
  local name=$1 n=$2 seed=$3 total=$4 nenvs=$5 ref=$6 which=$7 spec=$8
  echo "--- ${name} match(${which}) vs ${ref} ($(date -u +%T)) ---" >> "$OUT"
  local mres
  mres=$(timeout 1800 python scripts/match.py --board-size "$n" --games 1024 \
    --a "$spec" --b "sb3:/root/reference/models/$ref" 2>> "$OUT") \
    || { echo "MATCH FAILED ${name} ${which}" >> "$OUT"; return 1; }
  echo "$mres" >> "$OUT"
  printf '{"run": "%s", "board": %s, "seed": %s, "total": %s, "n_envs": %s, "which": "%s", "ref": "%s", "match": %s}\n' \
    "$name" "$n" "$seed" "$total" "$nenvs" "$which" "$ref" \
    "$(echo "$mres" | tail -1)" >> "$JSONL"
}

best_of() {  # run-name -> path of highest-score best_* snapshot (or empty)
  printf '%s\n' "models/$1"/best_* 2>/dev/null \
    | awk -F'best_' 'NF > 1 {print $NF, $0}' | sort -g | tail -1 \
    | cut -d' ' -f2-
}

run_one() {  # board seed total n_envs ref_file train_timeout name
  local n=$1 seed=$2 total=$3 nenvs=$4 ref=$5 ttmo=$6 name=$7
  echo "--- ${name} train n_envs=${nenvs} ($(date -u +%T)) ---" >> "$OUT"
  timeout "$ttmo" python scripts/train.py --experiment "${n}x${n}_strict_sb3" \
    --seed "$seed" --model-name "$name" --total-timesteps "$total" \
    --n-envs "$nenvs" --iters-per-dispatch 4 \
    >> "$OUT" 2>&1 || { echo "TRAIN FAILED ${name}" >> "$OUT"; return 1; }
  local agent="models/$name/agent_final"
  echo "--- ${name} export ($(date -u +%T)) ---" >> "$OUT"
  timeout 900 python scripts/export_agent.py --cpu \
    --experiment "${n}x${n}_strict_sb3" --n-envs "$nenvs" \
    --model-name "$name" --out "$agent" >> "$OUT" 2>&1 \
    || { echo "EXPORT FAILED ${name}" >> "$OUT"; return 1; }
  match_one "$name" "$n" "$seed" "$total" "$nenvs" "$ref" final "orbax:$agent"
  local best
  best=$(best_of "$name")
  if [ -n "${best:-}" ] && [ -d "$best" ]; then
    match_one "$name" "$n" "$seed" "$total" "$nenvs" "$ref" best "orbax:$best"
  else
    echo "NO BEST SNAPSHOT ${name}" >> "$OUT"
  fi
}

# --- A: true 1-env replication at the matched 10M budget ------------------
run_one 6 0 10000000 1 6x6_buffer_64_10.zip 5400 6x6_strict_1env_s0

# --- B: widen the bands to 5 seeds ---------------------------------------
for seed in 3 4; do
  run_one 6 "$seed" 10000000 8 6x6_buffer_64_10.zip 3600 "6x6_strict_r5_s${seed}"
done
for seed in 3 4; do
  run_one 5 "$seed" 31000000 8 5x5_MLP-default_lr-0.0003_31 3600 "5x5_strict_r5_s${seed}"
done
for seed in 3 4; do
  run_one 7 "$seed" 56000000 8 7x7_MLP-default_lr-0.0003_56 3600 "7x7_strict_r5_s${seed}"
done

# --- C: 1-env at the reference's strongest-artifact budget (71M) ---------
run_one 6 0 71000000 1 6x6_MLP-default_lr-0.0003_71 14400 6x6_strict_1env71_s0

echo "=== sweep r5 done $(date -u +%FT%TZ) ===" >> "$OUT"

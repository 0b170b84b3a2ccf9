"""Pool-replacement curve summary per training run.

Reads ``log/<run>/metrics.jsonl`` and reports, per run: eval count,
replacement count (total / first half), the last replacement step (pool
freeze point), the tail rollout reward (pool-farming indicator), and the
final best score.  Used for the r4b/r5 pool-freeze analyses (the
replacement rule self-terminates once scores saturate; a high tail reward
with an early last-replacement step = the agent farming a frozen pool).

    python scripts/pool_curve_report.py 6x6_strict_1env_s0 6x6_strict_r3_s0 ...
"""

from __future__ import annotations

import argparse
import json


def curve(run: str) -> dict | None:
    evals = repl = 0
    best = 0.0
    rew = []
    repl_steps = []
    try:
        with open(f"log/{run}/metrics.jsonl") as fh:
            for line in fh:
                d = json.loads(line)
                if "eval/replaced" in d:
                    evals += 1
                    if d["eval/replaced"] > 0:
                        repl += 1
                        repl_steps.append(d["step"])
                    best = max(best, d.get("eval/best_score", 0.0))
                if "rollout/ep_rew_mean" in d:
                    rew.append((d["step"], d["rollout/ep_rew_mean"]))
    except FileNotFoundError:
        return None
    last_step = rew[-1][0] if rew else 0
    tail = [r for s, r in rew if s > last_step * 0.9]
    return dict(
        total_steps=last_step,
        evals=evals,
        replacements=repl,
        repl_first_half=sum(s <= last_step // 2 for s in repl_steps),
        last_repl_step=repl_steps[-1] if repl_steps else 0,
        tail_rollout_reward=round(sum(tail) / max(len(tail), 1), 3),
        best_score=round(best, 3),
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("runs", nargs="+")
    args = ap.parse_args()
    for run in args.runs:
        c = curve(run)
        if c is None:
            print(f"{run:28s} (no metrics.jsonl)")
            continue
        print(
            f"{run:28s} steps={c['total_steps']:>11,} evals={c['evals']:>5} "
            f"repl={c['replacements']:>4} (1st half {c['repl_first_half']}) "
            f"last_repl={c['last_repl_step']:>11,} "
            f"tail_rew={c['tail_rollout_reward']:+.3f} best={c['best_score']:.3f}"
        )


if __name__ == "__main__":
    main()

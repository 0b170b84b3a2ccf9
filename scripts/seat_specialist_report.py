"""Quantify the seat-specialist promotion hazard across strict sweeps.

The reference's eval criterion (pool score, ``EvaluationCallback.py:35-48``)
never looks at per-seat strength, and its ``fixed_random`` seat draw
(``SelfplayWrapper.py:72-73``) trains one seat per env — so both the final
agent and the promoted "best" snapshot can be seat specialists.  This tool
reads the strict-sweep match logs (which record ``a_wins_as_seat0/1`` from
1024 alternating-seat games) and counts, per selection kind, how many
snapshots have a >RATIO-fold two-seat win imbalance (VERDICT r4 item 7).

    python scripts/seat_specialist_report.py [--ratio 3] [jsonl ...]
"""

from __future__ import annotations

import argparse
import json

DEFAULT_LOGS = [
    "log/strict_sweep_results.jsonl",
    "log/strict_sweep_r4.jsonl",
    "log/strict_sweep_r4b.jsonl",
    "log/strict_sweep_r5.jsonl",
]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("logs", nargs="*", default=None)
    ap.add_argument("--ratio", type=float, default=3.0,
                    help="imbalance threshold (max_seat_wins / min_seat_wins)")
    args = ap.parse_args()

    rows = []
    for f in args.logs or DEFAULT_LOGS:
        try:
            with open(f) as fh:
                rows.extend(json.loads(line) for line in fh if line.strip())
        except FileNotFoundError:
            pass

    counts: dict[str, list[int]] = {}
    for r in rows:
        which = r.get("which", "final")
        m = r["match"]
        a, b = m["a_wins_as_seat0"], m["a_wins_as_seat1"]
        rt = max(a, b) / max(min(a, b), 1)
        is_spec = rt > args.ratio
        counts.setdefault(which, [0, 0])
        counts[which][0] += is_spec
        counts[which][1] += 1
        tag = "SPECIALIST" if is_spec else "balanced"
        print(f'{r["run"]:26s} {which:6s} wr={m["a_winrate"]:.3f} '
              f"seats {a:3d}/{b:3d} ratio {rt:6.1f} {tag}")
    print()
    for k, (n, tot) in sorted(counts.items()):
        print(f"{k}: {n}/{tot} snapshots exceed the {args.ratio:g}x "
              "seat-imbalance threshold")


if __name__ == "__main__":
    main()

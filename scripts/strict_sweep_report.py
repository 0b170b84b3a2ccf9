"""Summarize a strict-protocol seed sweep into a markdown table.

Round-3 format (``log/strict_sweep_results.jsonl``, one match per seed) and
round-4 format (``log/strict_sweep_r4.jsonl``, TWO matches per seed:
``which: final`` = agent_final and ``which: best`` = the promoted
best-model snapshot, the reference protocol's own deliverable) are both
understood; rows group by (board, which).

    python scripts/strict_sweep_report.py [log/strict_sweep_r4.jsonl]
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, ".")

LOG = pathlib.Path("log")


def main() -> None:
    path = pathlib.Path(
        sys.argv[1] if len(sys.argv) > 1 else LOG / "strict_sweep_results.jsonl"
    )
    rows = [
        json.loads(line)
        for line in path.read_text().splitlines()
        if line.strip()
    ]
    groups: dict = {}
    for r in rows:
        key = (r["board"], r.get("which", "final"))
        groups.setdefault(key, []).append(r)

    print("| board | which | budget | ref artifact | winrate per seed | mean | "
          "seat0/seat1 wins (per seed) | final best_score |")
    print("|---|---|---|---|---|---|---|---|")
    for board, which in sorted(groups):
        rs = groups[(board, which)]
        rs.sort(key=lambda r: r.get("seed", r["run"]))
        wr = [r["match"]["a_winrate"] for r in rs]
        seats = [
            f'{r["match"]["a_wins_as_seat0"]}/{r["match"]["a_wins_as_seat1"]}'
            for r in rs
        ]
        best = []
        for r in rs:
            mfile = LOG / r["run"] / "metrics.jsonl"
            b = None
            if mfile.exists():
                for line in mfile.read_text().splitlines():
                    d = json.loads(line)
                    b = d.get("eval/best_score", b)
            best.append(f"{b:.2f}" if b is not None else "?")
        total = rs[0].get("total")
        budget = f"{total:,}" if total else "—"
        print(
            f'| {board}x{board} | {which} | {budget} | {rs[0]["ref"]} | '
            f'{", ".join(f"{w:.1%}" for w in wr)} | '
            f'{sum(wr) / len(wr):.1%} | {", ".join(seats)} | {", ".join(best)} |'
        )


if __name__ == "__main__":
    main()

"""Summarize the strict-protocol seed sweep into a markdown table.

Reads ``log/strict_sweep_results.jsonl`` (written by
``scripts/strict_seed_sweep.sh``) plus each run's ``metrics.jsonl`` and
prints per-board winrate mean ± spread at matched budget vs the reference
artifact, per-seat win splits (the protocol's seat-specialization
signature), and the final pool curriculum stats.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, ".")

LOG = pathlib.Path("log")


def main() -> None:
    rows = [
        json.loads(line)
        for line in (LOG / "strict_sweep_results.jsonl").read_text().splitlines()
        if line.strip()
    ]
    by_board: dict = {}
    for r in rows:
        by_board.setdefault(r["board"], []).append(r)

    print("| board | budget | ref artifact | winrate per seed | mean | "
          "seat0/seat1 wins (per seed) | final best_score |")
    print("|---|---|---|---|---|---|---|")
    for board in sorted(by_board):
        rs = sorted(by_board[board], key=lambda r: r["seed"])
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
        print(
            f'| {board}x{board} | {rs[0]["total"]:,} | {rs[0]["ref"]} | '
            f'{", ".join(f"{w:.1%}" for w in wr)} | '
            f'{sum(wr) / len(wr):.1%} | {", ".join(seats)} | {", ".join(best)} |'
        )


if __name__ == "__main__":
    main()

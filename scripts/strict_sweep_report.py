"""Summarize strict-protocol seed sweeps into a markdown table.

Accepts any number of sweep jsonl files (round-3 ``strict_sweep_results``,
round-4 ``strict_sweep_r4/r4b``, round-5 ``strict_sweep_r5``) and merges
them; rows group by (board, budget, n_envs, which) so the 5-seed
matched-budget bands combine the r3/r4 seeds with the r5 additions while
the n_envs=1 replication rows stay separate.  ``which: final`` =
agent_final; ``which: best`` = the promoted best-model snapshot.  The mean
column carries the 1024-game binomial noise bound (+-1.5 sigma ~ +-2.4
points on a single seed; the seed spread dominates it by an order of
magnitude — RESULTS.md r5).

    python scripts/strict_sweep_report.py log/strict_sweep_r4.jsonl \
        log/strict_sweep_r5.jsonl ...
"""

from __future__ import annotations

import json
import math
import pathlib
import sys

sys.path.insert(0, ".")

LOG = pathlib.Path("log")
DEFAULT = [
    LOG / "strict_sweep_results.jsonl",
    LOG / "strict_sweep_r4.jsonl",
    LOG / "strict_sweep_r4b.jsonl",
    LOG / "strict_sweep_r5.jsonl",
]


def main() -> None:
    paths = [pathlib.Path(p) for p in sys.argv[1:]] or DEFAULT
    rows = []
    for path in paths:
        if not path.exists():
            continue
        rows.extend(
            json.loads(line)
            for line in path.read_text().splitlines()
            if line.strip()
        )
    groups: dict = {}
    # the r4 sweep script's jsonl rows omit seed/total; its budgets were
    # fixed per board (strict_sweep_r4.sh: 7x7 @ 56M, 5x5 @ 31M)
    R4_BUDGETS = {7: 56_000_000, 5: 31_000_000}
    for r in rows:
        total = r.get("total")
        if total is None and "_r4_" in r["run"]:
            total = R4_BUDGETS.get(r["board"])
        key = (
            r["board"],
            total or 0,
            r.get("n_envs", 8),
            r.get("which", "final"),
        )
        groups.setdefault(key, []).append(r)

    print("| board | budget | n_envs | which | ref artifact | "
          "winrate per seed | mean ± noise | seat0/seat1 wins | n seeds |")
    print("|---|---|---|---|---|---|---|---|---|")
    for board, total, n_envs, which in sorted(groups):
        rs = groups[(board, total, n_envs, which)]
        rs.sort(
            key=lambda r: (
                (0, int(r["seed"])) if isinstance(r.get("seed"), int)
                else (1, str(r["run"]))
            )
        )
        wr = [r["match"]["a_winrate"] for r in rs]
        games = rs[0]["match"].get("games", 1024)
        mean = sum(wr) / len(wr)
        # binomial sd of the MEAN of n seeds' single-match estimates
        noise = math.sqrt(mean * (1 - mean) / games / len(rs))
        seats = [
            f'{r["match"]["a_wins_as_seat0"]}/{r["match"]["a_wins_as_seat1"]}'
            for r in rs
        ]
        budget = f"{total:,}" if total else "—"
        print(
            f'| {board}x{board} | {budget} | {n_envs} | {which} | '
            f'{rs[0]["ref"]} | {", ".join(f"{w:.1%}" for w in wr)} | '
            f'{mean:.1%} ± {noise:.1%} | {", ".join(seats)} | {len(rs)} |'
        )


if __name__ == "__main__":
    main()

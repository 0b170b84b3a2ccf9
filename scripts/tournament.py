"""Round-robin strength tournament with Elo fitting.

Plays every pair of policies head-to-head on device (alternating seats,
stochastic play — same engine as ``scripts/match.py``) and fits
Bradley-Terry ratings via the classic minorization-maximization updates,
reported on the Elo scale anchored at the first player = 0.

    python scripts/tournament.py --board-size 7 --games 512 \
        random \
        sb3:/root/reference/models/7x7_MLP-default_lr-0.0003_56 \
        orbax:models/7x7_MLP-default_lr-0.0003/best_0.7938

The reference has no rating machinery (its ``config.ini`` ``[ELO]`` section
is vestigial upstream-HexHex content that nothing reads — SURVEY.md §2);
this tool supplies the capability natively.
"""

from __future__ import annotations

import argparse
import itertools
import json
import math
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from match import run_match  # noqa: E402


def fit_elo(n_players: int, wins: dict, games: dict, iters: int = 200):
    """Bradley-Terry MM fit; returns Elo ratings anchored at player 0 = 0."""
    gamma = [1.0] * n_players
    for _ in range(iters):
        new = []
        for i in range(n_players):
            w_i = sum(wins.get((i, j), 0.0) for j in range(n_players) if j != i)
            denom = sum(
                games.get((min(i, j), max(i, j)), 0) / (gamma[i] + gamma[j])
                for j in range(n_players)
                if j != i and games.get((min(i, j), max(i, j)), 0)
            )
            new.append(w_i / denom if denom else gamma[i])
        scale = new[0] if new[0] > 0 else 1.0
        gamma = [g / scale for g in new]
    return [400.0 * math.log10(max(g, 1e-12)) for g in gamma]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("players", nargs="+",
                    help="policy specs: random | sb3:<zip> | orbax:<dir>")
    ap.add_argument("--board-size", type=int, default=7)
    ap.add_argument("--games", type=int, default=512, help="games per pair")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    n = len(args.players)
    wins: dict = {}
    games: dict = {}
    for i, j in itertools.combinations(range(n), 2):
        r = run_match(args.board_size, args.games, args.players[i],
                      args.players[j], seed=args.seed + 1000 * i + j)
        decided = r["games"] - r["undecided"]
        wins[(i, j)] = r["a_winrate"] * r["games"]
        wins[(j, i)] = r["b_winrate"] * r["games"]
        games[(i, j)] = decided
        print(json.dumps({"a": args.players[i], "b": args.players[j],
                          "a_winrate": r["a_winrate"]}))

    elo = fit_elo(n, wins, games)
    table = sorted(zip(args.players, elo), key=lambda t: -t[1])
    print(json.dumps({
        "board_size": args.board_size,
        "games_per_pair": args.games,
        "elo": [{"player": p, "elo": round(e, 1)} for p, e in table],
    }))


if __name__ == "__main__":
    main()

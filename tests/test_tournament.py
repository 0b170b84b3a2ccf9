"""Bradley-Terry Elo fitting (scripts/tournament.py)."""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from tournament import fit_elo  # noqa: E402


def test_two_player_winrate_maps_to_elo_gap():
    # A beats B 75% of 400 games -> Elo gap = 400*log10(3) ~ 190.8
    wins = {(0, 1): 300.0, (1, 0): 100.0}
    games = {(0, 1): 400}
    elo = fit_elo(2, wins, games)
    assert elo[0] == 0.0
    assert abs((elo[0] - elo[1]) - 400 * math.log10(3)) < 1.0


def test_transitive_chain_orders_players():
    # A > B > C with 70% per link
    wins = {(0, 1): 70.0, (1, 0): 30.0, (1, 2): 70.0, (2, 1): 30.0,
            (0, 2): 88.0, (2, 0): 12.0}
    games = {(0, 1): 100, (1, 2): 100, (0, 2): 100}
    elo = fit_elo(3, wins, games)
    assert elo[0] > elo[1] > elo[2]


def test_unplayed_pairs_are_tolerated():
    wins = {(0, 1): 80.0, (1, 0): 20.0}
    games = {(0, 1): 100}  # player 2 never played
    elo = fit_elo(3, wins, games)
    assert elo[0] > elo[1]

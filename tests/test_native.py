"""Native C engine: trajectory parity vs the golden oracle + throughput."""

import shutil
import subprocess

import numpy as np
import pytest

cc_available = shutil.which("cc") or shutil.which("gcc")
pytestmark = pytest.mark.skipif(not cc_available, reason="no C compiler")

from hex_gym_env_tpu.native.engine import NativeHexEnv, random_playout_throughput

from golden import GoldenHexEnv


@pytest.mark.parametrize("board_size", [3, 5, 7, 11])
def test_native_matches_golden(board_size):
    rng = np.random.default_rng(board_size * 7)
    for game in range(8):
        env = NativeHexEnv(board_size)
        gold = GoldenHexEnv(board_size)
        obs = env.reset()
        gobs = gold.reset()
        np.testing.assert_array_equal(obs, gobs)
        done = False
        while not done:
            np.testing.assert_array_equal(env.legal_actions(), gold.legal_actions())
            legal = np.flatnonzero(gold.legal_actions())
            a = int(rng.choice(legal))
            obs, reward, done, _ = env.step(a)
            gobs, greward, gdone, gwinner = gold.step(a)
            np.testing.assert_array_equal(obs, gobs)
            assert reward == [float(greward[0]), float(greward[1])]
            assert done == gdone
        assert env.winner == gold.sim.winner


def test_native_invalid_move():
    env = NativeHexEnv(4)
    env.reset()
    env.step(5)
    obs, reward, done, _ = env.step(5)
    assert done and env.winner_code == 3 and reward == [0.0, 0.0]


def test_native_sampled_board_replay():
    rng = np.random.default_rng(0)
    board = rng.choice([-1, 0, 1], size=(7, 7)).astype(np.int8)
    env = NativeHexEnv(7)
    env.reset(board)
    gold = GoldenHexEnv(7)
    gold.reset(board)
    np.testing.assert_array_equal(env.observation, gold.sim.board)
    done = False
    while not done:
        legal = np.flatnonzero(gold.legal_actions())
        if not len(legal):
            break
        a = int(rng.choice(legal))
        obs, reward, done, _ = env.step(a)
        gobs, greward, gdone, _ = gold.step(a)
        np.testing.assert_array_equal(obs, gobs)
        assert done == gdone


def test_native_playout_helper():
    winners, moves = random_playout_throughput(7, games=200, seed=42)
    assert winners.shape == (200,)
    assert set(np.unique(winners)).issubset({0, 1})  # Hex never draws
    assert moves >= 200 * 13  # shortest 7x7 game is 13 moves of both seats

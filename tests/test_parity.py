"""Trajectory parity: jitted batched engine vs the golden scalar oracle.

PRNG contract under test: actions are chosen by a shared host-side procedure
(seeded numpy Generator) and fed identically to both implementations, so any
divergence in observations, masks, rewards, termination, or winners is a
genuine semantic mismatch.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hex_gym_env_tpu.core import env as hex_env
from hex_gym_env_tpu.core.state import Winner
from hex_gym_env_tpu.core.topology import get_topology
from hex_gym_env_tpu.core.random_board import sample_boards

from golden import GoldenHexEnv, BLACK_ID


def rollout_pair(board_size: int, n_games: int, seed: int, invalid_prob: float = 0.0):
    """Play games in lockstep on both engines, asserting parity every step."""
    topo = get_topology(board_size)
    rng = np.random.default_rng(seed)

    goldens = [GoldenHexEnv(board_size) for _ in range(n_games)]
    gold_obs = np.stack([g.reset() for g in goldens])
    gold_done = np.zeros(n_games, dtype=bool)

    state = hex_env.initial_state(topo, n_games)
    step_fn = jax.jit(lambda s, a: hex_env.step(topo, s, a))
    obs_fn = jax.jit(lambda s: (hex_env.observe(topo, s), hex_env.legal_mask(topo, s)))

    for t in range(board_size * board_size + 3):
        obs_j, mask_j = obs_fn(state)
        obs = np.asarray(obs_j)
        mask = np.asarray(mask_j)

        for i, g in enumerate(goldens):
            if gold_done[i]:
                continue
            np.testing.assert_array_equal(obs[i], gold_obs[i], err_msg=f"obs game {i} t {t}")
            np.testing.assert_array_equal(
                mask[i], g.legal_actions(), err_msg=f"mask game {i} t {t}"
            )

        # Choose actions (shared): mostly uniform-legal, sometimes deliberately
        # invalid to exercise the invalid-move termination path.
        actions = np.zeros(n_games, dtype=np.int32)
        for i, g in enumerate(goldens):
            if gold_done[i]:
                actions[i] = 0
                continue
            legal = np.flatnonzero(g.legal_actions())
            if invalid_prob and rng.random() < invalid_prob:
                illegal = np.flatnonzero(~g.legal_actions())
                if len(illegal):
                    actions[i] = rng.choice(illegal)
                    continue
            actions[i] = rng.choice(legal)

        state, rewards = step_fn(state, jnp.asarray(actions))
        rewards = np.asarray(rewards)
        done = np.asarray(state.done)
        winner = np.asarray(state.winner)

        for i, g in enumerate(goldens):
            if gold_done[i]:
                continue
            g_obs, g_rew, g_done, g_winner = g.step(int(actions[i]))
            gold_obs[i] = g_obs
            np.testing.assert_array_equal(
                rewards[i], np.asarray(g_rew, dtype=np.float32), err_msg=f"reward game {i} t {t}"
            )
            assert done[i] == g_done, f"done mismatch game {i} t {t}"
            if g_done:
                gold_done[i] = True
                if g_winner is None:
                    assert winner[i] == Winner.DRAW or winner[i] == Winner.ONGOING
                else:
                    assert winner[i] == g_winner, f"winner mismatch game {i}: {winner[i]} vs {g_winner}"
        if gold_done.all():
            break

    assert gold_done.all(), "games did not terminate"
    assert np.asarray(state.done).all()


@pytest.mark.parametrize("board_size", [3, 5, 7])
def test_trajectory_parity(board_size):
    rollout_pair(board_size, n_games=16, seed=board_size * 101)


def test_trajectory_parity_large_board():
    rollout_pair(11, n_games=4, seed=7)


def test_trajectory_parity_beyond_reference_grid():
    """13x13 exceeds the reference's largest exercised board (11x11) and
    the fused kernels' 128-lane packing (they gate to the scan/lax path);
    the lax core must stay golden-exact on the 256-lane layout."""
    rollout_pair(13, n_games=3, seed=13)


@pytest.mark.parametrize("board_size", [5, 7])
def test_invalid_move_parity(board_size):
    rollout_pair(board_size, n_games=12, seed=board_size, invalid_prob=0.15)


def test_sampled_board_parity():
    """Games starting from random mid-game boards must agree too."""
    topo = get_topology(7)
    n_games = 12
    boards = np.asarray(jax.jit(sample_boards, static_argnums=(1, 2))(jax.random.key(0), topo, n_games))

    goldens = [GoldenHexEnv(7) for _ in range(n_games)]
    gold_obs = np.stack([g.reset(boards[i]) for i, g in enumerate(goldens)])
    gold_done = np.zeros(n_games, dtype=bool)

    state = jax.jit(hex_env.state_from_boards, static_argnums=0)(topo, jnp.asarray(boards))
    step_fn = jax.jit(lambda s, a: hex_env.step(topo, s, a))
    rng = np.random.default_rng(3)

    for t in range(49 + 2):
        obs = np.asarray(hex_env.observe(topo, state))
        for i in range(n_games):
            if not gold_done[i]:
                np.testing.assert_array_equal(obs[i], gold_obs[i], err_msg=f"obs {i} t {t}")
        actions = np.zeros(n_games, dtype=np.int32)
        for i, g in enumerate(goldens):
            if gold_done[i]:
                continue
            legal = np.flatnonzero(g.legal_actions())
            actions[i] = rng.choice(legal)
        state, rewards = step_fn(state, jnp.asarray(actions))
        for i, g in enumerate(goldens):
            if gold_done[i]:
                continue
            g_obs, g_rew, g_done, g_winner = g.step(int(actions[i]))
            gold_obs[i] = g_obs
            np.testing.assert_array_equal(np.asarray(rewards)[i], np.asarray(g_rew, np.float32))
            assert bool(np.asarray(state.done)[i]) == g_done
            if g_done:
                gold_done[i] = True
                if g_winner is not None:
                    assert int(np.asarray(state.winner)[i]) == g_winner
        if gold_done.all():
            break
    assert gold_done.all()


def test_sampled_boards_even_stones_black_to_move():
    topo = get_topology(7)
    boards = np.asarray(jax.jit(sample_boards, static_argnums=(1, 2))(jax.random.key(42), topo, 64))
    blacks = (boards == -1).sum(axis=(1, 2))
    whites = (boards == 1).sum(axis=(1, 2))
    np.testing.assert_array_equal(blacks, whites)  # even total => black to move


def test_first_mover_win_seat0():
    """Seat 0 fills column 0 of its frame top-to-bottom; wins at move 2N-1."""
    for n in [3, 5]:
        topo = get_topology(n)
        state = hex_env.initial_state(topo, 1)
        step_n = jax.jit(lambda s, a: hex_env.step(topo, s, a))
        # seat 0 plays (r, 0) for r in range(n); seat 1 plays (r, 1) safely
        for r in range(n):
            state, rew = step_n(state, jnp.array([r * n], jnp.int32))
            if r < n - 1:
                assert not bool(state.done[0])
                # seat 1 throws away a move: frame (n-1, r) -> world (r, n-1),
                # staying clear of seat 0's world column 0
                state, _ = step_n(state, jnp.array([(n - 1) * n + r], jnp.int32))
                assert not bool(state.done[0])
        assert bool(state.done[0])
        assert int(state.winner[0]) == 0
        assert float(rew[0, 0]) == 1.0 and float(rew[0, 1]) == -1.0

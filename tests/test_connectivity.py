"""Property tests for the reach-set connectivity kernel.

- win detection agrees with a brute-force BFS over the hex adjacency graph;
- on completely filled boards exactly one player has a connection (the Hex
  no-draw theorem), so the kernel can never report zero or two winners.
"""

import collections

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hex_gym_env_tpu.core.topology import get_topology, NEIGHBOR_OFFSETS
from hex_gym_env_tpu.core import env as hex_env
from hex_gym_env_tpu.ops import connectivity
from hex_gym_env_tpu.ops import labels as labels_ops


def bfs_connected(board: np.ndarray, seat: int) -> bool:
    """Brute-force: does `seat` connect its two edges?  board is world-frame
    (-1 seat0 / +1 seat1), seat0 connects rows, seat1 connects cols."""
    n = board.shape[0]
    stone = -1 if seat == 0 else 1
    if seat == 0:
        starts = [(0, x) for x in range(n) if board[0, x] == stone]
        goal = lambda y, x: y == n - 1
    else:
        starts = [(y, 0) for y in range(n) if board[y, 0] == stone]
        goal = lambda y, x: x == n - 1
    seen = set(starts)
    q = collections.deque(starts)
    while q:
        y, x = q.popleft()
        if goal(y, x):
            return True
        for dy, dx in NEIGHBOR_OFFSETS:
            ny, nx = y + dy, x + dx
            if 0 <= ny < n and 0 <= nx < n and (ny, nx) not in seen and board[ny, nx] == stone:
                seen.add((ny, nx))
                q.append((ny, nx))
    return False


@pytest.mark.parametrize("board_size", [3, 5, 7, 11])
def test_full_reach_matches_bfs(board_size):
    topo = get_topology(board_size)
    rng = np.random.default_rng(board_size)
    boards = rng.choice([-1, 0, 1], size=(64, board_size, board_size)).astype(np.int8)
    state = jax.jit(hex_env.state_from_boards, static_argnums=0)(topo, jnp.asarray(boards))
    # labels path (production) and reach-propagation path (cross-check)
    won_labels = np.stack(
        [np.asarray(labels_ops.seat_wins(topo, state.labels, s)) for s in range(2)],
        axis=-1,
    )
    reach = jax.jit(connectivity.full_reach, static_argnums=1)(state.stones, topo)
    won_reach = np.asarray(connectivity.wins(reach))
    np.testing.assert_array_equal(won_labels, won_reach)
    for i in range(boards.shape[0]):
        for seat in range(2):
            assert won_labels[i, seat] == bfs_connected(boards[i], seat), (
                f"board {i} seat {seat}\n{boards[i]}"
            )


@pytest.mark.parametrize("board_size", [3, 5, 7, 9])
def test_hex_theorem_full_boards(board_size):
    """A full board always has exactly one connected player."""
    topo = get_topology(board_size)
    rng = np.random.default_rng(1234 + board_size)
    n2 = board_size * board_size
    boards = []
    for _ in range(64):
        vals = np.array([-1] * ((n2 + 1) // 2) + [1] * (n2 // 2), dtype=np.int8)
        rng.shuffle(vals)
        boards.append(vals.reshape(board_size, board_size))
    boards = np.stack(boards)
    state = jax.jit(hex_env.state_from_boards, static_argnums=0)(topo, jnp.asarray(boards))
    won = np.stack(
        [np.asarray(labels_ops.seat_wins(topo, state.labels, s)) for s in range(2)],
        axis=-1,
    )
    np.testing.assert_array_equal(won.sum(axis=-1), np.ones(64))


def test_incremental_matches_recompute():
    """Playing moves one by one must keep reach identical to full recompute."""
    topo = get_topology(7)
    rng = np.random.default_rng(9)
    B = 32
    state = hex_env.initial_state(topo, B)
    step_fn = jax.jit(lambda s, a: hex_env.step(topo, s, a))
    for _ in range(30):
        mask = np.asarray(hex_env.legal_mask(topo, state))
        done = np.asarray(state.done)
        actions = np.zeros(B, dtype=np.int32)
        for i in range(B):
            if done[i]:
                continue
            actions[i] = rng.choice(np.flatnonzero(mask[i]))
        state, _ = step_fn(state, jnp.asarray(actions))
        # Incrementally-maintained labels == from-scratch replay of the same
        # union (partition equality, label values are history-dependent).
        # Note: stones sharing an edge merge THROUGH the edge virtual, like
        # the reference's pre-labeled padded edge rows — so plain stone-graph
        # reach is not the right oracle here.
        fresh_labels = np.asarray(
            jax.jit(labels_ops.labels_from_stones, static_argnums=0)(topo, state.stones)
        )
        got = np.asarray(state.labels)
        for b in range(B):
            # same-partition check: equal labels in one table <=> in the other
            ga, fa = got[b], fresh_labels[b]
            assert np.array_equal(
                ga[:, None] == ga[None, :], fa[:, None] == fa[None, :]
            ), f"partition mismatch env {b}"


def test_propagate_fixed_equals_fixpoint():
    topo = get_topology(7)
    rng = np.random.default_rng(5)
    boards = rng.choice([-1, 0, 1], size=(16, 7, 7)).astype(np.int8)
    state = jax.jit(hex_env.state_from_boards, static_argnums=0)(topo, jnp.asarray(boards))
    edges = jnp.asarray(topo.edge_masks)
    seeds = edges[None] & state.stones[:, :, None, :]
    fixed = jax.jit(connectivity.propagate_fixed, static_argnums=(2, 3))(
        seeds, state.stones[:, :, None, :], topo, (7 * 7) // 2 + 2
    )
    full = jax.jit(connectivity.full_reach, static_argnums=1)(state.stones, topo)
    np.testing.assert_array_equal(np.asarray(fixed), np.asarray(full))

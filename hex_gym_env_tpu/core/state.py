"""Batched environment state pytree.

The reference keeps mutable per-game Python objects (``HexGame`` holds a
board, two region-label planes, counters — ``minihex/HexSingleGame.py:26-71``).
Here the whole batch of games is one immutable pytree of arrays with a
leading batch axis, transformed by pure jitted functions.

Winner codes mirror the reference's observable outcomes:

- the reference returns seat ids 0/1 for a win (``HexSingleGame.py:111-115``),
  ``None`` on a full-board draw (``:117-119``), and the sentinel ``3`` for an
  invalid move that terminates the episode (``:95-96`` + env handling at
  ``:240-241``).  ``None``/ongoing maps to -1 here and draw to 2.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
from flax import struct


class Winner(enum.IntEnum):
    """Outcome codes stored in ``HexState.winner``."""

    ONGOING = -1
    SEAT_0 = 0  # "black": connects top row to bottom row in the world frame
    SEAT_1 = 1  # "white": connects left col to right col in the world frame
    DRAW = 2  # board full with no connection (reachable only via quirks)
    INVALID = 3  # episode terminated by an invalid move (reference sentinel 3)


@struct.dataclass
class HexState:
    """State of a batch of Hex games, all arrays carry a leading batch axis B.

    Attributes:
      stones: (B, 2, L) bool — stones[b, s, c]: seat ``s`` occupies cell ``c``
        (world-frame flat index, lane-padded to L).
      labels: (B, L) int32 — flat connectivity labels over cells + 4 virtual
        edge nodes (see ``ops/labels.py``); equal labels == same connected
        group.  The batched equivalent of the reference's integer
        region-label planes (``HexSingleGame.py:42-55``), with the win test
        "both edge virtuals share a group" replacing ``regions[-1,-1]==1``.
      to_move: (B,) int32 — seat to move (0 or 1).  The observation is always
        rendered in the mover's frame, reproducing the reference's
        invert-after-every-step convention (``HexSingleGame.py:259-271``).
      done: (B,) bool.
      winner: (B,) int32 — ``Winner`` codes.
      empty: (B,) int32 — number of empty cells (the reference's
        ``empty_fields`` counter, ``HexSingleGame.py:29,101``).
      move_count: (B,) int32 — moves applied this episode (telemetry only).
    """

    stones: jnp.ndarray
    labels: jnp.ndarray
    to_move: jnp.ndarray
    done: jnp.ndarray
    winner: jnp.ndarray
    empty: jnp.ndarray
    move_count: jnp.ndarray

    @property
    def batch_size(self) -> int:
        return self.stones.shape[0]

    @property
    def lanes(self) -> int:
        return self.stones.shape[-1]

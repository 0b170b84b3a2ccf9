"""Golden scalar oracle: a faithful re-statement of minihex variant-B semantics.

This is an *independent* NumPy implementation of the behavioral contract
documented in SURVEY.md §7 ("semantics that MUST be preserved"), written to
mirror ``minihex/HexSingleGame.py`` observable behavior exactly:

- mover-frame board, stone always written as -1, transpose+color-swap after
  every step (``HexSingleGame.py:100,259-271``);
- region-label win detection with padded edge labels 1/2, smallest-label
  merge, corner test ``regions[-1,-1] == 1`` (``:41-55,135-153``), and for
  the WHITE seat the flood fill at transposed coordinates (``:103-106``);
- rewards as a 2-vector (mover +1 / other -1 on win, zeros otherwise,
  including the invalid-move quirk where -100 is computed then overwritten
  to 0, ``:240-253``);
- invalid move: board untouched, episode done, winner sentinel 3, and the
  board is still inverted / the mover still flips at env level (``:259-260``).

It exists so the jitted batched engine has a trustworthy scalar reference;
it is deliberately simple and slow.
"""

from __future__ import annotations

import numpy as np

BLACK_ID = 0
WHITE_ID = 1
BLACK_STONE = -1
WHITE_STONE = 1
EMPTY = 0

INVALID_SENTINEL = 3


class GoldenHexGame:
    """Scalar Hex simulator with region-label win detection."""

    def __init__(self, active_player: int, board: np.ndarray):
        self.board = board.astype(np.int64).copy()
        self.n = self.board.shape[1]
        self.empty_fields = int(np.count_nonzero(self.board == EMPTY))

        # Two (N+2)^2 zero-padded label planes; edge pre-labels 1 and 2.
        # BLACK connects rows, WHITE connects cols (in the un-inverted frame).
        self.regions = np.zeros((2, self.n + 2, self.n + 2), dtype=np.int64)
        self.regions[WHITE_ID][:, 0] = 1
        self.regions[BLACK_ID][0, :] = 1
        self.regions[WHITE_ID][:, self.n + 1] = 2
        self.regions[BLACK_ID][self.n + 1, :] = 2
        self.region_counter = [
            int(self.regions[BLACK_ID].max()) + 1,
            int(self.regions[WHITE_ID].max()) + 1,
        ]

        # Replay pre-placed stones (sampled boards): board is in the world
        # frame here, so both colors fill at their direct coordinates.
        for y in range(self.n):
            for x in range(self.n):
                v = self.board[y, x]
                if v == BLACK_STONE:
                    self.current_player = BLACK_ID
                    self._flood_fill(y, x)
                elif v == WHITE_STONE:
                    self.current_player = WHITE_ID
                    self._flood_fill(y, x)

        self.current_player = active_player
        self.done = False
        self.winner: int | None = None

    def is_valid(self, action: int) -> bool:
        y, x = divmod(action, self.n)
        return self.board[y, x] == EMPTY

    def legal_actions(self) -> np.ndarray:
        return (self.board.reshape(-1) == EMPTY).copy()

    def make_move(self, action: int):
        if not self.is_valid(action):
            return INVALID_SENTINEL
        y, x = divmod(action, self.n)
        # The board is in the mover's frame: the mover's stone is always -1.
        self.board[y, x] = BLACK_STONE
        self.empty_fields -= 1
        if self.current_player == WHITE_ID:
            # WHITE's label plane stays in the un-inverted frame; the board is
            # currently in WHITE's frame, so fill at transposed coordinates.
            self._flood_fill(x, y)
        else:
            self._flood_fill(y, x)

        winner = None
        if self.regions[self.current_player][-1, -1] == 1:
            self.done = True
            winner = self.current_player
            self.winner = winner
        elif self.empty_fields <= 0:
            self.done = True
            winner = None
        self.current_player = (self.current_player + 1) % 2
        return winner

    def _flood_fill(self, y: int, x: int) -> None:
        plane = self.regions[self.current_player]
        py, px = y + 1, x + 1
        hood = plane[py - 1 : py + 2, px - 1 : px + 2].copy()
        hood[0, 0] = 0  # the (-1,-1) diagonal is not a hex neighbor
        hood[2, 2] = 0  # nor is (+1,+1)
        labels = sorted(set(hood.reshape(-1).tolist()))
        labels.remove(0)
        if not labels:
            plane[py, px] = self.region_counter[self.current_player]
            self.region_counter[self.current_player] += 1
        else:
            keep = labels[0]
            plane[py, px] = keep
            for other in labels[1:]:
                plane[plane == other] = keep


class GoldenHexEnv:
    """Scalar env with the invert-after-every-step convention."""

    def __init__(self, board_size: int = 5):
        self.n = board_size
        self.sim: GoldenHexGame | None = None
        self.current_player = BLACK_ID

    def reset(self, board: np.ndarray | None = None) -> np.ndarray:
        self.current_player = BLACK_ID
        if board is None:
            board = np.zeros((self.n, self.n), dtype=np.int64)
        self.sim = GoldenHexGame(self.current_player, board)
        return self.sim.board.copy()

    def legal_actions(self) -> np.ndarray:
        return self.sim.legal_actions()

    def step(self, action: int):
        winner = self.sim.make_move(action)
        if winner == INVALID_SENTINEL:
            self.sim.done = True

        if winner == self.current_player:
            r = 1
        elif winner == (self.current_player + 1) % 2:
            r = -1  # unreachable: make_move only crowns the mover
        else:
            r = 0
        reward = [-r, -r]
        reward[self.current_player] = r

        self.current_player = (self.current_player + 1) % 2
        self._invert_board()
        return self.sim.board.copy(), reward, self.sim.done, winner

    def _invert_board(self) -> None:
        b = self.sim.board.T.copy()
        self.sim.board = -b

"""Human-in-the-loop opponent adapter.

Duck-typed like any opponent policy (``choose_action(board, mask)``),
wrapping the pygame :class:`~hex_gym_env_tpu.interactive.gui.Gui` — the
equivalent of the reference's ``InteractiveGame``
(``minihex/interactive/interactive.py:11-90``) minus its dead code paths
(``play_ai_move`` / ``undo_move`` referenced attributes that never existed;
see SURVEY.md §2).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class InteractiveGame:
    """GUI-backed human "policy"."""

    def __init__(self, board: np.ndarray, radius: Optional[int] = None, dark_mode: Optional[bool] = None):
        from hex_gym_env_tpu.interactive.gui import Gui
        from hex_gym_env_tpu.utils.settings import gui_settings

        cfg = gui_settings()
        self.gui = Gui(
            np.asarray(board),
            radius=radius if radius is not None else cfg["radius"],
            dark_mode=dark_mode if dark_mode is not None else cfg["dark_mode"],
        )

    def choose_action(self, board: np.ndarray, action_mask=None) -> int:
        """Block on the event loop until the human clicks a legal empty cell;
        meta-moves redraw/toggle and keep waiting (``interactive.py:76-90``)."""
        board = np.asarray(board)
        self.gui.update_board(board)
        n = board.shape[0]
        while True:
            move = self.gui.get_move()
            if move == "redraw" or move == "editor":
                self.gui.update_board(board)
                continue
            if isinstance(move, tuple):
                y, x = move
                if board[y, x] == 0:
                    return int(y * n + x)
                continue
            if move in ("show_ratings", "ai_move", "undo_move", "restart"):
                # surfaced to the caller via attribute; GUI play scripts poll it
                self.last_meta_move = move
                if move == "restart":
                    return -1
                continue

    def save_model(self, path: str) -> None:
        return None

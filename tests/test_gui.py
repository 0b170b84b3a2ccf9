"""Headless pygame GUI tests (SDL dummy video driver).

Pins the geometry and interaction contract of ``interactive/gui.py``:
center math, click -> cell resolution, board rendering with stones and the
probability overlay, dark-mode palette swap, and the InteractiveGame
click-to-action loop (driven by synthetic pygame events).
"""

import math
import os

import numpy as np
import pytest

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
os.environ.setdefault("SDL_AUDIODRIVER", "dummy")

pygame = pytest.importorskip("pygame")

from hex_gym_env_tpu.interactive.gui import Gui  # noqa: E402
from hex_gym_env_tpu.interactive.interactive import InteractiveGame  # noqa: E402


@pytest.fixture()
def gui():
    g = Gui(np.zeros((5, 5), dtype=int), radius=30)
    yield g
    pygame.quit()


def test_center_geometry_matches_reference_formula(gui):
    r = gui.radius
    cx, cy = gui.get_center(2, 3)
    assert cx == pytest.approx(3 * r / 2 + 2 * r + 1.5 * r)
    assert cy == pytest.approx(math.sqrt(3) / 2 * 3 * r + 1.5 * r)


def test_pixel_to_pos_roundtrip_every_cell(gui):
    for y in range(5):
        for x in range(5):
            cx, cy = gui.get_center(y + 1, x + 1)
            assert gui.pixel_to_pos(cx + 2, cy - 3) == (y, x)


def test_pixel_far_outside_returns_none(gui):
    assert gui.pixel_to_pos(-500.0, -500.0) is None


def test_update_board_renders_stones_and_edges(gui):
    board = np.zeros((5, 5), dtype=int)
    board[0, 0] = -1  # black stone
    board[4, 4] = 1  # white stone
    gui.update_board(board)
    # stone pixels carry the stone colors at the cell centers
    c00 = gui.screen.get_at(tuple(int(v) for v in gui.get_center(1, 1)))[:3]
    c44 = gui.screen.get_at(tuple(int(v) for v in gui.get_center(5, 5)))[:3]
    assert c00 == gui.colors["black_stone"]
    assert c44 == gui.colors["white_stone"]
    # border cells: top row = black edge, left column = white edge
    top = gui.screen.get_at(tuple(int(v) for v in gui.get_center(0, 2)))[:3]
    left = gui.screen.get_at(tuple(int(v) for v in gui.get_center(2, 0)))[:3]
    assert top == gui.colors["black_edge"]
    assert left == gui.colors["white_edge"]


def test_probability_overlay_and_dark_mode(gui):
    board = np.zeros((5, 5), dtype=int)
    gui.update_field_text(np.linspace(0, 1, 25), board)
    assert gui.field_text.shape == (5, 5)
    # dark-mode palette swap via the 'd' keybinding
    pygame.event.post(pygame.event.Event(pygame.KEYDOWN, key=pygame.K_d))
    assert gui.get_move() == "redraw"
    assert gui.dark_mode and gui.colors["background"] == (25, 25, 30)


def test_keybindings_map_to_meta_moves(gui):
    for key, expected in [
        (pygame.K_a, "ai_move"),
        (pygame.K_z, "undo_move"),
        (pygame.K_s, "show_ratings"),
        (pygame.K_r, "restart"),
        (pygame.K_e, "editor"),
    ]:
        pygame.event.post(pygame.event.Event(pygame.KEYDOWN, key=key))
        assert gui.get_move() == expected


def test_interactive_game_click_to_action():
    board = np.zeros((4, 4), dtype=int)
    board[0, 0] = -1  # occupied: a click there must be ignored
    game = InteractiveGame(board, radius=30, dark_mode=False)
    try:
        occupied = game.gui.get_center(1, 1)
        target = game.gui.get_center(3, 2)  # cell (2, 1) -> action 9
        for pos in (occupied, target):
            pygame.event.post(
                pygame.event.Event(
                    pygame.MOUSEBUTTONDOWN, button=1,
                    pos=(int(pos[0]), int(pos[1])),
                )
            )
        assert game.choose_action(board) == 2 * 4 + 1
    finally:
        pygame.quit()

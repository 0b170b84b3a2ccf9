"""Gymnasium-compatible scalar env adapters (host-side shells).

These reproduce the reference's two environment surfaces for drop-in use —
the canonical single-agent env (``minihex/HexSingleGame.py:156-331``,
variant "B") and the legacy ``hex-v0`` fixed-opponent env
(``minihex/HexGame.py:145-371``, variant "A") — as thin wrappers around the
jitted batched core with batch=1.  They exist for API parity, interactive
play, and debugging; production training never touches them (the fused
rollout in ``train/rollout.py`` replaces the whole Gym loop).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

try:  # gymnasium is available in the image; guard anyway for slim installs
    import gymnasium as gym
    from gymnasium import spaces

    _GYM_BASE = gym.Env
except Exception:  # pragma: no cover
    gym = None
    spaces = None
    _GYM_BASE = object

from hex_gym_env_tpu.core import env as hex_env
from hex_gym_env_tpu.core import random_board
from hex_gym_env_tpu.core.state import Winner
from hex_gym_env_tpu.core.topology import get_topology


def random_policy(board: np.ndarray, rng: Optional[np.random.Generator] = None) -> int:
    """Uniform-random move over empty cells in variant-A encoding.

    Free-function twin of ``minihex.random_policy``
    (``minihex/__init__.py:8-12``): empty cells are ``== 2``; the reference
    draws via unseeded ``random.random()``, here an optional ``rng`` makes
    the draw reproducible.
    """
    board = np.asarray(board)
    actions = np.arange(board.size)
    valid = actions[board.flatten() == 2]
    r = np.random.random() if rng is None else rng.random()
    return int(valid[int(r * len(valid))])


class HexEnv(_GYM_BASE):
    """Single-agent, alternate-and-invert Hex env (reference variant B).

    API mirrors ``HexSingleGame.HexEnv``: ``reset() -> (obs, info)``;
    ``step(action) -> (obs, reward_2vec, done, info)`` (the reference's
    old-Gym 4-tuple, ``HexSingleGame.py:262-263``); ``legal_actions()``
    boolean mask over the mover-frame grid.
    """

    metadata = {"render.modes": ["ansi"]}

    def __init__(
        self,
        board_size: int = 5,
        sample_board: bool = False,
        seed: int = 0,
    ):
        self.board_size = board_size
        self.topo = get_topology(board_size)
        self.sample_board = sample_board
        self._key = jax.random.key(seed)
        self._state = None
        self._history = []  # step() before the first reset() must not hit AttributeError
        self.winner: Optional[int] = None
        if spaces is not None:
            self.observation_space = spaces.Box(
                low=-1, high=1, shape=(board_size, board_size), dtype=int
            )
            self.action_space = spaces.Discrete(board_size**2)

        topo = self.topo
        self._jit_step = jax.jit(lambda s, a: hex_env.step(topo, s, a))
        self._jit_obs = jax.jit(
            lambda s: (hex_env.observe(topo, s), hex_env.legal_mask(topo, s))
        )

    # -- helpers -----------------------------------------------------------

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    @property
    def observation(self) -> np.ndarray:
        return np.asarray(self._jit_obs(self._state)[0][0])

    def legal_actions(self) -> np.ndarray:
        return np.asarray(self._jit_obs(self._state)[1][0])

    @property
    def current_player_num(self) -> int:
        return int(self._state.to_move[0])

    @property
    def done(self) -> bool:
        return bool(self._state.done[0])

    # -- gym surface -------------------------------------------------------

    def reset(self, seed=None, options=None):
        if seed is not None:
            self._key = jax.random.key(seed)
        if self.sample_board:
            boards = random_board.sample_boards(self._next_key(), self.topo, 1)
            self._state = hex_env.state_from_boards(self.topo, boards)
        else:
            self._state = hex_env.initial_state(self.topo, 1)
        self.winner = None
        self._history = []
        obs = self.observation
        return obs, {"state": obs, "last_move_opponent": None, "last_move_player": None}

    def undo_move(self, steps: int = 1) -> np.ndarray:
        """Rewind ``steps`` half-moves (the GUI ``z`` key; the reference's
        ``undo_move`` path was dead code referencing a nonexistent
        ``board.undo_move_board`` — ``interactive.py:41-45``).  Returns the
        restored mover-frame observation."""
        for _ in range(min(steps, len(self._history))):
            self._state = self._history.pop()
        if self._state is None:  # undo before the first reset: nothing to show
            return None
        self.winner = None
        return self.observation

    def set_world_board(self, board: np.ndarray) -> None:
        """Replace the position (GUI editor mode), keeping the mover."""
        self._history.append(self._state)
        self._state = hex_env.state_from_boards(
            self.topo,
            jnp.asarray(board, jnp.int8)[None],
            to_move=self._state.to_move,
        )
        self.winner = None

    def step(self, action: int):
        if self._state is None:
            raise RuntimeError("call reset() before step()")
        self._history.append(self._state)
        self._state, rewards = self._jit_step(
            self._state, jnp.asarray([action], jnp.int32)
        )
        w = int(self._state.winner[0])
        if w == Winner.INVALID:
            self.winner = 3
        elif w in (0, 1):
            self.winner = w
        else:
            self.winner = None
        reward = [float(rewards[0, 0]), float(rewards[0, 1])]
        return self.observation, reward, self.done, {}

    def render(self, mode: str = "ansi", close: bool = False) -> str:
        """ASCII rhombus like the reference's render (``HexSingleGame.py:
        273-298``), returned as a string (also printed)."""
        board = self.observation
        sym = {0: ".", -1: "B", 1: "W"}
        lines = []
        for i, row in enumerate(board):
            lines.append(" " * i + " ".join(sym[int(v)] for v in row))
        out = "\n".join(lines)
        print(out)
        return out


class HexEnvV0(_GYM_BASE):
    """Legacy ``hex-v0`` surface (reference variant A): opponent inside step.

    Mirrors ``minihex/HexGame.py:145-371``: board encoding BLACK=0, WHITE=1,
    EMPTY=2; the opponent policy moves inside ``step`` after the agent;
    rewards +1 win / -1 loss / -100 invalid; board inversion so the opponent
    model always sees itself as black (``HexGame.py:297-303,332-349``);
    ``opponent_policy`` may be a callable ``f(board, mask) -> action``, the
    string ``"random"``, or ``"opponent_predict"`` with ``opponent_model``
    exposing SB3-style ``predict`` (+ epsilon-random mixing, ``:354-359``).
    """

    metadata = {"render.modes": ["ansi"]}

    def __init__(
        self,
        board_size: int = 5,
        opponent_policy: Any = "random",
        opponent_model: Any = None,
        player_color: int = 0,
        eps: float = 0.0,
        seed: int = 0,
        show_board: bool = False,
        show_result: bool = False,
    ):
        self.board_size = board_size
        self.topo = get_topology(board_size)
        self.opponent_policy = opponent_policy
        self.opponent_model = opponent_model
        self.player_color = player_color  # seat the agent occupies (0=BLACK)
        self.eps = eps
        self.show_board = show_board
        self.show_result = show_result
        self._rng = np.random.default_rng(seed)
        self._inner = HexEnv(board_size=board_size, seed=seed)
        if spaces is not None:
            self.observation_space = spaces.Box(
                low=0, high=2, shape=(board_size, board_size), dtype=int
            )
            self.action_space = spaces.Discrete(board_size**2)

        # ``show_board=True`` opens the pygame window with the config.ini
        # geometry, like ``HexGame.py:194-197``; ``opponent_policy=
        # "interactive"`` makes the human the opponent (``HexGame.py:163-165``)
        self._interactive = None
        if show_board or opponent_policy == "interactive":
            from hex_gym_env_tpu.interactive.interactive import InteractiveGame

            self._interactive = InteractiveGame(
                np.zeros((board_size, board_size), np.int8)
            )

    # -- GUI helpers ---------------------------------------------------------

    def _world_b(self) -> np.ndarray:
        """World-frame board in variant-B encoding (what the GUI renders)."""
        return np.asarray(hex_env.world_boards(self.topo, self._inner._state))[0]

    def _gui_sync(self) -> None:
        if self._interactive is not None:
            self._interactive.gui.update_board(self._world_b())

    def _interactive_action(self) -> int:
        """Human plays the opponent seat: world-frame click -> mover-frame
        action (the inner canonical core transposes for the WHITE seat)."""
        n = self.board_size
        a_world = self._interactive.choose_action(self._world_b())
        if a_world < 0:  # restart request
            return a_world
        y, x = divmod(a_world, n)
        if self._inner.current_player_num == 1:
            return x * n + y
        return a_world

    # encoding helpers: variant A uses {BLACK:0, WHITE:1, EMPTY:2}
    @staticmethod
    def _to_v0(board_b: np.ndarray) -> np.ndarray:
        out = np.full_like(board_b, 2)
        out[board_b == -1] = 0
        out[board_b == 1] = 1
        return out

    def _world_v0(self) -> np.ndarray:
        """Variant A returns the un-inverted world board every step
        (``HexGame.py:262``, the invert branches are commented out)."""
        world = np.asarray(
            hex_env.world_boards(self.topo, self._inner._state)
        )[0]
        return self._to_v0(world)

    def _opponent_action(self) -> int:
        if self.opponent_policy == "interactive":
            return self._interactive_action()
        mask = self._inner.legal_actions()
        board = self._inner.observation  # opponent sees itself as black (-1)
        if callable(self.opponent_policy):
            return int(self.opponent_policy(self._to_v0(board), mask))
        if self.opponent_policy == "opponent_predict" and self.opponent_model is not None:
            if self._rng.random() < self.eps:
                return int(self._rng.choice(np.flatnonzero(mask)))
            action, _ = self.opponent_model.predict(
                board, deterministic=False, action_masks=mask
            )
            return int(action)
        return int(self._rng.choice(np.flatnonzero(mask)))

    def reset(self, seed=None, options=None):
        # loop: a GUI restart request (`r`, sentinel -1) during the
        # opponent's opening move re-resets instead of being fed to the
        # core as an invalid move (cf. compat/selfplay_wrapper.py restart
        # handling)
        while True:
            self._inner.reset(seed=seed)
            self._gui_sync()
            if self.player_color != 0:
                # opponent (black seat) opens, like HexGame.py:224-230
                a = self._opponent_action()
                if a < 0:
                    continue
                self._inner.step(a)
                self._gui_sync()
            return self._world_v0(), {}

    def legal_actions(self) -> np.ndarray:
        return self._inner.legal_actions()

    def get_action_mask(self) -> np.ndarray:
        return self.legal_actions()

    def step(self, action: int):
        agent_seat = self.player_color
        _, _, done, _ = self._inner.step(action)
        self._gui_sync()
        w = self._inner.winner
        if w == 3:
            return self._world_v0(), -100.0, True, False, {}
        if not done:
            opp_a = self._opponent_action()
            if opp_a < 0:
                # GUI restart request: end the episode so the caller resets
                # (same contract as the selfplay wrapper's restart path)
                return self._world_v0(), 0.0, True, False, {"restart": True}
            _, _, done, _ = self._inner.step(opp_a)
            self._gui_sync()
            w = self._inner.winner
            if w == 3:  # opponent invalid: episode over, no agent reward
                return self._world_v0(), 0.0, True, False, {}
        if done and self.show_result and self._interactive is not None and w in (0, 1):
            self._interactive.gui.show_winner(-1 if w == 0 else 1)
        if w == agent_seat:
            reward = 1.0
        elif w == (agent_seat + 1) % 2:
            reward = -1.0
        else:
            reward = 0.0
        return self._world_v0(), reward, done, False, {}

    def render(self, mode: str = "ansi", close: bool = False) -> str:
        """ASCII grid table like the reference's (``HexGame.py:305-330``):
        numbered rows/columns, O/B/W cells; printed and returned."""
        board = self._world_v0()
        n = board.shape[1]
        sym = {2: "  O  ", 0: "  B  ", 1: "  W  "}
        lines = []
        header = " " * 6 + "".join(f"  {j + 1}  |" for j in range(n))
        lines.append(header)
        lines.append(" " * 5 + "-" * (n * 6 - 1))
        for i in range(n):
            row = " " * (1 + i * 3) + f"{i + 1}  |"
            row += "".join(sym[int(board[i, j])] + "|" for j in range(n))
            lines.append(row)
            lines.append(" " * (i * 3 + 1) + "-" * (n * 7 - 1))
        out = "\n".join(lines)
        print(out)
        return out


def register_envs() -> None:
    """Register ``hex-v0`` (variant A) and ``hex-single-v0`` (variant B)
    mirroring ``minihex/__init__.py:15-18``."""
    if gym is None:  # pragma: no cover
        return
    from gymnasium.envs.registration import register, registry

    if "hex-v0" not in registry:
        register(id="hex-v0", entry_point="hex_gym_env_tpu.compat.gym_env:HexEnvV0")
    if "hex-single-v0" not in registry:
        register(id="hex-single-v0", entry_point="hex_gym_env_tpu.compat.gym_env:HexEnv")

"""Text-protocol (GTP-style) Hex engine CLI.

The reference ships a non-runnable GTP-ish loop
(``minihex/interactive/play_cli.py`` imports the absent upstream ``hexhex``
package — SURVEY.md §2); this is a working equivalent over this framework's
engine.  Supported commands (subset of GTP adapted to Hex):

    name / version / protocol_version
    boardsize N            reset to an NxN board
    clear_board
    play <b|w> <move>      move like "b4" (letter column, number row)
    genmove <b|w>          engine answers with its move
    showboard
    final_score            "B+" / "W+" / "?" while undecided
    list_commands / quit

Engine policy: a checkpoint (``--sb3`` reference zip or ``--checkpoint``
orbax params) or uniform random when none given.

    echo -e "boardsize 5\nplay b a1\ngenmove w\nshowboard\nquit" | python scripts/play_cli.py
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

COMMANDS = [
    "name", "version", "protocol_version", "boardsize", "clear_board",
    "play", "genmove", "showboard", "final_score", "list_commands", "quit",
]


class CliGame:
    def __init__(self, board_size: int = 5, sb3: str | None = None,
                 checkpoint: str | None = None):
        self._sb3 = sb3
        self._checkpoint = checkpoint
        self._build(board_size)

    def _build(self, n: int) -> None:
        import jax
        import jax.numpy as jnp

        from hex_gym_env_tpu.compat import HexEnv
        from hex_gym_env_tpu.models import MlpPolicy
        from hex_gym_env_tpu.ops import masked

        self.n = n
        self.env = HexEnv(board_size=n)
        self.env.reset()
        model = MlpPolicy(n_actions=n * n)
        if self._sb3:
            from hex_gym_env_tpu.models.sb3_import import sb3_to_mlp_params

            variables = sb3_to_mlp_params(self._sb3)
        elif self._checkpoint:
            from hex_gym_env_tpu.utils.checkpoint import load_params

            template = model.init(jax.random.key(0), jnp.zeros((1, n, n), jnp.float32))
            variables = load_params(self._checkpoint, template)
        else:
            variables = jax.tree.map(
                jnp.zeros_like,
                model.init(jax.random.key(0), jnp.zeros((1, n, n), jnp.float32)),
            )
        self._key = jax.random.key(0)
        self._jax, self._jnp, self._masked = jax, jnp, masked

        @jax.jit
        def act(obs, mask, key):
            logits, _ = model.apply(variables, obs[None].astype(jnp.float32))
            return masked.sample(key, logits, mask[None])[0]

        self._act = act

    # -- move encoding ------------------------------------------------------
    # The CLI speaks fixed WORLD coordinates ("b4" = column b, row 4; black
    # connects rows, white connects columns) while the env consumes
    # mover-frame actions (the board inverts every move) — seat 1's world
    # (y, x) is mover-frame (x, y).

    def _parse_move(self, text: str, seat: int) -> int:
        text = text.strip().lower()
        x = ord(text[0]) - ord("a")
        y = int(text[1:]) - 1
        if not (0 <= x < self.n and 0 <= y < self.n):
            raise ValueError(f"move off board: {text}")
        if seat == 1:
            y, x = x, y
        return y * self.n + x

    def _fmt_move(self, action: int, seat: int) -> str:
        y, x = divmod(action, self.n)
        if seat == 1:
            y, x = x, y
        return f"{chr(ord('a') + x)}{y + 1}"

    def _world_board_str(self) -> str:
        from hex_gym_env_tpu.core import env as core_env

        board = np.asarray(core_env.world_boards(self.env.topo, self.env._state))[0]
        sym = {0: ".", -1: "B", 1: "W"}
        return "\n".join(
            " " * i + " ".join(sym[int(v)] for v in row) for i, row in enumerate(board)
        )

    def _seat_to_move(self) -> int:
        return self.env.current_player_num

    def respond(self, line: str) -> tuple[bool, str]:
        parts = line.strip().split()
        if not parts:
            return True, ""
        cmd, *args = parts
        try:
            if cmd == "name":
                return True, "hex_gym_env_tpu"
            if cmd == "version":
                import hex_gym_env_tpu

                return True, hex_gym_env_tpu.__version__
            if cmd == "protocol_version":
                return True, "2"
            if cmd == "list_commands":
                return True, "\n".join(COMMANDS)
            if cmd == "boardsize":
                self._build(int(args[0]))
                return True, ""
            if cmd == "clear_board":
                self.env.reset()
                return True, ""
            if cmd == "play":
                color = {"b": 0, "w": 1}[args[0][0].lower()]
                if self._seat_to_move() != color:
                    return False, f"it is not {args[0]}'s turn"
                if self.env.done:
                    return False, "game is over"
                action = self._parse_move(args[1], color)
                if not self.env.legal_actions()[action]:
                    return False, "illegal move"
                self.env.step(action)
                return True, ""
            if cmd == "genmove":
                color = {"b": 0, "w": 1}[args[0][0].lower()]
                if self._seat_to_move() != color:
                    return False, f"it is not {args[0]}'s turn"
                if self.env.done:
                    return False, "game is over"
                self._key, k = self._jax.random.split(self._key)
                action = int(
                    self._act(
                        self._jnp.asarray(self.env.observation),
                        self._jnp.asarray(self.env.legal_actions()),
                        k,
                    )
                )
                move = self._fmt_move(action, color)
                self.env.step(action)
                return True, move
            if cmd == "showboard":
                return True, "\n" + self._world_board_str()
            if cmd == "final_score":
                w = self.env.winner
                if w == 0:
                    return True, "B+"
                if w == 1:
                    return True, "W+"
                return True, "?"
            if cmd == "quit":
                return True, ""
            return False, f"unknown command: {cmd}"
        except (ValueError, KeyError, IndexError) as e:
            return False, str(e)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--board-size", type=int, default=5)
    ap.add_argument("--sb3")
    ap.add_argument("--checkpoint")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    game = CliGame(args.board_size, sb3=args.sb3, checkpoint=args.checkpoint)
    for line in sys.stdin:
        ok, payload = game.respond(line)
        prefix = "=" if ok else "?"
        print(f"{prefix} {payload}".rstrip(), flush=True)
        print(flush=True)
        if line.strip() == "quit":
            break


if __name__ == "__main__":
    main()

"""Human-vs-model GUI play.

Replaces the reference's ``scripts/play_gui_{5x5,6x6,7x7,random}.py`` family
with one CLI:

    # play the reference's own shipped SB3 checkpoint through this engine
    python scripts/play_gui.py --sb3 /root/reference/models/5x5_MLP-default_lr-0.0003_31 --board-size 5

    # play an hex_gym_env_tpu orbax params checkpoint
    python scripts/play_gui.py --checkpoint models/7x7/best --board-size 7

    # random agent (the reference's play_gui_random.py)
    python scripts/play_gui.py --board-size 11 --random

The human plays through the pygame board (click to move; `d` dark mode,
`s` probability overlay, `r` restart).  ``--agent-seat {0,1}`` picks the
model's seat like the reference's ``agent_player_num``.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--board-size", type=int, default=5)
    ap.add_argument("--sb3", help="path to a reference SB3 zip checkpoint")
    ap.add_argument("--checkpoint", help="path to an orbax params checkpoint")
    ap.add_argument("--random", action="store_true", help="random agent")
    ap.add_argument("--agent-seat", type=int, default=0, choices=[0, 1])
    ap.add_argument("--overlay", action="store_true",
                    help="show the model's move probabilities on empty cells")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hex_gym_env_tpu.compat import HexEnv, selfplay_wrapper
    from hex_gym_env_tpu.models import MlpPolicy
    from hex_gym_env_tpu.ops import masked

    n = args.board_size
    model = MlpPolicy(n_actions=n * n)

    if args.sb3:
        from hex_gym_env_tpu.models.sb3_import import sb3_to_mlp_params

        variables = sb3_to_mlp_params(args.sb3)
    elif args.checkpoint:
        from hex_gym_env_tpu.utils.checkpoint import load_params

        template = model.init(jax.random.key(0), jnp.zeros((1, n, n), jnp.float32))
        variables = load_params(args.checkpoint, template)
    else:
        args.random = True
        variables = jax.tree.map(
            jnp.zeros_like,
            model.init(jax.random.key(0), jnp.zeros((1, n, n), jnp.float32)),
        )  # zero params == uniform random over legal moves

    @jax.jit
    def act(obs, mask):
        logits, _ = model.apply(variables, obs[None].astype(jnp.float32))
        return masked.mode(logits, mask[None])[0]

    env = selfplay_wrapper(HexEnv)(
        board_size=n,
        play_gui=True,
        prob_model=(model, variables["params"]) if args.overlay else None,
        agent_player_num=args.agent_seat,
    )
    obs, _ = env.reset()
    terminated = False
    while not terminated:
        action = int(act(jnp.asarray(obs), jnp.asarray(env.legal_actions())))
        obs, reward, terminated, _, _ = env.step(action)
    winner = env.winner
    print(f"game over — winner seat: {winner}")
    env.opponent_model.gui.show_winner(winner if winner in (0, 1) else -1)
    env.opponent_model.gui.get_move()  # wait for a last key/click


if __name__ == "__main__":
    main()

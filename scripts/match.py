"""Head-to-head strength match between two policies on device.

Pits policy A vs policy B over many parallel games with alternating seats
(half the batch each way) and reports winrates.  Policies: ``--a/--b`` take
``random``, ``sb3:<path-to-reference-zip>``, or ``orbax:<path>``.

    python scripts/match.py --board-size 5 --games 1024 \
        --a orbax:models/5x5/best --b sb3:/root/reference/models/5x5_MLP-default_lr-0.0003_31
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def load_policy(spec: str, n: int, family: str = "MLP-default"):
    from hex_gym_env_tpu.models.loading import load_policy_params

    return load_policy_params(spec, n, family=family)


def run_match(board_size: int, games: int, spec_a: str, spec_b: str,
              seed: int = 0, stochastic: bool = True,
              mode: str = None, family_a: str = "MLP-default",
              family_b: str = "MLP-default") -> dict:
    """``mode`` selects per-side play style:

    - "stochastic" (default) / "deterministic": both sides alike —
      note that both-deterministic collapses to 2 distinct games;
    - "a-det" / "b-det": one side argmax, the other samples — the
      reference's own eval protocol (SB3 ``evaluate_policy`` plays the agent
      deterministically against stochastic pool opponents).
    """
    import jax
    import jax.numpy as jnp

    from hex_gym_env_tpu.core import env as hex_env
    from hex_gym_env_tpu.core.topology import get_topology
    from hex_gym_env_tpu.ops import masked

    if mode is None:
        mode = "stochastic" if stochastic else "deterministic"
    a_det = mode in ("deterministic", "a-det")
    b_det = mode in ("deterministic", "b-det")

    topo = get_topology(board_size)
    model_a, params_a = load_policy(spec_a, board_size, family_a)
    model_b, params_b = load_policy(spec_b, board_size, family_b)
    B = games

    # env i: policy A holds seat (i mod 2) — alternating-seat pairing
    seat_a = jnp.arange(B, dtype=jnp.int32) % 2

    def pick_action(model, params, st, key, deterministic):
        obs = hex_env.observe(topo, st).astype(jnp.float32)
        legal = hex_env.legal_mask(topo, st)
        logits, _ = model.apply(params, obs)
        if deterministic:
            return masked.mode(logits, legal)
        return masked.sample(key, logits, legal)

    @jax.jit
    def play(key):
        st = hex_env.initial_state(topo, B)

        def half_move(st, key):
            """one ply: whoever is to move acts with their own policy"""
            ka, kb = jax.random.split(key)
            a_act = pick_action(model_a, params_a, st, ka, a_det)
            b_act = pick_action(model_b, params_b, st, kb, b_det)
            a_turn = st.to_move == seat_a
            action = jnp.where(a_turn, a_act, b_act)
            st, _ = hex_env.step(topo, st, action)
            return st

        def body(carry, k):
            return half_move(carry, k), None

        st, _ = jax.lax.scan(body, st, jax.random.split(key, topo.num_cells + 1))
        return st.winner

    winners = np.asarray(play(jax.random.key(seed)))
    a_wins = int((winners == np.asarray(seat_a)).sum())
    b_wins = int((winners == 1 - np.asarray(seat_a)).sum())
    return {
        "games": games,
        "mode": mode,
        "a": spec_a,
        "b": spec_b,
        "a_winrate": a_wins / games,
        "b_winrate": b_wins / games,
        "a_wins_as_seat0": int(((winners == 0) & (np.asarray(seat_a) == 0)).sum()),
        "a_wins_as_seat1": int(((winners == 1) & (np.asarray(seat_a) == 1)).sum()),
        "undecided": int((winners < 0).sum() + (winners == 2).sum() + (winners == 3).sum()),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--board-size", type=int, default=5)
    ap.add_argument("--games", type=int, default=1024)
    ap.add_argument("--a", default="random")
    ap.add_argument("--b", default="random")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--deterministic", action="store_true")
    ap.add_argument("--mode", default=None,
                    choices=["stochastic", "deterministic", "a-det", "b-det"])
    ap.add_argument("--a-family", default="MLP-default",
                    help="architecture of --a (make_policy name, e.g. CNN)")
    ap.add_argument("--b-family", default="MLP-default")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    out = run_match(
        args.board_size, args.games, args.a, args.b,
        seed=args.seed, stochastic=not args.deterministic,
        mode=args.mode, family_a=args.a_family, family_b=args.b_family,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Legacy outer-loop selfplay protocol (reference ``scripts/selfplay.py``).

The reference's older pipeline trains in short bursts and then REBUILDS the
env with an opponent sampled from a model-history list — 80% the latest
model / 20% uniform from history (``scripts/selfplay.py:59-92``).  That
protocol maps exactly onto this framework's opponent bank: "latest" is the
bank's best snapshot (best_prob=0.8) and "history" is the pool, appended
round-robin after every burst.  Everything stays on device; only the
burst/append cadence is host-driven.

    python scripts/train_legacy.py --board-size 5 --bursts 20 --history 10
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--board-size", type=int, default=5)
    ap.add_argument("--bursts", type=int, default=20,
                    help="outer-loop iterations (reference: 'generations')")
    ap.add_argument("--burst-steps", type=int, default=8192,
                    help="agent transitions per burst (reference: learn(100-500))")
    ap.add_argument("--history", type=int, default=10, help="model-history size")
    ap.add_argument("--n-envs", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from hex_gym_env_tpu.train import SelfplayPPO
    from hex_gym_env_tpu.train.bank import OpponentBank
    from hex_gym_env_tpu.utils.config import PPOConfig, SelfplayConfig, TrainConfig

    n_steps = max(1, args.burst_steps // args.n_envs)
    cfg = TrainConfig(
        ppo=PPOConfig(n_steps=n_steps, minibatch_size=min(256, n_steps * args.n_envs)),
        selfplay=SelfplayConfig(
            board_size=args.board_size,
            n_envs=args.n_envs,
            buffer_size=args.history,
            best_prob=0.8,  # 80% latest / 20% history, selfplay.py:61-92
        ),
        total_timesteps=args.bursts * n_steps * args.n_envs,
        model_name=f"legacy_{args.board_size}x{args.board_size}",
    )
    algo = SelfplayPPO(cfg)
    state = algo.init_state(jax.random.key(cfg.selfplay.seed))
    step = jax.jit(algo.train_step)

    def append_to_history(bank: OpponentBank, params, slot: int) -> OpponentBank:
        new_stack = jax.tree.map(
            lambda stack, p: stack.at[slot].set(p), bank.params, params
        )
        return OpponentBank(
            params=new_stack,
            scores=bank.scores.at[slot].set(float(burst)),
            best_params=params,  # "latest" plays the 80% role
            best_score=jnp.float32(burst),
        )

    for burst in range(1, args.bursts + 1):
        state, metrics = step(state)
        slot = (burst - 1) % args.history
        state = state.replace(
            bank=append_to_history(state.bank, state.params, slot)
        )
        print(
            f"burst {burst}/{args.bursts}: steps={algo.timesteps(state)} "
            f"ep_rew={float(metrics.mean_episode_reward):+.3f} "
            f"episodes={int(metrics.episodes_finished)}",
            flush=True,
        )

    from hex_gym_env_tpu.utils.checkpoint import save_params

    out = f"models/{cfg.model_name}/final"
    save_params(out, state.params)
    print(f"saved {out}")


if __name__ == "__main__":
    main()

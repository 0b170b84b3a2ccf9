"""End-to-end on-chip verification probe (the /verify recipe, step 4).

Trains a 5x5 agent for a couple of million transitions with the fastest
implementation stack (fused whole-rollout kernel + pallas-fast sweep), then
evals against a fresh all-random pool: mean eval reward must clear +0.5
(>= 75% winrate vs random) for the run to count as learning.  Exercises the
full hot path on real hardware — Mosaic lowering, hardware PRNG, bank
packing, GAE, the sweep — not just the interpreter.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hex_gym_env_tpu.train.bank import init_bank
from hex_gym_env_tpu.train.selfplay import SelfplayPPO
from hex_gym_env_tpu.utils.config import PPOConfig, SelfplayConfig, TrainConfig
from hex_gym_env_tpu.utils.profiling import _drain


def main() -> None:
    impl = sys.argv[1] if len(sys.argv) > 1 else "pallas-fast"
    cfg = TrainConfig(
        ppo=PPOConfig(
            n_steps=64, minibatch_size=512, update_impl=impl,
        ),
        selfplay=SelfplayConfig(
            board_size=5, n_envs=256, buffer_size=20,
            rollout_impl="auto", eval_freq=10**9,
        ),
    )
    algo = SelfplayPPO(cfg)
    state = algo.init_state(jax.random.key(0))
    per_iter = cfg.ppo.n_steps * cfg.selfplay.n_envs

    steps = jax.jit(lambda s: algo.train_steps(s, 16)[0])
    t0 = time.perf_counter()
    for chunk in range(8):  # 128 iterations = ~2.1M transitions
        state = steps(state)
    _drain(state.params)
    dt = time.perf_counter() - t0

    # eval vs a FRESH all-random pool (zero params == BaseRandomPolicy)
    random_bank = init_bank(state.params, cfg.selfplay.buffer_size)
    rewards = algo.evaluator.play_vs_pool(
        state.params, random_bank, jax.random.key(123),
        fixed_seats=state.carry.agent_seat,
    )
    mean_r = float(rewards.mean())
    transitions = int(state.iteration) * per_iter
    out = {
        "update_impl": impl,
        "transitions": transitions,
        "seconds": round(dt, 2),
        "transitions_per_s": round(transitions / dt),
        "eval_mean_reward_vs_random": round(mean_r, 4),
        "pass": mean_r > 0.5,
    }
    print(json.dumps(out))
    if not out["pass"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()

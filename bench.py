"""Headline benchmark: Hex env-steps/s per chip (7x7, batch 8192).

Matches BASELINE.json config 3: a lockstep scripted rollout over 8192
seven-by-seven games — uniform-random *legal* moves (masked categorical over
zero logits, i.e. the reference's BaseRandomPolicy), full win-check every
move, auto-reset on termination.  Every scan iteration applies one stone per
game, so steps/s counts completed ``env.step`` transitions per second.

vs_baseline is measured against the driver north-star target of 10M
env-steps/s on one host (BASELINE.md; the reference itself publishes no
benchmarks — its code comments imply low-hundreds of games/s on a laptop
CPU, i.e. ~10k steps/s).

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

from hex_gym_env_tpu.core import env as hex_env
from hex_gym_env_tpu.core.topology import get_topology
from hex_gym_env_tpu.ops import masked

BOARD = 7
BATCH = 8192
STEPS_PER_CALL = 512
REPEATS = 5
TARGET = 10_000_000.0


def main() -> None:
    topo = get_topology(BOARD)
    fresh = hex_env.initial_state(topo, BATCH)

    @jax.jit
    def run(state, key):
        zeros = jnp.zeros((BATCH, topo.num_cells), jnp.float32)

        def body(carry, k):
            st = carry
            legal = hex_env.legal_mask(topo, st)
            action = masked.sample(k, zeros, legal)
            st, _ = hex_env.step(topo, st, action)
            st = hex_env.reset_where(topo, st, st.done, fresh)
            return st, None

        state, _ = jax.lax.scan(body, state, jax.random.split(key, STEPS_PER_CALL))
        return state

    state = hex_env.initial_state(topo, BATCH)
    state = run(state, jax.random.key(0))
    jax.block_until_ready(state)  # compile + warmup

    t0 = time.perf_counter()
    for i in range(REPEATS):
        state = run(state, jax.random.key(i + 1))
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    steps_per_s = REPEATS * STEPS_PER_CALL * BATCH / dt
    print(
        json.dumps(
            {
                "metric": "hex_env_steps_per_s_7x7_b8192",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

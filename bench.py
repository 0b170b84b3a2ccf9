"""Headline benchmark: Hex env-steps/s per chip (7x7, batch 8192).

Matches BASELINE.json config 3: lockstep rollouts over 8192 seven-by-seven
games — uniform-random *legal* moves, full win-check every move, auto-reset
on termination; steps/s counts applied moves per second.

Two implementations of the same semantics are measured and the faster wins:

1. the fused Pallas kernel (``ops/pallas_step.random_rollout``): all T steps
   inside one kernel launch, state VMEM-resident, hardware PRNG;
2. the composable lax path (public ``core.env`` API under ``lax.scan``).

vs_baseline is against the driver north-star target of 10M env-steps/s on
one host (BASELINE.md; the reference itself publishes no numbers — its code
comments imply low-hundreds of games/s ≈ 1e4 steps/s on a laptop).

Prints exactly one JSON line.
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from hex_gym_env_tpu.core import env as hex_env
from hex_gym_env_tpu.core.topology import get_topology
from hex_gym_env_tpu.ops import masked, pallas_step

BOARD = 7
BATCH = 8192
STEPS_PER_CALL = 512
REPEATS = 5
TARGET = 10_000_000.0


def drain(x) -> None:
    """Force completion: ``block_until_ready`` alone can return early on the
    tunneled-TPU backend, which would inflate the rate; fetching one element
    guarantees the queue has fully executed."""
    jax.block_until_ready(x)
    jax.device_get(jax.tree.leaves(x)[0].ravel()[:1])


def bench_lax(topo) -> float:
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
    drain(state)

    t0 = time.perf_counter()
    for i in range(REPEATS):
        state = run(state, jax.random.key(i + 1))
    drain(state)
    dt = time.perf_counter() - t0
    return REPEATS * STEPS_PER_CALL * BATCH / dt


def bench_pallas(topo) -> float:
    run = jax.jit(
        lambda st, seed: pallas_step.random_rollout(topo, st, seed, STEPS_PER_CALL)
    )
    state = hex_env.initial_state(topo, BATCH)
    state, games = run(state, 0)
    drain(state)
    if int(games.sum()) <= 0:
        raise RuntimeError("fused rollout finished no games — refusing to report")

    t0 = time.perf_counter()
    for i in range(REPEATS):
        state, games = run(state, i + 1)
    drain(state)
    dt = time.perf_counter() - t0
    return REPEATS * STEPS_PER_CALL * BATCH / dt


def main() -> None:
    topo = get_topology(BOARD)
    pallas_rate, pallas_error = 0.0, None
    try:
        pallas_rate = bench_pallas(topo)
    except Exception as e:  # a Pallas regression must be loud, not a silent lax fallback
        pallas_error = f"{type(e).__name__}: {e}"
    lax_rate = bench_lax(topo)
    steps_per_s = max(pallas_rate, lax_rate)
    record = {
        "metric": "hex_env_steps_per_s_7x7_b8192",
        "value": round(steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / TARGET, 3),
        "pallas_steps_per_s": round(pallas_rate, 1),
        "lax_steps_per_s": round(lax_rate, 1),
        "winner": "pallas" if pallas_rate >= lax_rate else "lax",
    }
    if pallas_error is not None:
        record["pallas_error"] = pallas_error
    print(json.dumps(record))


if __name__ == "__main__":
    main()

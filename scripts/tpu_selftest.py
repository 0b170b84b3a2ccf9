"""On-hardware selftest: checks that only make sense on a real TPU.

The CPU test suite runs every Pallas kernel in interpret mode with injected
random bits (`tests/conftest.py` forces the cpu backend), so the hardware
PRNG branch (`pltpu.prng_seed` / `prng_random_bits`, `ops/pallas_policy.py`)
is exercised only here.  Run on a chip:

    python scripts/tpu_selftest.py

Checks:
  1. pallas env step == lax env step bitwise on a random playout;
  2. hardware-PRNG masked sampling statistics: a zero-params agent must draw
     uniformly over legal cells (chi-square on opening-move frequencies),
     and every sampled action must be legal;
  3. two different keys give different action streams; the same key twice
     gives the same stream (the launch seeding is deterministic).

All checks drive the kernels through the full jitted rollout program —
standalone single-kernel launches are known to wedge over the axon tunnel
(see RESULTS.md), and the rollout is the production consumer anyway.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    assert jax.default_backend() == "tpu", (
        f"selftest needs a TPU backend, got {jax.default_backend()}"
    )
    print(f"devices: {jax.devices()}")

    from hex_gym_env_tpu.core import env as hex_env
    from hex_gym_env_tpu.core.topology import get_topology
    from hex_gym_env_tpu.ops import pallas_step
    from hex_gym_env_tpu.train import SelfplayPPO
    from hex_gym_env_tpu.utils.config import (
        PPOConfig, SelfplayConfig, TrainConfig,
    )

    # -- 1. pallas step == lax step bitwise --------------------------------
    topo = get_topology(7)
    B = 512

    def playout(step_fn, key):
        st = hex_env.initial_state(topo, B)

        def body(st, k):
            legal = hex_env.legal_mask(topo, st)
            # uniform legal draw via exponential race (shared stream)
            u = jax.random.uniform(k, legal.shape)
            a = jnp.argmax(jnp.where(legal, u, -1.0), axis=-1).astype(jnp.int32)
            st, rew = step_fn(topo, st, a)
            return st, (st.board if hasattr(st, "board") else a, rew, st.done)

        keys = jax.random.split(key, 30)
        st, trace = jax.lax.scan(body, st, keys)
        return st, trace

    lax_f = jax.jit(lambda k: playout(hex_env.step, k))
    pal_f = jax.jit(lambda k: playout(pallas_step.step, k))
    s1, t1 = lax_f(jax.random.key(7))
    s2, t2 = pal_f(jax.random.key(7))
    for a, b in zip(jax.tree.leaves((s1, t1)), jax.tree.leaves((s2, t2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("1. pallas step == lax step bitwise over 30-move playouts: OK")

    # -- 2/3. hardware-PRNG sampling statistics through the rollout --------
    cfg = TrainConfig(
        ppo=PPOConfig(n_steps=1, minibatch_size=256),
        selfplay=SelfplayConfig(
            board_size=5, n_envs=4096, buffer_size=2, policy="MLP-default",
            policy_impl="pallas", env_step_impl="pallas", seed=0,
        ),
        total_timesteps=1,
    )
    algo = SelfplayPPO(cfg)
    state = algo.init_state(jax.random.key(0))
    # zero the agent params -> constant logits -> masked-uniform sampling
    zero_vars = jax.tree.map(jnp.zeros_like, state.params)

    run = jax.jit(
        lambda p, b, c, k: algo.runner.run(p, b, c, k, 1), donate_argnums=()
    )

    def first_actions(key):
        # fresh empty boards; agent holds seat 0 everywhere so the very
        # first transition's action is an opening move on an empty board
        carry = state.carry.replace(
            env=hex_env.initial_state(topo5, cfg.selfplay.n_envs),
            agent_seat=jnp.zeros((cfg.selfplay.n_envs,), jnp.int32),
        )
        _, tr, _ = run(zero_vars, state.bank, carry, key)
        return np.asarray(tr.action[0]), np.asarray(tr.legal[0])

    topo5 = algo.topo
    acts_a, legal_a = first_actions(jax.random.key(1))
    acts_b, _ = first_actions(jax.random.key(2))
    acts_a2, _ = first_actions(jax.random.key(1))

    # legality of every draw
    assert legal_a[np.arange(len(acts_a)), acts_a].all(), "illegal action drawn"
    # determinism per key; difference across keys
    np.testing.assert_array_equal(acts_a, acts_a2)
    assert not np.array_equal(acts_a, acts_b), "different keys gave same stream"
    print("2a. legality + per-key determinism + cross-key divergence: OK")

    # chi-square uniformity over the 25 opening cells
    counts = np.bincount(acts_a, minlength=25).astype(np.float64)
    n, k = counts.sum(), 25
    expected = n / k
    chi2 = ((counts - expected) ** 2 / expected).sum()
    # dof = 24; P(chi2 > 51.2) ~ 0.001
    print(f"2b. opening-move chi-square: {chi2:.1f} (dof 24, crit@0.001 = 51.2)")
    assert chi2 < 51.2, f"opening-move distribution not uniform: chi2={chi2:.1f}"

    # opponent-bank kernel: after one transition from empty boards every
    # live game holds exactly 2 stones (agent move + bank member's reply),
    # proving the fused bank kernel acted and its draws were legal
    carry2, tr, _ = run(zero_vars, state.bank, state.carry.replace(
        env=hex_env.initial_state(topo5, cfg.selfplay.n_envs),
        agent_seat=jnp.zeros((cfg.selfplay.n_envs,), jnp.int32),
    ), jax.random.key(3))
    boards = np.asarray(hex_env.world_boards(topo5, carry2.env))
    stones = (boards != 0).sum(axis=(1, 2))
    assert (stones == 2).all(), f"expected 2 stones everywhere, got {set(stones)}"
    print("3. opponent-bank kernel replied legally inside the same program: OK")

    print("TPU selftest PASSED")


if __name__ == "__main__":
    main()

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

    # -- 4. whole-rollout mega-kernel: hardware trajectory replay ----------
    # the CI replay test runs the kernel in interpret mode; this replays a
    # REAL hardware execution (device PRNG, Mosaic lowering) through the
    # independent lax env ops — every emitted obs/action/reward/done/reset
    # and the final carry must re-derive exactly
    from hex_gym_env_tpu.ops import pallas_rollout as pr

    cfg4 = TrainConfig(
        ppo=PPOConfig(n_steps=16, minibatch_size=256),
        selfplay=SelfplayConfig(
            board_size=5, n_envs=128, buffer_size=4, policy="MLP-default",
            rollout_impl="fused", seed=0,
        ),
    )
    algo4 = SelfplayPPO(cfg4)
    st4 = algo4.init_state(jax.random.key(4))
    # non-trivial agent + opponents: reuse freshly initialized params
    runner4 = algo4.runner
    pol4 = runner4.fused_pol
    assert pol4 is not None and not pol4.interpret
    packed = pol4.pack_agent(st4.params["params"])
    stacked = pol4.stack_bank(st4.bank)
    n5 = algo4.topo.n
    members = jax.vmap(
        lambda v: algo4.model.apply(v, jnp.zeros((1, n5, n5), jnp.float32))[0][0]
    )(st4.bank.params)
    best = algo4.model.apply(
        st4.bank.best_params, jnp.zeros((1, n5, n5), jnp.float32)
    )[0][0]
    ft = jnp.concatenate([members, best[None]], axis=0)
    P1 = stacked.n_members
    P1c = stacked.tensors[-1].shape[0]
    ft = jnp.pad(ft.astype(jnp.float32), ((0, P1c - P1), (0, 0)))
    out4 = jax.jit(
        lambda key: pr.fused_rollout(
            algo4.topo, pol4, packed, stacked.tensors, ft, st4.carry.env,
            dict(
                n_members=P1, agent_seat=st4.carry.agent_seat,
                use_best=st4.carry.use_best, opp_idx=st4.carry.opp_idx,
            ),
            key, 16, cfg4.selfplay.best_prob, True, interpret=False,
        )
    )(jax.random.key(44))
    # atol: TPU "f32" matmuls run as bf16 MXU passes under default
    # precision — kernel and XLA tile differently, so value/logp agree only
    # to ~1e-3; every env-semantic field (actions, rewards, dones, resets,
    # final carry) is still compared EXACTLY
    pr.verify_rollout_trajectory(
        algo4.topo, algo4.model, st4.params, st4.carry, out4, 16,
        "per_episode", cfg4.selfplay.buffer_size, atol=5e-3,
    )
    assert np.asarray(out4.ints[..., pr.I_DONE]).sum() > 0
    print("4. fused-rollout hardware execution replays exactly on host: OK")

    # -- 5. Pallas GAE kernel == lax recurrence on hardware ----------------
    from hex_gym_env_tpu.ops import pallas_gae
    from hex_gym_env_tpu.train import gae as gae_mod

    kk = jax.random.split(jax.random.key(5), 4)
    T5, B5 = 128, 256
    rewards = jnp.where(
        jax.random.uniform(kk[0], (T5, B5)) < 0.1,
        jnp.sign(jax.random.normal(kk[1], (T5, B5))), 0.0,
    )
    values = jax.random.normal(kk[1], (T5, B5)) * 0.5
    dones = jax.random.uniform(kk[2], (T5, B5)) < 0.15
    lastv = jax.random.normal(kk[3], (B5,)) * 0.5
    a_l, r_l = jax.jit(lambda *a: gae_mod.compute_gae(*a, 0.99, 0.95))(
        rewards, values, dones, lastv
    )
    a_p, r_p = jax.jit(lambda *a: pallas_gae.compute_gae(*a, 0.99, 0.95))(
        rewards, values, dones, lastv
    )
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_l), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_l), rtol=1e-6, atol=1e-6)
    print("5. Pallas GAE == lax GAE on hardware: OK")

    # -- 6. pallas-fast sweep == lax/optax replay of its schedule ----------
    import optax

    from hex_gym_env_tpu.ops import pallas_ppo
    from hex_gym_env_tpu.train import ppo as ppo_mod

    model6 = algo4.model
    cfg6 = PPOConfig(minibatch_size=64, n_epochs=2)
    n6 = 256
    vars6 = st4.params
    opt6 = ppo_mod.make_optimizer(cfg6)
    ostate6 = opt6.init(vars6["params"])
    rng = np.random.default_rng(0)
    boards6 = rng.choice(np.array([-1, 0, 1], np.int8), size=(n6, n5, n5))
    boards6.reshape(n6, -1)[np.arange(n6), rng.integers(0, n5 * n5, n6)] = 0
    legal6 = boards6.reshape(n6, -1) == 0
    u6 = rng.random((n6, n5 * n5))
    batch6 = ppo_mod.PPOBatch(
        obs=jnp.asarray(boards6),
        legal=jnp.asarray(legal6),
        action=jnp.asarray(
            np.argmax(np.where(legal6, u6, -1.0), axis=1).astype(np.int32)
        ),
        log_prob_old=jnp.asarray(rng.normal(-2.5, 0.3, n6).astype(np.float32)),
        value_old=jnp.zeros((n6,), jnp.float32),
        advantage=jnp.asarray(rng.normal(0, 1, n6).astype(np.float32)),
        ret=jnp.asarray(rng.normal(0, 0.7, n6).astype(np.float32)),
    )
    key6 = jax.random.key(66)
    vars_f, opt_f, _ = jax.jit(
        pallas_ppo.make_pallas_fast_update_fn(model6, cfg6)
    )(vars6, ostate6, batch6, key6)
    rowperm, order = jax.jit(
        lambda k: pallas_ppo.fast_schedule(k, n6, cfg6.minibatch_size, cfg6.n_epochs)
    )(key6)
    blocks = np.asarray(rowperm).reshape(-1, cfg6.minibatch_size)
    grad_fn = jax.jit(jax.grad(ppo_mod.make_loss_fn(model6, cfg6), has_aux=True))
    params6, ost = vars6["params"], ostate6
    for blk in np.asarray(order):
        mb = jax.tree.map(lambda x: x[jnp.asarray(blocks[blk])], batch6)
        grads, _ = grad_fn(params6, {}, mb)
        updates, ost = opt6.update(grads, ost, params6)
        params6 = optax.apply_updates(params6, updates)
    # same MXU default-precision caveat: the kernel's grads and XLA's
    # autodiff grads each carry ~1e-3 bf16-pass noise, Adam-normalized over
    # the sweep; the schedule/structure equality is what this pins (exact
    # f32 equality is pinned in CI interpret mode, tests/test_pallas_ppo.py)
    for a, b in zip(jax.tree.leaves(params6), jax.tree.leaves(vars_f["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-3)
    print("6. pallas-fast sweep == schedule replay on hardware: OK")

    print("TPU selftest PASSED")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--repeats", type=int, default=0,
        help="after the correctness checks, run the headline benchmark "
             "with this many timed samples per path (bench.py --repeats; "
             "0 = checks only)",
    )
    args = ap.parse_args()
    main()
    if args.repeats > 0:
        import os

        # bench.py lives at the repo root; resolve it regardless of cwd
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import bench

        bench.main(repeats=args.repeats)

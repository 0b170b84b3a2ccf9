"""Trajectory-level replay verification of the whole-rollout mega-kernel.

The fused kernel (``ops/pallas_rollout``) runs T selfplay transitions in one
Pallas launch.  In interpreter mode every random draw is injected, so the
emitted per-step record (obs, actions, opponent/first moves, reset draws) is
sufficient to REPLAY the whole rollout through the independent lax env ops
(``core/env.py``, themselves golden-parity-tested) and assert exact
equality: observations, legal masks, rewards, dones, reset bookkeeping, and
the final carry state down to the connectivity labels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hex_gym_env_tpu.core import env as hex_env
from hex_gym_env_tpu.core.topology import get_topology
from hex_gym_env_tpu.models import make_policy
from hex_gym_env_tpu.ops import pallas_rollout as pr
from hex_gym_env_tpu.ops.pallas_policy import PolicyOps
from hex_gym_env_tpu.train.bank import OpponentBank, init_bank
from hex_gym_env_tpu.train.rollout import SelfplayRunner
from hex_gym_env_tpu.train.selfplay import SelfplayPPO
from hex_gym_env_tpu.utils.config import PPOConfig, SelfplayConfig, TrainConfig

N = 5
B = 16
T = 12
POOL = 4


def _setup(seat_mode="per_episode"):
    topo = get_topology(N)
    model = make_policy("MLP-default", topo.num_cells)
    k = jax.random.key(7)
    ks = jax.random.split(k, POOL + 3)
    dummy = jnp.zeros((1, N, N), jnp.float32)
    variables = model.init(ks[0], dummy)
    bank0 = init_bank(variables, POOL)
    # non-trivial, mutually distinct opponents (incl. a distinct best)
    members = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[model.init(ks[i + 1], dummy) for i in range(POOL)],
    )
    bank = OpponentBank(
        params=members,
        scores=bank0.scores,
        best_params=model.init(ks[POOL + 1], dummy),
        best_score=bank0.best_score,
    )
    cfg = SelfplayConfig(
        board_size=N, n_envs=B, buffer_size=POOL, seat_mode=seat_mode,
        rollout_impl="fused", policy_impl="lax", env_step_impl="lax",
    )
    runner = SelfplayRunner(topo, model, cfg)
    assert runner.fused_pol is not None
    carry = runner.init_carry(bank, ks[POOL + 2])
    return topo, model, runner, variables, bank, carry, cfg


def _raw_rollout(topo, model, runner, variables, bank, carry, cfg, key, bank_bf16=False):
    pol = runner.fused_pol
    packed = pol.pack_agent(variables["params"])
    stacked = pol.stack_bank(bank)
    dummy = jnp.zeros((1, N, N), jnp.float32)
    members = jax.vmap(lambda v: model.apply(v, dummy)[0][0])(bank.params)
    best = model.apply(bank.best_params, dummy)[0][0]
    ft = jnp.concatenate([members, best[None]], axis=0)
    P1 = stacked.n_members
    P1c = stacked.tensors[-1].shape[0]
    ft = jnp.pad(ft.astype(jnp.float32), ((0, P1c - P1), (0, 0)))
    return pr.fused_rollout(
        topo, pol, packed, stacked.tensors, ft, carry.env,
        dict(
            n_members=P1, agent_seat=carry.agent_seat,
            use_best=carry.use_best, opp_idx=carry.opp_idx,
        ),
        key, T, cfg.best_prob, cfg.seat_mode == "per_episode",
        interpret=True, bank_bf16=bank_bf16,
    )


@pytest.mark.parametrize("seat_mode", ["per_episode", "fixed_random"])
def test_fused_rollout_replays_exactly(seat_mode):
    topo, model, runner, variables, bank, carry, cfg = _setup(seat_mode)
    key = jax.random.key(11)
    out = _raw_rollout(topo, model, runner, variables, bank, carry, cfg, key)
    pr.verify_rollout_trajectory(
        topo, model, variables, carry, out, T, seat_mode, POOL
    )
    # episodes do finish within the horizon, so resets were exercised
    assert np.asarray(out.ints[..., pr.I_DONE]).sum() > 0


def test_fused_rollout_bf16_bank_still_replays_exactly():
    """bf16 bank matmuls change opponent LOGITS only; every env-semantic
    invariant (and the agent's exact f32 value/logp) must still replay."""
    topo, model, runner, variables, bank, carry, cfg = _setup()
    out = _raw_rollout(
        topo, model, runner, variables, bank, carry, cfg,
        jax.random.key(13), bank_bf16=True,
    )
    pr.verify_rollout_trajectory(
        topo, model, variables, carry, out, T, "per_episode", POOL
    )


def test_runner_fused_api_matches_raw():
    topo, model, runner, variables, bank, carry, cfg = _setup()
    key = jax.random.key(11)
    out = _raw_rollout(topo, model, runner, variables, bank, carry, cfg, key)
    carry2, tr, last_values = runner.run(variables, bank, carry, key, T)

    F = topo.num_cells
    np.testing.assert_array_equal(
        np.asarray(tr.obs).reshape(T, B, F),
        np.asarray(out.obs[:, :, :F]),
    )
    np.testing.assert_array_equal(
        np.asarray(tr.action), np.asarray(out.ints[..., pr.I_ACTION])
    )
    np.testing.assert_array_equal(
        np.asarray(tr.done), np.asarray(out.ints[..., pr.I_DONE]) != 0
    )
    np.testing.assert_array_equal(
        np.asarray(tr.legal), np.asarray(out.obs[:, :, :F] == 0)
    )
    # last_values = the value head on the final carry's observation
    _, value = model.apply(
        variables, hex_env.observe(topo, carry2.env).astype(jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(last_values), np.asarray(value), atol=1e-6
    )


def test_train_step_with_fused_rollout_smoke():
    cfg = TrainConfig(
        ppo=PPOConfig(n_steps=8, minibatch_size=16, n_epochs=2, update_impl="lax"),
        selfplay=SelfplayConfig(
            board_size=N, n_envs=B, buffer_size=POOL,
            rollout_impl="fused", policy_impl="lax", env_step_impl="lax",
        ),
    )
    algo = SelfplayPPO(cfg)
    state = algo.init_state(jax.random.key(0))
    state2, metrics = jax.jit(algo.train_step)(state)
    assert int(state2.iteration) == 1
    assert np.isfinite(float(metrics.ppo.policy_loss))
    assert np.isfinite(float(metrics.ppo.value_loss))
    assert int(metrics.episodes_finished) > 0


def test_fused_eval_replays_exactly():
    """Eval-mode mega-kernel: argmax agent, stochastic served opponents,
    freeze-at-done — replayed through the lax env ops step by step, and the
    Evaluator's fused path must return exactly the replayed totals."""
    from hex_gym_env_tpu.ops import masked as masked_ops
    from hex_gym_env_tpu.train.evaluate import Evaluator, eval_seats, serve_indices

    topo, model, runner, variables, bank, carry, cfg = _setup()
    ev = Evaluator(topo, model, cfg)
    assert ev.fused_pol is not None and ev.fused_pol.interpret
    key = jax.random.key(77)
    totals = ev.play_vs_pool(variables, bank, key)

    # replicate the fused path's prologue to regenerate the kernel record
    pol = ev.fused_pol
    E = cfg.eval_episodes
    serve = serve_indices(E, bank.size)
    k_seat, k_first, k_play = jax.random.split(key, 3)
    seat = eval_seats(cfg, k_seat, E, None)
    state = hex_env.initial_state(topo, E)
    empty_b = jnp.zeros((1, N, N), jnp.float32)
    members = jax.vmap(lambda v: model.apply(v, empty_b)[0][0])(bank.params)
    a0 = masked_ops.sample(
        jax.random.split(key, 3)[1], members[serve],
        jnp.ones((E, topo.num_cells), bool),
    )
    state, _ = hex_env.step(topo, state, a0, active=seat == 1)

    packed = pol.pack_agent(variables["params"])
    stacked = pol.stack_bank(bank)
    P1 = stacked.n_members
    P1c = stacked.tensors[-1].shape[0]
    ft = jnp.zeros((P1c, topo.num_cells), jnp.float32)
    n_pairs = topo.num_cells // 2 + 2
    out = pr.fused_rollout(
        topo, pol, packed, stacked.tensors, ft, state,
        dict(n_members=P1, agent_seat=seat,
             use_best=jnp.zeros((E,), bool), opp_idx=serve.astype(jnp.int32)),
        k_play, n_pairs, cfg.best_prob, False,
        interpret=True, eval_mode=True,
    )

    # replay: every step must re-derive from the lax env + argmax policy
    ar = np.arange(E)
    seat_np = np.asarray(seat)
    st = state
    total = np.zeros((E,), np.float32)
    for t in range(n_pairs):
        obs_ref = np.asarray(hex_env.observe(topo, st))
        np.testing.assert_array_equal(
            np.asarray(out.obs[t][:, : topo.num_cells]).reshape(E, N, N), obs_ref
        )
        legal = np.asarray(hex_env.legal_mask(topo, st))
        logits, _ = model.apply(variables, obs_ref.astype(jnp.float32))
        a_det = np.asarray(masked_ops.mode(logits, jnp.asarray(legal)))
        a = np.asarray(out.ints[t, :, pr.I_ACTION])
        live = ~np.asarray(st.done)
        np.testing.assert_array_equal(a[live], a_det[live])
        st1, rew1 = hex_env.step(topo, st, jnp.asarray(a))
        oa = np.asarray(out.ints[t, :, pr.I_OPP_ACTION])
        act2 = ~np.asarray(st1.done)
        legal2 = np.asarray(hex_env.legal_mask(topo, st1))
        assert legal2[ar, oa][act2].all()
        st2, rew2 = hex_env.step(topo, st1, jnp.asarray(oa), active=jnp.asarray(act2))
        got = np.asarray(rew1)[ar, seat_np] + np.asarray(rew2)[ar, seat_np]
        np.testing.assert_allclose(np.asarray(out.flts[t, :, pr.F_REWARD]), got)
        total += got
        st = st2

    assert np.asarray(st.done).all(), "eval horizon must finish every game"
    np.testing.assert_allclose(np.asarray(totals), total)
    assert set(np.asarray(totals).tolist()) <= {-1.0, 0.0, 1.0}


def test_supported_gates_large_boards():
    """Boards needing >128 lanes (12x12+) must fall back to the scan path
    rather than fail at trace time — the kernel hardcodes 128-lane packing
    (cells + 4 meta slots)."""
    model = make_policy("MLP-default", 12 * 12)
    cfg = SelfplayConfig(board_size=12, n_envs=8, buffer_size=4)
    assert not pr.supported(model, cfg)
    cfg11 = SelfplayConfig(board_size=11, n_envs=8, buffer_size=4)
    assert pr.supported(make_policy("MLP-default", 11 * 11), cfg11)


def test_gae_impl_flag():
    """gae_impl pins the GAE lowering: 'lax' always takes the scan, and
    'pallas' raises when n_steps exceeds the kernel's unroll bound instead
    of silently swapping backends (ADVICE r3)."""
    from hex_gym_env_tpu.ops import pallas_gae
    from hex_gym_env_tpu.train import gae as gae_mod

    cfg = TrainConfig(
        ppo=PPOConfig(n_steps=16, minibatch_size=64, gae_impl="lax"),
        selfplay=SelfplayConfig(board_size=5, n_envs=8, buffer_size=4),
        total_timesteps=128,
    )
    assert SelfplayPPO(cfg).gae_fn is gae_mod.compute_gae

    big = TrainConfig(
        ppo=PPOConfig(
            n_steps=pallas_gae.MAX_UNROLL_STEPS + 1,
            minibatch_size=64,
            gae_impl="pallas",
        ),
        selfplay=SelfplayConfig(board_size=5, n_envs=64, buffer_size=4),
        total_timesteps=128,
    )
    with pytest.raises(ValueError, match="gae_impl"):
        SelfplayPPO(big)

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


def _raw_rollout(topo, model, runner, variables, bank, carry, cfg, key):
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
        interpret=True,
    )


@pytest.mark.parametrize("seat_mode", ["per_episode", "fixed_random"])
def test_fused_rollout_replays_exactly(seat_mode):
    topo, model, runner, variables, bank, carry, cfg = _setup(seat_mode)
    key = jax.random.key(11)
    out = _raw_rollout(topo, model, runner, variables, bank, carry, cfg, key)

    F = topo.num_cells
    ar = np.arange(B)
    state = carry.env
    seat = np.asarray(carry.agent_seat)
    use_best = np.asarray(carry.use_best)
    opp_idx = np.asarray(carry.opp_idx)
    fresh = hex_env.initial_state(topo, B)

    for t in range(T):
        obs_ref = np.asarray(hex_env.observe(topo, state))  # (B, N, N) int8
        obs_out = np.asarray(out.obs[t][:, :F]).reshape(B, N, N)
        np.testing.assert_array_equal(obs_out, obs_ref)
        legal_ref = np.asarray(hex_env.legal_mask(topo, state))
        np.testing.assert_array_equal(obs_out.reshape(B, F) == 0, legal_ref)

        a = np.asarray(out.ints[t, :, pr.I_ACTION])
        assert legal_ref[ar, a].all(), f"illegal agent action at step {t}"

        # agent forward parity: value + log-prob come from the packed towers
        logits, value = model.apply(variables, obs_ref.astype(jnp.float32))
        masked = jnp.where(legal_ref, logits, -jnp.inf)
        logp = jax.nn.log_softmax(masked, axis=-1)
        np.testing.assert_allclose(
            np.asarray(out.flts[t, :, pr.F_VALUE]), np.asarray(value), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.flts[t, :, pr.F_LOGP]),
            np.asarray(logp)[ar, a], atol=1e-5,
        )

        st1, rew1 = hex_env.step(topo, state, jnp.asarray(a))
        r = np.asarray(rew1)[ar, seat]
        oa = np.asarray(out.ints[t, :, pr.I_OPP_ACTION])
        active2 = ~np.asarray(st1.done)
        legal2 = np.asarray(hex_env.legal_mask(topo, st1))
        assert legal2[ar, oa][active2].all(), f"illegal opponent reply at {t}"
        st2, rew2 = hex_env.step(topo, st1, jnp.asarray(oa), active=jnp.asarray(active2))
        r = r + np.asarray(rew2)[ar, seat]

        np.testing.assert_allclose(np.asarray(out.flts[t, :, pr.F_REWARD]), r)
        done = np.asarray(st2.done)
        np.testing.assert_array_equal(
            np.asarray(out.ints[t, :, pr.I_DONE]) != 0, done
        )

        # reset + redraws
        st3 = hex_env.reset_where(topo, st2, jnp.asarray(done), fresh)
        seat2 = np.asarray(out.ints[t, :, pr.I_SEAT])
        use_best2 = np.asarray(out.ints[t, :, pr.I_USE_BEST]) != 0
        opp_idx2 = np.asarray(out.ints[t, :, pr.I_OPP_IDX])
        np.testing.assert_array_equal(seat2[~done], seat[~done])
        np.testing.assert_array_equal(use_best2[~done], use_best[~done])
        np.testing.assert_array_equal(opp_idx2[~done], opp_idx[~done])
        if seat_mode == "fixed_random":
            np.testing.assert_array_equal(seat2, seat)
        assert ((opp_idx2 >= 0) & (opp_idx2 < POOL)).all()

        fa = np.asarray(out.ints[t, :, pr.I_FIRST_ACTION])
        open_mask = done & (seat2 == 1)
        st4, _ = hex_env.step(
            topo, st3, jnp.asarray(fa), active=jnp.asarray(open_mask)
        )
        state, seat, use_best, opp_idx = st4, seat2, use_best2, opp_idx2

    # final carry: exact state equality incl. connectivity labels
    np.testing.assert_array_equal(
        np.asarray(out.s0 != 0), np.asarray(state.stones[:, 0])
    )
    np.testing.assert_array_equal(
        np.asarray(out.s1 != 0), np.asarray(state.stones[:, 1])
    )
    np.testing.assert_array_equal(np.asarray(out.labels), np.asarray(state.labels))
    np.testing.assert_array_equal(
        np.asarray(out.meta[:, pr.M_TO_MOVE]), np.asarray(state.to_move)
    )
    np.testing.assert_array_equal(
        np.asarray(out.meta[:, pr.M_EMPTY]), np.asarray(state.empty)
    )
    np.testing.assert_array_equal(
        np.asarray(out.meta[:, pr.M_DONE]) != 0, np.asarray(state.done)
    )
    # episodes do finish within the horizon, so resets were exercised
    assert np.asarray(out.ints[..., pr.I_DONE]).sum() > 0


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

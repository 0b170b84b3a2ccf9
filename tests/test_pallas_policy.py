"""Fused policy-pass kernels (ops/pallas_policy.py) vs the lax reference.

Runs in the Pallas interpreter on CPU with the random bits fed as inputs, so
every Gumbel draw is reproducible and directly comparable against the same
construction evaluated with plain jnp ops.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hex_gym_env_tpu.core import env as hex_env
from hex_gym_env_tpu.core.topology import get_topology
from hex_gym_env_tpu.models import make_policy
from hex_gym_env_tpu.ops import masked, pallas_policy
from hex_gym_env_tpu.ops.pallas_policy import PolicyOps
from hex_gym_env_tpu.train.bank import OpponentBank, init_bank
from hex_gym_env_tpu.train.rollout import SelfplayRunner
from hex_gym_env_tpu.train.selfplay import SelfplayPPO
from hex_gym_env_tpu.utils.config import PPOConfig, SelfplayConfig, TrainConfig


def _random_positions(topo, batch, key, n_moves=6):
    """Play a few random legal moves to get non-trivial boards."""
    state = hex_env.initial_state(topo, batch)
    for i in range(n_moves):
        key, k = jax.random.split(key)
        legal = hex_env.legal_mask(topo, state)
        action = masked.sample(k, jnp.zeros(legal.shape), legal)
        state, _ = hex_env.step(topo, state, action)
        state = hex_env.reset_where(topo, state, state.done)
    return state


def _expected_sample(masked_logits, bits):
    """The kernel's Gumbel-max draw, evaluated with plain numpy."""
    ub = (np.asarray(bits) >> 8).astype(np.float32)
    u = ub * 2.0**-24 + 2.0**-25
    g = -np.log(-np.log(u))
    return np.argmax(np.asarray(masked_logits) + g, axis=1).astype(np.int32)


@pytest.mark.parametrize("family", ["MLP-default", "MLP-deep"])
def test_agent_kernel_matches_lax(family):
    topo = get_topology(5)
    model = make_policy(family, topo.num_cells)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 5, 5), jnp.float32))
    B = 64
    state = _random_positions(topo, B, jax.random.key(1))
    obs = hex_env.observe(topo, state)
    legal = hex_env.legal_mask(topo, state)

    pol = PolicyOps(model, interpret=True)
    packed = pol.pack_agent(variables["params"])
    key = jax.random.key(7)
    res = pol.agent_act(packed, obs, legal, key)

    logits_ref, value_ref = model.apply(variables, obs.astype(jnp.float32))
    masked_ref = masked.mask_logits(logits_ref, legal)
    np.testing.assert_allclose(
        np.asarray(res.masked_logits), np.asarray(masked_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res.value), np.asarray(value_ref), rtol=1e-5, atol=1e-5
    )

    bits = jax.random.bits(key, (B, topo.num_cells), jnp.uint32)
    np.testing.assert_array_equal(np.asarray(res.action), _expected_sample(masked_ref, bits))

    logp_ref = masked.log_prob(logits_ref, legal, res.action)
    np.testing.assert_allclose(
        np.asarray(res.log_prob), np.asarray(logp_ref), rtol=1e-5, atol=1e-5
    )
    # sampled actions are legal
    assert np.take_along_axis(
        np.asarray(legal), np.asarray(res.action)[:, None], axis=1
    ).all()


@pytest.mark.parametrize("family", ["MLP-default", "MLP-deep"])
def test_bank_kernel_matches_lax(family):
    topo = get_topology(5)
    model = make_policy(family, topo.num_cells)
    template = model.init(jax.random.key(0), jnp.zeros((1, 5, 5), jnp.float32))["params"]
    P = 5
    bank = init_bank(template, P)
    # distinct random members + best
    leaves, treedef = jax.tree.flatten(bank.params)
    keys = jax.random.split(jax.random.key(3), len(leaves))
    bank = bank.replace(
        params=jax.tree.unflatten(
            treedef, [jax.random.normal(k, l.shape) for k, l in zip(keys, leaves)]
        ),
        best_params=jax.tree.map(
            lambda l: jax.random.normal(jax.random.key(4), l.shape), template
        ),
    )

    B = 64
    state = _random_positions(topo, B, jax.random.key(2))
    obs = hex_env.observe(topo, state)
    legal = hex_env.legal_mask(topo, state)

    pol = PolicyOps(model, interpret=True)
    stacked = pol.stack_bank(bank)
    assert stacked.n_members == P + 1

    key = jax.random.key(11)
    use_best = jnp.arange(B) % 3 == 0
    opp_idx = jnp.arange(B, dtype=jnp.int32) % P
    action, masked_logits = pol.bank_act(stacked, use_best, opp_idx, obs, legal, key)

    # lax reference: per-member dense pass + row select (rollout.opponent_logits)
    obs_f = obs.astype(jnp.float32)
    per_member = jax.vmap(lambda p: model.apply({"params": p}, obs_f)[0])(bank.params)
    chosen = jnp.take_along_axis(per_member, opp_idx[None, :, None], axis=0)[0]
    best = model.apply({"params": bank.best_params}, obs_f)[0]
    logits_ref = jnp.where(use_best[:, None], best, chosen)
    masked_ref = masked.mask_logits(logits_ref, legal)
    np.testing.assert_allclose(
        np.asarray(masked_logits), np.asarray(masked_ref), rtol=1e-4, atol=1e-4
    )

    bits = jax.random.bits(key, (B, topo.num_cells), jnp.uint32)
    np.testing.assert_array_equal(np.asarray(action), _expected_sample(masked_ref, bits))


def test_runner_pallas_invariants():
    """Full rollout with the fused policy pass: well-formed transitions."""
    cfg = TrainConfig(
        ppo=PPOConfig(n_steps=16, minibatch_size=32, n_epochs=2),
        selfplay=SelfplayConfig(
            board_size=5, n_envs=16, buffer_size=4, policy_impl="pallas",
            n_eval_episodes=4,
        ),
        total_timesteps=512,
    )
    algo = SelfplayPPO(cfg)
    assert algo.runner.pol is not None and algo.runner.pol.interpret
    state = algo.init_state(jax.random.key(0))
    carry, tr, last_values = jax.jit(
        lambda p, b, c, k: algo.runner.run(p, b, c, k, 24)
    )(state.params, state.bank, state.carry, jax.random.key(1))

    legal = np.asarray(tr.legal)
    actions = np.asarray(tr.action)
    rewards = np.asarray(tr.reward)
    dones = np.asarray(tr.done)
    T, B = actions.shape
    picked = np.take_along_axis(legal.reshape(T, B, -1), actions[..., None], axis=-1)
    assert picked.all()
    assert set(np.unique(rewards)).issubset({-1.0, 0.0, 1.0})
    assert (rewards[~dones] == 0).all()
    assert dones.sum() > 0
    lp = np.asarray(tr.log_prob)
    assert np.isfinite(lp).all() and (lp <= 1e-6).all()
    assert np.isfinite(np.asarray(tr.value)).all()
    assert np.isfinite(np.asarray(last_values)).all()

    # and a PPO update on top of the kernel-sampled batch still trains
    state2, _ = jax.jit(algo.train_step)(state)
    l0, l1 = jax.tree.leaves(state.params), jax.tree.leaves(state2.params)
    assert any(not np.allclose(a, b) for a, b in zip(l0, l1))


def test_gating():
    topo = get_topology(5)
    mlp = make_policy("MLP-default", topo.num_cells)
    assert pallas_policy.supported(mlp, 20)
    assert pallas_policy.supported(mlp, 64)  # reference buffer_exp grid size
    assert not pallas_policy.supported(mlp, 66)  # (66+1)*64 > 4224 lanes
    cnn = make_policy("CNN", topo.num_cells)
    assert not pallas_policy.supported(cnn, 4)

    cfg = SelfplayConfig(board_size=5, buffer_size=4, policy_impl="lax")
    assert pallas_policy.resolve_policy_ops(mlp, cfg) is None
    cfg = SelfplayConfig(board_size=5, buffer_size=4, policy_impl="auto")
    assert pallas_policy.resolve_policy_ops(mlp, cfg) is None  # CPU backend
    cfg = SelfplayConfig(board_size=5, buffer_size=4, policy_impl="pallas")
    ops = pallas_policy.resolve_policy_ops(mlp, cfg)
    assert ops is not None and ops.interpret
    with pytest.raises(ValueError):
        pallas_policy.resolve_policy_ops(
            cnn, SelfplayConfig(board_size=5, buffer_size=4, policy_impl="pallas")
        )
    with pytest.raises(ValueError):
        pallas_policy.resolve_policy_ops(
            mlp, SelfplayConfig(board_size=5, buffer_size=4, policy_impl="LAX")
        )

"""Training-stack tests: GAE, bank protocol, rollout invariants, learning."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hex_gym_env_tpu.core import env as hex_env
from hex_gym_env_tpu.core.topology import get_topology
from hex_gym_env_tpu.models import MlpPolicy
from hex_gym_env_tpu.ops import masked
from hex_gym_env_tpu.train import (
    SelfplayPPO, SelfplayRunner, Evaluator, compute_gae, init_bank,
    replace_member,
)
from hex_gym_env_tpu.utils.config import PPOConfig, SelfplayConfig, TrainConfig


def reference_gae(rewards, values, dones, last_values, gamma, lam):
    """Literal SB3-style backward python loop."""
    T, B = rewards.shape
    adv = np.zeros((T, B), np.float32)
    next_adv = np.zeros(B, np.float32)
    for t in reversed(range(T)):
        if t == T - 1:
            nnt = 1.0 - dones[t]
            next_value = last_values
        else:
            nnt = 1.0 - dones[t]
            next_value = values[t + 1]
        delta = rewards[t] + gamma * next_value * nnt - values[t]
        next_adv = delta + gamma * lam * nnt * next_adv
        adv[t] = next_adv
    return adv, adv + values


def test_gae_matches_reference_loop():
    rng = np.random.default_rng(0)
    T, B = 12, 5
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)
    dones = (rng.random((T, B)) < 0.2)
    last_values = rng.normal(size=(B,)).astype(np.float32)
    adv, ret = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(last_values), 0.99, 0.95,
    )
    exp_adv, exp_ret = reference_gae(rewards, values, dones.astype(np.float32), last_values, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(adv), exp_adv, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ret), exp_ret, rtol=1e-5, atol=1e-6)


def test_zero_bank_is_uniform_random_policy():
    """Zero params => constant logits => masked-uniform == BaseRandomPolicy."""
    model = MlpPolicy(n_actions=25)
    params = model.init(jax.random.key(0), jnp.zeros((1, 5, 5)))["params"]
    bank = init_bank(params, size=4)
    zero = jax.tree.map(lambda x: jnp.zeros_like(x), params)
    obs = jax.random.normal(jax.random.key(1), (3, 5, 5))
    logits, _ = model.apply({"params": bank.best_params}, obs)
    np.testing.assert_array_equal(np.asarray(logits), 0.0)
    chex_equal = jax.tree.map(lambda a, b: bool(jnp.all(a == b)), bank.best_params, zero)
    assert all(jax.tree.leaves(chex_equal))


def test_bank_replace_and_promote():
    model = MlpPolicy(n_actions=9)
    params = model.init(jax.random.key(0), jnp.zeros((1, 3, 3)))["params"]
    bank = init_bank(params, size=3)
    new = jax.tree.map(lambda x: jnp.ones_like(x), params)

    # gated off: nothing changes
    b2 = replace_member(bank, jax.random.key(1), new, jnp.float32(2.0), jnp.bool_(False))
    assert float(b2.best_score) == 0.0
    assert float(b2.scores.sum()) == 0.0

    # replace: one slot becomes the new params, score recorded, best promoted
    b3 = replace_member(bank, jax.random.key(2), new, jnp.float32(2.0), jnp.bool_(True))
    assert float(b3.best_score) == 2.0
    assert float(b3.scores.max()) == 2.0
    assert float(b3.scores.min()) == 0.0
    slot = int(jnp.argmax(b3.scores))
    leaf = jax.tree.leaves(b3.params)[0]
    np.testing.assert_array_equal(np.asarray(leaf[slot]), np.asarray(jax.tree.leaves(new)[0]))
    # best snapshot is the new params
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(b3.best_params)[0]), np.asarray(jax.tree.leaves(new)[0])
    )

    # equal score does NOT promote best (strict >), but can replace min slot
    b4 = replace_member(b3, jax.random.key(3), params, jnp.float32(2.0), jnp.bool_(True))
    assert float(b4.best_score) == 2.0


def _small_cfg(**kw):
    sp = dict(
        board_size=5, n_envs=16, buffer_size=4, n_eval_episodes=4,
        policy="MLP-default", seed=0,
    )
    sp.update(kw.pop("selfplay", {}))
    ppo_kw = dict(n_steps=32, minibatch_size=64, n_epochs=2)
    ppo_kw.update(kw.pop("ppo", {}))
    return TrainConfig(
        ppo=PPOConfig(**ppo_kw), selfplay=SelfplayConfig(**sp),
        total_timesteps=kw.pop("total_timesteps", 2048), **kw,
    )


def test_rollout_invariants():
    """Transitions are well-formed: legal actions, rewards only at dones,
    rewards in {-1, 0, 1}, obs always mover-frame with agent to move."""
    cfg = _small_cfg()
    algo = SelfplayPPO(cfg)
    state = algo.init_state(jax.random.key(0))
    carry, tr, last_values = jax.jit(
        lambda p, b, c, k: algo.runner.run(p, b, c, k, 32)
    )(state.params, state.bank, state.carry, jax.random.key(1))

    legal = np.asarray(tr.legal)
    actions = np.asarray(tr.action)
    rewards = np.asarray(tr.reward)
    dones = np.asarray(tr.done)

    # every chosen action was legal
    T, B = actions.shape
    picked = np.take_along_axis(legal.reshape(T, B, -1), actions[..., None], axis=-1)
    assert picked.all()
    # PPOBatch producer contract (train/ppo.py): legal == (obs == 0).  The
    # fused Pallas sweep kernels re-derive the mask in-kernel from obs and
    # never read ``legal`` — this is the invariant that makes that valid.
    obs = np.asarray(tr.obs)
    assert np.array_equal(legal.reshape(T, B, -1), obs.reshape(T, B, -1) == 0)
    # rewards only on terminal transitions, and in {-1, 0, 1}
    assert set(np.unique(rewards)).issubset({-1.0, 0.0, 1.0})
    assert (rewards[~dones] == 0).all()
    # episodes do finish in a 32-step window on 5x5
    assert dones.sum() > 0
    # log-probs are valid (finite, <= 0)
    lp = np.asarray(tr.log_prob)
    assert np.isfinite(lp).all() and (lp <= 1e-6).all()
    # values finite
    assert np.isfinite(np.asarray(tr.value)).all()
    assert np.isfinite(np.asarray(last_values)).all()


def test_first_move_precompute_is_bitwise_identical():
    """The precomputed empty-board opening logits must reproduce the inline
    bank inference exactly (same transitions, same carry)."""
    cfg = _small_cfg()
    algo = SelfplayPPO(cfg)
    state = algo.init_state(jax.random.key(0))

    run_fast = jax.jit(lambda p, b, c, k: algo.runner.run(p, b, c, k, 32))

    inline = SelfplayRunner(algo.topo, algo.model, cfg.selfplay)
    inline.first_move_logits = lambda bank: None  # force the inline path
    run_inline = jax.jit(lambda p, b, c, k: inline.run(p, b, c, k, 32))

    args = (state.params, state.bank, state.carry, jax.random.key(7))
    c1, t1, v1 = run_fast(*args)
    c2, t2, v2 = run_inline(*args)
    for a, b in zip(jax.tree.leaves((c1, t1, v1)), jax.tree.leaves((c2, t2, v2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_seed_bank_plants_opponents():
    cfg = _small_cfg()
    algo = SelfplayPPO(cfg)
    state = algo.init_state(jax.random.key(0))
    seed_vars = algo.model.init(
        jax.random.key(99), jnp.zeros((1, algo.topo.n, algo.topo.n), jnp.float32)
    )
    state = algo.seed_bank(state, [seed_vars], score=0.5)

    # slot 0 carries the seed, best is pinned to it
    leaf = jax.tree.leaves(seed_vars)[0]
    bank_leaf = jax.tree.leaves(state.bank.params)[0]
    np.testing.assert_array_equal(np.asarray(bank_leaf[0]), np.asarray(leaf))
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state.bank.best_params)[0]), np.asarray(leaf)
    )
    assert float(state.bank.scores[0]) == 0.5
    assert float(state.bank.best_score) == 0.5
    # training still runs from the seeded state
    state2, metrics = jax.jit(algo.train_step)(state)
    assert np.isfinite(float(metrics.ppo.policy_loss))

    # guard rails: an unpromotable pinned best and oversized seed lists raise
    with pytest.raises(ValueError, match="unreachable"):
        algo.seed_bank(state, [seed_vars], score=1.0)
    too_many = [seed_vars] * (state.bank.size + 1)
    with pytest.raises(ValueError, match="exceed"):
        algo.seed_bank(state, too_many)


def test_rollout_seat_balance():
    cfg = _small_cfg(selfplay=dict(n_envs=256))
    algo = SelfplayPPO(cfg)
    state = algo.init_state(jax.random.key(0))
    seats = np.asarray(state.carry.agent_seat)
    assert 0.3 < seats.mean() < 0.7  # both seats occur


def test_train_step_runs_and_counts():
    cfg = _small_cfg()
    algo = SelfplayPPO(cfg)
    state = algo.init_state(jax.random.key(0))
    step = jax.jit(algo.train_step)
    state, metrics = step(state)
    assert algo.timesteps(state) == 32 * 16
    assert np.isfinite(float(metrics.ppo.policy_loss))
    assert np.isfinite(float(metrics.ppo.value_loss))
    state, _ = step(state)
    assert algo.timesteps(state) == 2 * 32 * 16


def test_eval_step_updates_bank():
    cfg = _small_cfg()
    algo = SelfplayPPO(cfg)
    state = algo.init_state(jax.random.key(0))
    new_state, result = jax.jit(algo.eval_step)(state)
    assert result.rewards.shape == (4,)
    assert set(np.unique(np.asarray(result.rewards))).issubset({-1.0, 0.0, 1.0})
    # score formula: mean_reward * exp(mean(scores) - 1) with zero scores
    np.testing.assert_allclose(
        float(result.score), float(result.mean_reward) * np.exp(-1.0), rtol=1e-5
    )


def test_learning_beats_random_on_5x5():
    """A short PPO run must clearly beat a uniform-random opponent."""
    cfg = _small_cfg(
        selfplay=dict(n_envs=64, buffer_size=4),
        ppo=dict(n_steps=64, minibatch_size=256, n_epochs=4),
    )
    algo = SelfplayPPO(cfg)
    state = algo.init_state(jax.random.key(0))
    step = jax.jit(algo.train_step)
    for _ in range(12):
        state, metrics = step(state)

    # winrate vs uniform-random over fresh games, deterministic agent
    topo = get_topology(5)
    B = 256
    model = algo.model

    @jax.jit
    def playout(params, key):
        st = hex_env.initial_state(topo, B)
        def body(carry, k):
            st = carry
            obs = hex_env.observe(topo, st).astype(jnp.float32)
            legal = hex_env.legal_mask(topo, st)
            logits, _ = model.apply(params, obs)  # full variables dict
            a = masked.mode(logits, legal)
            st, _ = hex_env.step(topo, st, a)
            legal2 = hex_env.legal_mask(topo, st)
            a2 = masked.sample(k, jnp.zeros_like(logits), legal2)
            st, _ = hex_env.step(topo, st, a2)
            return st, None
        st, _ = jax.lax.scan(body, st, jax.random.split(key, 13))
        return st.winner

    winners = np.asarray(playout(state.params, jax.random.key(9)))
    winrate = (winners == 0).mean()
    assert winrate > 0.8, f"agent only wins {winrate:.2%} vs random after training"


def test_cnn_policy_trains():
    """The CNN family must train end-to-end (BatchNorm batch_stats threaded
    through rollout inference and the PPO update)."""
    cfg = _small_cfg(selfplay=dict(policy="CNN", n_envs=8, buffer_size=2),
                     ppo=dict(n_steps=8, minibatch_size=16, n_epochs=1))
    algo = SelfplayPPO(cfg)
    state = algo.init_state(jax.random.key(0))
    assert "batch_stats" in state.params
    step = jax.jit(algo.train_step)
    bs0 = jax.tree.leaves(state.params["batch_stats"])[0].copy()
    state, metrics = step(state)
    assert np.isfinite(float(metrics.ppo.policy_loss))
    bs1 = jax.tree.leaves(state.params["batch_stats"])[0]
    assert bool(jnp.any(bs0 != bs1))  # running stats moved during the update
    # eval path also works with full variables
    state, result = jax.jit(algo.eval_step)(state)
    assert np.isfinite(float(result.mean_reward))


def test_eval_serve_order_repeats_last_member():
    """Eval serves pool[i] then repeats the LAST member past the buffer end
    (SelfplayWrapper.py:92-96) — the n_eval_episodes knob is real."""
    from hex_gym_env_tpu.train.evaluate import serve_indices

    np.testing.assert_array_equal(
        np.asarray(serve_indices(6, 4)), [0, 1, 2, 3, 3, 3]
    )
    np.testing.assert_array_equal(np.asarray(serve_indices(3, 4)), [0, 1, 2])


def test_eval_seats_follow_protocol():
    """fixed_random eval inherits the rollout envs' fixed seats; per_episode
    redraws."""
    from hex_gym_env_tpu.train.evaluate import eval_seats
    from hex_gym_env_tpu.utils.config import SelfplayConfig

    fixed = jnp.array([0, 1, 1, 0], jnp.int32)
    cfg = SelfplayConfig(board_size=5, n_envs=4, seat_mode="fixed_random")
    seats = np.asarray(eval_seats(cfg, jax.random.key(0), 6, fixed))
    np.testing.assert_array_equal(seats, [0, 1, 1, 0, 0, 1])  # tiled carry seats

    cfg_pe = SelfplayConfig(board_size=5, n_envs=4, seat_mode="per_episode")
    a = np.asarray(eval_seats(cfg_pe, jax.random.key(1), 64, fixed))
    b = np.asarray(eval_seats(cfg_pe, jax.random.key(2), 64, fixed))
    assert set(np.unique(a)).issubset({0, 1}) and not np.array_equal(a, b)


def test_eval_step_seat_stability_under_fixed_random():
    """Across consecutive evals of a strict-protocol run the eval seats stay
    pinned to the carry's fixed seats (they never redraw)."""
    cfg = _small_cfg(selfplay=dict(seat_mode="fixed_random"))
    algo = SelfplayPPO(cfg)
    state = algo.init_state(jax.random.key(0))
    seats0 = np.asarray(state.carry.agent_seat)
    step = jax.jit(algo.train_step)
    ev = jax.jit(algo.eval_step)
    state, _ = step(state)
    state, r1 = ev(state)
    state, _ = step(state)
    state, r2 = ev(state)
    # the carry seats never moved (fixed_random), and eval consumed them
    np.testing.assert_array_equal(np.asarray(state.carry.agent_seat), seats0)
    assert r1.rewards.shape == (cfg.selfplay.eval_episodes,)
    assert r2.rewards.shape == (cfg.selfplay.eval_episodes,)


def test_n_eval_episodes_shapes_flow_through_fused_span():
    """n_eval_episodes != buffer_size flows through eval_step and the fused
    train_and_eval_steps span without shape mismatches."""
    cfg = _small_cfg(selfplay=dict(n_eval_episodes=7, eval_freq=512))
    algo = SelfplayPPO(cfg)
    state = algo.init_state(jax.random.key(0))
    state, result = jax.jit(algo.eval_step)(state)
    assert result.rewards.shape == (7,)
    state, (m, r, did) = jax.jit(
        algo.train_and_eval_steps, static_argnums=1
    )(state, 2)
    assert r.rewards.shape == (2, 7)


def test_epoch_permutations_are_uniform_permutations():
    """The shared sweep permutation generator: every row is a permutation
    of range(n), rows are mutually distinct, and the stream is a pure
    function of the key (the property all sweep backends rely on)."""
    from hex_gym_env_tpu.train import ppo as ppo_mod

    n, E = 512, 6
    perms = np.asarray(ppo_mod.epoch_permutations(jax.random.key(3), n, E))
    assert perms.shape == (E, n) and perms.dtype == np.int32
    for row in perms:
        assert np.array_equal(np.sort(row), np.arange(n))
    assert len({tuple(r) for r in perms}) == E
    again = np.asarray(ppo_mod.epoch_permutations(jax.random.key(3), n, E))
    assert np.array_equal(perms, again)
    other = np.asarray(ppo_mod.epoch_permutations(jax.random.key(4), n, E))
    assert not np.array_equal(perms, other)


def test_pool_score_decay_mechanics():
    """Opt-in mitigation for the r4b-measured pool freeze: with
    ``pool_score_decay`` every recorded pool score shrinks by the decay
    fraction each eval pass, so the replacement bar (``min(scores)``)
    keeps moving; at 0.0 the reference-exact rule applies and scores are
    untouched.  ``best_score`` does NOT decay (r5, ADVICE r4): the
    promotion bar must stay monotone or a later weaker agent could
    overwrite the ``best_*`` deliverable.  (Whether a frozen pool
    actually unfreezes depends on the agent's eval winrate — that
    dynamics claim is the r4b measurement, RESULTS.md; this pins the
    mechanism.)"""
    import dataclasses

    base = _small_cfg()

    def run_eval(decay):
        cfg = dataclasses.replace(
            base,
            selfplay=dataclasses.replace(base.selfplay, pool_score_decay=decay),
        )
        algo = SelfplayPPO(cfg)
        state = algo.init_state(jax.random.key(0))
        bank = state.bank.replace(
            scores=jnp.full_like(state.bank.scores, np.float32(0.9)),
            best_score=jnp.asarray(np.float32(0.9)),
        )
        bank2, res = jax.jit(algo.evaluator.eval_and_update)(
            state.params, bank, jax.random.key(1), state.carry.agent_seat
        )
        return np.asarray(bank2.scores), float(bank2.best_score), bool(res.replaced)

    scores0, best0, rep0 = run_eval(0.0)
    # reference-exact: non-replaced slots keep their recorded score
    assert (np.isclose(scores0, 0.9) | rep0).sum() >= scores0.size - 1
    untouched0 = np.isclose(scores0, 0.9).sum()
    assert untouched0 >= scores0.size - 1

    scores1, best1, rep1 = run_eval(0.25)
    # decayed: every slot the replacement did not overwrite reads 0.675
    assert np.isclose(scores1, 0.9 * 0.75).sum() >= scores1.size - 1
    # the promotion bar is monotone: best_score never decays (it can only
    # rise, if this eval's score out-promoted it)
    assert best1 >= 0.9 - 1e-6


def test_symmetric_eval_mechanics():
    """Opt-in two-seat eval (r5, VERDICT r4 item 7): every pool member is
    played from both seats and the recorded per-member reward is the
    two-seat mean, so the promotion criterion demands two-seat competence.
    Pins: (a) rewards keep the (E,) shape (2E episodes averaged in
    halves, so values are multiples of 0.5); (b) the result ignores
    seat_mode/fixed_seats entirely (that asymmetry is what the knob
    removes); (c) default False keeps the reference-exact single-episode
    eval."""
    import dataclasses

    base = _small_cfg()

    def evaluator(sym, seat_mode="per_episode"):
        cfg = dataclasses.replace(
            base,
            selfplay=dataclasses.replace(
                base.selfplay, symmetric_eval=sym, seat_mode=seat_mode
            ),
        )
        return SelfplayPPO(cfg)

    algo = evaluator(True)
    state = algo.init_state(jax.random.key(0))
    E = algo.cfg.selfplay.eval_episodes
    key = jax.random.key(5)

    r_a = np.asarray(jax.jit(algo.evaluator.play_vs_pool)(
        state.params, state.bank, key, jnp.zeros((algo.cfg.selfplay.n_envs,), jnp.int32)
    ))
    assert r_a.shape == (E,)
    # two-seat means of +-1 games: every value is a multiple of 0.5
    np.testing.assert_allclose(r_a * 2, np.round(r_a * 2), atol=1e-6)

    # (b) invariant to seat_mode AND the fixed_seats vector
    algo_f = evaluator(True, seat_mode="fixed_random")
    r_b = np.asarray(jax.jit(algo_f.evaluator.play_vs_pool)(
        state.params, state.bank, key, jnp.ones((algo.cfg.selfplay.n_envs,), jnp.int32)
    ))
    np.testing.assert_array_equal(r_a, r_b)

    # (c) off by default, and the single-episode eval differs in general
    algo_off = evaluator(False)
    r_c = np.asarray(jax.jit(algo_off.evaluator.play_vs_pool)(
        state.params, state.bank, key, jnp.zeros((algo.cfg.selfplay.n_envs,), jnp.int32)
    ))
    assert r_c.shape == (E,)
    assert algo_off.cfg.selfplay.symmetric_eval is False

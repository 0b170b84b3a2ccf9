"""Multi-device tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hex_gym_env_tpu.parallel import DistributedSelfplayPPO, make_mesh, DATA_AXIS
from hex_gym_env_tpu.train import SelfplayPPO
from hex_gym_env_tpu.utils.config import PPOConfig, SelfplayConfig, TrainConfig


def _cfg(n_envs=64):
    return TrainConfig(
        ppo=PPOConfig(n_steps=16, minibatch_size=32, n_epochs=2),
        selfplay=SelfplayConfig(board_size=5, n_envs=n_envs, buffer_size=4),
    )


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape[DATA_AXIS] == 8
    assert mesh.shape["model"] == 1


def test_distributed_train_step_runs():
    mesh = make_mesh()
    algo = DistributedSelfplayPPO(_cfg(), mesh)
    state = algo.init_sharded_state(jax.random.key(0))
    step = jax.jit(algo.train_step)
    state, metrics = step(state)
    assert algo.timesteps(state) == 16 * 64
    assert np.isfinite(float(metrics.ppo.policy_loss))
    state, metrics = step(state)
    assert algo.timesteps(state) == 2 * 16 * 64
    # carry stays sharded over the data axis
    sh = state.carry.env.stones.sharding
    assert sh.spec[0] == DATA_AXIS


def test_distributed_params_stay_replicated_and_finite():
    mesh = make_mesh()
    algo = DistributedSelfplayPPO(_cfg(), mesh)
    state = algo.init_sharded_state(jax.random.key(1))
    step = jax.jit(algo.train_step)
    for _ in range(3):
        state, _ = step(state)
    # replicated output: single logical value, finite
    leaves = jax.tree.leaves(state.params)
    for leaf in leaves:
        arr = np.asarray(leaf)
        assert np.isfinite(arr).all()
    # all replicas identical: fetch per-device shards of one leaf
    leaf = leaves[0]
    vals = [np.asarray(s.data) for s in leaf.addressable_shards]
    for v in vals[1:]:
        np.testing.assert_array_equal(v, vals[0])


def test_distributed_learns_direction():
    """3 distributed steps should already move episode rewards off zero /
    produce nonzero gradients (loss changes params)."""
    mesh = make_mesh()
    algo = DistributedSelfplayPPO(_cfg(), mesh)
    state = algo.init_sharded_state(jax.random.key(2))
    p0 = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    step = jax.jit(algo.train_step)
    state, _ = step(state)
    p1 = np.asarray(jax.tree.leaves(state.params)[0])
    assert np.abs(p1 - p0).max() > 0


def test_single_vs_multi_device_shapes_agree():
    """The distributed algo consumes/produces states interchangeable with the
    single-device template (same tree structure and logical shapes)."""
    cfg = _cfg()
    mesh = make_mesh()
    dist = DistributedSelfplayPPO(cfg, mesh)
    single = SelfplayPPO(cfg)
    s_single = single.init_state(jax.random.key(3))
    s_dist = dist.init_sharded_state(jax.random.key(3))
    t1 = jax.tree.structure(s_single)
    t2 = jax.tree.structure(s_dist)
    assert t1 == t2
    for a, b in zip(jax.tree.leaves(s_single), jax.tree.leaves(s_dist)):
        assert a.shape == b.shape, (a.shape, b.shape)


def test_distributed_fused_span_honors_eval_cadence():
    """The superstep driver composes with the SPMD algo: shard_map train
    steps + device-gated eval inside one scanned program, eval firing on the
    same eval_freq cadence as single-device."""
    import dataclasses

    cfg = _cfg()
    per_iter = cfg.ppo.n_steps * cfg.selfplay.n_envs  # 1024
    cfg = dataclasses.replace(
        cfg,
        selfplay=dataclasses.replace(
            cfg.selfplay, eval_freq=2 * per_iter, n_eval_episodes=4
        ),
    )
    mesh = make_mesh()
    algo = DistributedSelfplayPPO(cfg, mesh)
    state = algo.init_sharded_state(jax.random.key(0))
    span = jax.jit(algo.train_and_eval_steps, static_argnums=1)
    state, (metrics, results, did_eval) = span(state, 4)
    assert algo.timesteps(state) == 4 * per_iter
    # eval_freq = 2 iterations -> evals after iterations 2 and 4
    np.testing.assert_array_equal(
        np.asarray(did_eval), np.array([False, True, False, True])
    )
    assert np.isfinite(np.asarray(metrics.ppo.policy_loss)).all()
    # params remain replicated across the mesh after the fused program
    leaf = jax.tree.leaves(state.params)[0]
    vals = [np.asarray(s.data) for s in leaf.addressable_shards]
    for v in vals[1:]:
        np.testing.assert_array_equal(v, vals[0])


def test_sharded_eval_identical_across_mesh_widths():
    """The r5 sharded eval (VERDICT r4 item 6): each device evaluates
    ceil(E/D) episodes keyed per GLOBAL episode id, rewards all_gathered,
    pool update replicated.  The EvalResult must be bitwise identical at
    every mesh width (1, 2, 4, 8 over the virtual CPU devices), including
    the non-divisible E=6 over D=4 padding path, and the bank must stay
    replicated after the pool mutation."""
    cfg = _cfg()  # buffer_size=4 -> E=4... widen below
    import dataclasses

    cfg = dataclasses.replace(
        cfg, selfplay=dataclasses.replace(cfg.selfplay, buffer_size=6)
    )  # E = n_eval_episodes = 6: indivisible by 4 -> exercises padding

    results = {}
    for width in (1, 2, 4, 8):
        mesh = make_mesh(n_data=width)
        algo = DistributedSelfplayPPO(cfg, mesh)
        state = algo.init_sharded_state(jax.random.key(7))
        # eval the INITIAL state: a train step first would legitimately
        # diverge across widths (per-device shuffles/rollout keys), which
        # would mask whether the EVAL pass itself is width-invariant
        state, res = jax.jit(algo.eval_step)(state)
        results[width] = (
            np.asarray(res.rewards),
            float(res.mean_reward),
            float(res.score),
            bool(res.replaced),
            float(res.best_score),
        )
        # bank stays bitwise-replicated after the sharded-eval mutation
        leaf = jax.tree.leaves(state.bank.params)[0]
        vals = [np.asarray(s.data) for s in leaf.addressable_shards]
        for v in vals[1:]:
            np.testing.assert_array_equal(v, vals[0])
        assert int(state.eval_accum) == 0

    base = results[1]
    assert base[0].shape == (6,)
    for width in (2, 4, 8):
        got = results[width]
        np.testing.assert_array_equal(got[0], base[0])
        assert got[1:] == base[1:]


def test_symmetric_eval_shards_and_is_width_invariant():
    """symmetric_eval composes with the sharded eval: the global grid is
    2E episodes (member e%E, seat e//E), sharded over devices, halves
    averaged after the gather.  Results must be identical at every mesh
    width and every reward a two-seat mean (multiple of 0.5)."""
    import dataclasses

    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, selfplay=dataclasses.replace(cfg.selfplay, symmetric_eval=True)
    )
    E = cfg.selfplay.eval_episodes
    results = {}
    for width in (1, 4, 8):  # 2E=8 over D=8 -> one episode per device
        mesh = make_mesh(n_data=width)
        algo = DistributedSelfplayPPO(cfg, mesh)
        assert algo._eval_sharded is not None
        state = algo.init_sharded_state(jax.random.key(11))
        state, res = jax.jit(algo.eval_step)(state)
        r = np.asarray(res.rewards)
        assert r.shape == (E,)
        np.testing.assert_allclose(r * 2, np.round(r * 2), atol=1e-6)
        results[width] = r
    np.testing.assert_array_equal(results[4], results[1])
    np.testing.assert_array_equal(results[8], results[1])

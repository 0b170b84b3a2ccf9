"""Fused Pallas PPO sweep == lax/optax update (interpret mode on CPU).

Same variables, same opt_state, same batch, same key -> the single-kernel
epoch sweep (``ops/pallas_ppo.py``) must reproduce the reference-parity lax
update (``train/ppo.make_update_fn``, itself SB3-parity-tested) to fp32
tolerance: identical minibatch schedule, per-step losses, and parameters
after the full epochs x minibatches Adam sweep.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hex_gym_env_tpu.models import MlpPolicy
from hex_gym_env_tpu.ops import pallas_ppo
from hex_gym_env_tpu.train import ppo
from hex_gym_env_tpu.utils.config import PPOConfig

N = 5
A = N * N


def _batch(n, seed=0):
    rng = np.random.default_rng(seed)
    boards = rng.choice(np.array([-1, 0, 1], np.int8), size=(n, N, N))
    boards.reshape(n, A)[np.arange(n), rng.integers(0, A, n)] = 0
    # PPOBatch invariant (train/ppo.py): legal must equal obs==0 — the
    # Pallas sweep kernels re-derive the mask in-kernel from obs and never
    # read ``legal``, so test batches must honor the producer contract.
    legal = boards.reshape(n, A) == 0
    u = rng.random((n, A))
    actions = np.argmax(np.where(legal, u, -1.0), axis=1).astype(np.int32)
    return ppo.PPOBatch(
        obs=jnp.asarray(boards, jnp.int8),
        legal=jnp.asarray(legal),
        action=jnp.asarray(actions),
        log_prob_old=jnp.asarray(rng.normal(-2.5, 0.3, n).astype(np.float32)),
        value_old=jnp.asarray(rng.normal(0, 0.5, n).astype(np.float32)),
        advantage=jnp.asarray(rng.normal(0, 1.0, n).astype(np.float32)),
        ret=jnp.asarray(rng.normal(0, 0.7, n).astype(np.float32)),
    )


@pytest.mark.parametrize(
    "layers,activation,n_epochs",
    [((64, 64), "tanh", 2), ((32, 32, 32), "relu", 1)],
)
def test_pallas_sweep_matches_lax_update(layers, activation, n_epochs):
    import flax.linen as nn

    act = nn.relu if activation == "relu" else nn.tanh
    model = MlpPolicy(n_actions=A, pi_layers=layers, vf_layers=layers, activation=act)
    cfg = PPOConfig(minibatch_size=64, n_epochs=n_epochs)
    n = 256  # 4 minibatches per epoch

    variables = model.init(jax.random.key(3), jnp.zeros((1, N, N), jnp.float32))
    optimizer = ppo.make_optimizer(cfg)
    opt_state = optimizer.init(variables["params"])
    batch = _batch(n)
    key = jax.random.key(11)

    lax_update = ppo.make_update_fn(model, cfg, optimizer)
    vars_lax, opt_lax, stats_lax = jax.jit(lax_update)(
        variables, opt_state, batch, key
    )

    pallas_update = pallas_ppo.make_pallas_update_fn(model, cfg, interpret=True)
    vars_pl, opt_pl, stats_pl = jax.jit(pallas_update)(
        variables, opt_state, batch, key
    )

    # parameters after the full sweep
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(vars_lax["params"])[0],
        jax.tree_util.tree_flatten_with_path(vars_pl["params"])[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=f"params diverge at {jax.tree_util.keystr(path)}",
        )

    # optimizer state: count and moments
    assert int(opt_pl[1][0].count) == int(opt_lax[1][0].count)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(opt_lax[1][0].mu)[0],
        jax.tree_util.tree_flatten_with_path(opt_pl[1][0].mu)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=f"adam mu diverges at {jax.tree_util.keystr(path)}",
        )

    # stats (means over the sweep)
    for name in ppo.PPOStats._fields:
        assert abs(float(getattr(stats_lax, name)) - float(getattr(stats_pl, name))) < 1e-4, name


def test_pallas_sweep_carries_adam_count_across_calls():
    """Second call must continue the Adam schedule (bias correction uses the
    carried count), staying in lockstep with the lax path."""
    model = MlpPolicy(n_actions=A)
    cfg = PPOConfig(minibatch_size=128, n_epochs=1)
    n = 256
    variables = model.init(jax.random.key(0), jnp.zeros((1, N, N), jnp.float32))
    optimizer = ppo.make_optimizer(cfg)
    opt_state = optimizer.init(variables["params"])

    lax_update = jax.jit(ppo.make_update_fn(model, cfg, optimizer))
    pallas_update = jax.jit(pallas_ppo.make_pallas_update_fn(model, cfg, interpret=True))

    v_l, o_l = variables, opt_state
    v_p, o_p = variables, opt_state
    for i in range(3):
        batch = _batch(n, seed=i)
        key = jax.random.key(100 + i)
        v_l, o_l, _ = lax_update(v_l, o_l, batch, key)
        v_p, o_p, _ = pallas_update(v_p, o_p, batch, key)

    assert int(o_p[1][0].count) == 6  # 3 calls x 2 minibatches
    for a, b in zip(jax.tree.leaves(v_l["params"]), jax.tree.leaves(v_p["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-6)


def test_supported_policy_gate():
    import flax.linen as nn

    assert pallas_ppo.supported_policy(MlpPolicy(n_actions=A))
    assert pallas_ppo.supported_policy(
        MlpPolicy(n_actions=A, activation=nn.relu)
    )

    class NotMlp:
        pass

    assert not pallas_ppo.supported_policy(NotMlp())


def test_pallas_fast_matches_schedule_replay():
    """``pallas-fast`` == a lax/optax replay of the SAME shuffle-once
    schedule: the deviation is the minibatch index stream only (pinned by
    replaying ``fast_schedule``'s exact indices through the parity-tested
    loss + optimizer), the math is the fused kernel's."""
    import optax

    model = MlpPolicy(n_actions=A)
    cfg = PPOConfig(minibatch_size=64, n_epochs=3)
    n = 256
    variables = model.init(jax.random.key(5), jnp.zeros((1, N, N), jnp.float32))
    optimizer = ppo.make_optimizer(cfg)
    opt_state = optimizer.init(variables["params"])
    batch = _batch(n, seed=9)
    key = jax.random.key(21)

    fast_update = jax.jit(
        pallas_ppo.make_pallas_fast_update_fn(model, cfg, interpret=True)
    )
    vars_f, opt_f, stats_f = fast_update(variables, opt_state, batch, key)

    rowperm, order = jax.jit(
        lambda k: pallas_ppo.fast_schedule(k, n, cfg.minibatch_size, cfg.n_epochs)
    )(key)
    blocks = np.asarray(rowperm).reshape(n // cfg.minibatch_size, cfg.minibatch_size)
    grad_fn = jax.jit(jax.grad(ppo.make_loss_fn(model, cfg), has_aux=True))

    params, opt = variables["params"], opt_state
    all_stats = []
    for blk in np.asarray(order):
        idx = jnp.asarray(blocks[blk])
        mb = jax.tree.map(lambda x: x[idx], batch)
        grads, (stats, _) = grad_fn(params, {}, mb)
        updates, opt = optimizer.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        all_stats.append(stats)

    assert int(opt_f[1][0].count) == len(np.asarray(order))
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(vars_f["params"])[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=f"params diverge at {jax.tree_util.keystr(path)}",
        )
    for name in ppo.PPOStats._fields:
        ref = float(np.mean([float(getattr(s, name)) for s in all_stats]))
        assert abs(ref - float(getattr(stats_f, name))) < 1e-4, name


def test_fast_schedule_is_a_partition():
    """Every epoch visits every row exactly once (block order is a
    permutation of the blocks; rows are a permutation of the batch)."""
    rowperm, order = pallas_ppo.fast_schedule(jax.random.key(0), 512, 64, 4)
    assert sorted(np.asarray(rowperm).tolist()) == list(range(512))
    o = np.asarray(order).reshape(4, 8)
    for e in range(4):
        assert sorted(o[e].tolist()) == list(range(8))

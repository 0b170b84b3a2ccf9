"""Pallas fused step == lax step, bit for bit (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hex_gym_env_tpu.core import env as hex_env
from hex_gym_env_tpu.core.topology import get_topology
from hex_gym_env_tpu.ops import pallas_step


def assert_states_equal(a, b, msg=""):
    for name in ["stones", "labels", "to_move", "done", "winner", "empty", "move_count"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=f"{msg}: field {name}",
        )


@pytest.mark.parametrize("board_size", [5, 7, 11])
def test_pallas_step_matches_lax(board_size):
    topo = get_topology(board_size)
    rng = np.random.default_rng(board_size)
    B = 64
    lax_state = hex_env.initial_state(topo, B)
    pls_state = hex_env.initial_state(topo, B)

    lax_fn = jax.jit(lambda s, a: hex_env.step(topo, s, a))
    pls_fn = jax.jit(
        lambda s, a: pallas_step.step(topo, s, a, block=32, interpret=True)
    )

    for t in range(board_size * board_size + 2):
        # mix of legal and (10%) illegal actions exercises every branch
        mask = np.asarray(hex_env.legal_mask(topo, lax_state))
        actions = np.zeros(B, np.int32)
        for i in range(B):
            legal = np.flatnonzero(mask[i])
            if len(legal) == 0:
                actions[i] = 0
            elif rng.random() < 0.1:
                actions[i] = rng.integers(0, board_size**2)
            else:
                actions[i] = rng.choice(legal)
        a = jnp.asarray(actions)
        lax_state, lax_rew = lax_fn(lax_state, a)
        pls_state, pls_rew = pls_fn(pls_state, a)
        assert_states_equal(lax_state, pls_state, msg=f"t={t}")
        np.testing.assert_array_equal(np.asarray(lax_rew), np.asarray(pls_rew))
        if np.asarray(lax_state.done).all():
            break


def test_pallas_step_active_mask():
    topo = get_topology(5)
    B = 16
    state = hex_env.initial_state(topo, B)
    actions = jnp.arange(B, dtype=jnp.int32)
    active = jnp.arange(B) % 2 == 0
    lax_state, lax_rew = hex_env.step(topo, state, actions, active=active)
    pls_state, pls_rew = pallas_step.step(
        topo, state, actions, active=active, block=16, interpret=True
    )
    assert_states_equal(lax_state, pls_state)
    np.testing.assert_array_equal(np.asarray(lax_rew), np.asarray(pls_rew))
    # inactive rows are untouched
    np.testing.assert_array_equal(
        np.asarray(pls_state.move_count), np.asarray(active).astype(np.int32)
    )


def test_fused_random_rollout_invariants():
    """One-kernel rollout: valid states, plausible game statistics."""
    from hex_gym_env_tpu.ops import labels as labels_ops

    topo = get_topology(7)
    B, T = 64, 200
    state = hex_env.initial_state(topo, B)
    out, games = pallas_step.random_rollout(
        topo, state, seed=7, n_steps=T, block=32, interpret=True
    )
    games = np.asarray(games)
    s0 = np.asarray(out.stones[:, 0])
    s1 = np.asarray(out.stones[:, 1])
    # stones disjoint, only real cells occupied
    assert not (s0 & s1).any()
    assert not s0[:, topo.num_cells:].any() and not s1[:, topo.num_cells:].any()
    # empty counter consistent with the boards
    np.testing.assert_array_equal(
        np.asarray(out.empty), topo.num_cells - (s0 | s1)[:, : topo.num_cells].sum(-1)
    )
    # random 7x7 games last 13..49 plies; T=200 must finish 4..15 per env
    assert games.min() >= 200 // 49 and games.max() <= 200 // 13 + 1
    # label tables must describe exactly the boards' connectivity
    fresh = np.asarray(
        jax.jit(labels_ops.labels_from_stones, static_argnums=0)(topo, out.stones)
    )
    got = np.asarray(out.labels)
    for b in range(B):
        ga, fa = got[b], fresh[b]
        assert np.array_equal(ga[:, None] == ga[None, :], fa[:, None] == fa[None, :]), b
    # no game may contain a winning connection (they reset immediately)
    for seat in range(2):
        assert not np.asarray(labels_ops.seat_wins(topo, out.labels, seat)).any()


def test_make_ops_dispatch_and_semantics():
    """The composable public bundle (core.env.make_ops): auto resolves to
    lax off-TPU and reproduces the raw primitives exactly; bad impl raises."""
    import pytest

    topo = get_topology(5)
    ops = hex_env.make_ops(topo, impl="auto")
    st = ops.initial_state(4)
    st2, rew = ops.step(st, jnp.array([0, 5, 10, 24]))
    ref2, ref_rew = hex_env.step(topo, hex_env.initial_state(topo, 4),
                                 jnp.array([0, 5, 10, 24]))
    for a, b in zip(jax.tree.leaves(st2), jax.tree.leaves(ref2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(rew), np.asarray(ref_rew))
    np.testing.assert_array_equal(
        np.asarray(ops.legal_mask(st2)), np.asarray(hex_env.legal_mask(topo, st2))
    )
    np.testing.assert_array_equal(
        np.asarray(ops.observe(st2)), np.asarray(hex_env.observe(topo, st2))
    )
    st3 = ops.reset_where(st2, jnp.array([True, False, False, False]))
    assert int(st3.move_count[0]) == 0 and int(st3.move_count[1]) == 1
    with pytest.raises(ValueError, match="impl"):
        hex_env.make_ops(topo, impl="bogus")


def test_make_ops_pallas_pin_interpret_matches_lax():
    """make_ops(impl='pallas', interpret=True) exercises the kernel path on
    CPU and must reproduce the lax bundle exactly."""
    topo = get_topology(5)
    lax_ops = hex_env.make_ops(topo, impl="lax")
    pl_ops = hex_env.make_ops(topo, impl="pallas", interpret=True)
    s1 = lax_ops.initial_state(4)
    s2 = pl_ops.initial_state(4)
    acts = [jnp.array([0, 7, 12, 24]), jnp.array([3, 3, 3, 3]),
            jnp.array([8, 1, 0, 10])]
    for a in acts:
        s1, r1 = lax_ops.step(s1, a)
        s2, r2 = pl_ops.step(s2, a)
        for x, y in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_make_ops_interpret_requires_kernel_resolution():
    """interpret=True with a lax resolution used to be a silent no-op — a
    test meaning to exercise the kernel interpreter would quietly test lax
    instead (ADVICE r4).  It must raise."""
    topo = get_topology(5)
    with pytest.raises(ValueError, match="interpret"):
        hex_env.make_ops(topo, impl="lax", interpret=True)
    # "auto" off-TPU resolves to lax too (conftest pins the cpu backend)
    with pytest.raises(ValueError, match="interpret"):
        hex_env.make_ops(topo, impl="auto", interpret=True)

"""Pallas TPU kernel: the entire env step as ONE fused kernel.

The lax implementation of ``core.env.step`` compiles to a couple dozen small
XLA kernels whose launch overhead dominates at high step rates (the arith
itself is ~50us of VPU work at B=8192).  This kernel fuses move decoding,
stone placement, the flat-label union, win/draw/invalid resolution, and
reward computation into a single VMEM-resident pass over ``(BLOCK, 128)``
slabs — semantics identical to the lax path (asserted by
``tests/test_pallas_step.py`` against the golden-parity-tested step).

Layout: lanes = the 128 flat cells + edge virtuals; rows = games.  Per-game
scalars travel in a packed ``(B, 8)`` int32 "meta" array:
``[to_move, done, winner, empty, move_count, action, active, pad]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hex_gym_env_tpu.core.state import HexState, Winner
from hex_gym_env_tpu.core.topology import HexTopology

META_TO_MOVE = 0
META_DONE = 1
META_WINNER = 2
META_EMPTY = 3
META_MOVES = 4
META_ACTION = 5
META_ACTIVE = 6
META_WIDTH = 8


def _step_kernel(n, L, s0_ref, s1_ref, lbl_ref, meta_ref,
                 o_s0, o_s1, o_lbl, o_meta, o_rew):
    s0 = s0_ref[:]  # (BLOCK, L) int32 — seat 0 stones (world frame)
    s1 = s1_ref[:]
    labels = lbl_ref[:]  # (BLOCK, L) int32
    meta = meta_ref[:]  # (BLOCK, 8) int32

    s = meta[:, META_TO_MOVE : META_TO_MOVE + 1]  # (BLOCK, 1)
    was_done = meta[:, META_DONE : META_DONE + 1] != 0
    winner = meta[:, META_WINNER : META_WINNER + 1]
    empty = meta[:, META_EMPTY : META_EMPTY + 1]
    moves = meta[:, META_MOVES : META_MOVES + 1]
    action = meta[:, META_ACTION : META_ACTION + 1]
    ext_active = meta[:, META_ACTIVE : META_ACTIVE + 1] != 0

    mover_is_0 = s == 0
    ym, xm = action // n, action % n
    yw = jnp.where(mover_is_0, ym, xm)
    xw = jnp.where(mover_is_0, xm, ym)
    c = yw * n + xw  # (BLOCK, 1) world cell

    lane = jax.lax.broadcasted_iota(jnp.int32, s0.shape, 1)
    onehot = lane == c  # (BLOCK, L)

    occupied = (s0 + s1) > 0
    valid = jnp.sum((onehot & ~occupied).astype(jnp.int32), axis=1, keepdims=True) > 0
    invalid_now = ~valid & ~was_done & ext_active
    act = valid & ~was_done & ext_active  # (BLOCK, 1)

    place = (onehot & act & mover_is_0).astype(jnp.int32)
    new_s0 = s0 | place
    new_s1 = s1 | (onehot & act & ~mover_is_0).astype(jnp.int32)
    stones_s = jnp.where(mover_is_0, new_s0, new_s1) > 0  # (BLOCK, L) mask

    # ---- flat-label union over the 8 merge slots -------------------------
    y, x = c // n, c % n
    num_cells = n * n
    e0 = num_cells + 2 * s  # (BLOCK, 1)
    e1 = e0 + 1

    top, bot = y > 0, y < n - 1
    lft, rgt = x > 0, x < n - 1
    offs = (-n, -n + 1, -1, 1, n - 1, n)
    valids = (top, top & rgt, lft, rgt, bot & lft, bot)

    # pre-move edge-group labels (slots 6/7 always address e0/e1)
    label_e0 = jnp.sum(jnp.where(lane == e0, labels, 0), axis=1, keepdims=True)
    label_e1 = jnp.sum(jnp.where(lane == e1, labels, 0), axis=1, keepdims=True)

    # accumulated masks are int32 (0/1): Mosaic has no i1/i8 vector constants
    match = jnp.zeros(s0.shape, jnp.int32)
    joined_e0 = jnp.zeros(act.shape, jnp.int32)
    joined_e1 = jnp.zeros(act.shape, jnp.int32)

    def one_slot(slot_id, slot_valid, is_virtual, match, joined_e0, joined_e1):
        oh = lane == slot_id  # (BLOCK, L)
        slot_label = jnp.sum(jnp.where(oh, labels, 0), axis=1, keepdims=True)
        occ = jnp.sum((oh & stones_s).astype(jnp.int32), axis=1, keepdims=True) > 0
        eligible = slot_valid & (occ | is_virtual) & act  # (BLOCK, 1)
        match = match | ((labels == slot_label) & eligible).astype(jnp.int32)
        joined_e0 = joined_e0 | (eligible & (slot_label == label_e0)).astype(jnp.int32)
        joined_e1 = joined_e1 | (eligible & (slot_label == label_e1)).astype(jnp.int32)
        return match, joined_e0, joined_e1

    for off, v in zip(offs, valids):
        sid = jnp.clip(c + off, 0, L - 1)
        match, joined_e0, joined_e1 = one_slot(
            sid, v, False, match, joined_e0, joined_e1
        )
    # edge-virtual slots: valid on the mover's matching edge, always occupied
    v_e0 = (mover_is_0 & (y == 0)) | (~mover_is_0 & (x == 0))
    v_e1 = (mover_is_0 & (y == n - 1)) | (~mover_is_0 & (x == n - 1))
    match, joined_e0, joined_e1 = one_slot(e0, v_e0, True, match, joined_e0, joined_e1)
    match, joined_e0, joined_e1 = one_slot(e1, v_e1, True, match, joined_e0, joined_e1)

    new_labels = jnp.where(match > 0, c, labels)

    pre_connected = label_e0 == label_e1
    win = act & (((joined_e0 & joined_e1) > 0) | pre_connected)  # (BLOCK, 1)

    new_empty = empty - act.astype(jnp.int32)
    draw = act & ~win & (new_empty <= 0)

    new_done = was_done | win | draw | invalid_now
    new_winner = jnp.where(
        win, s,
        jnp.where(draw, jnp.int32(int(Winner.DRAW)),
                  jnp.where(invalid_now, jnp.int32(int(Winner.INVALID)), winner)),
    )
    new_to_move = jnp.where(was_done | ~ext_active, s, 1 - s)
    new_moves = moves + act.astype(jnp.int32)

    r = win.astype(jnp.float32)  # (BLOCK, 1)
    rew0 = jnp.where(s == 0, r, -r)
    rew1 = jnp.where(s == 1, r, -r)

    o_s0[:] = new_s0
    o_s1[:] = new_s1
    o_lbl[:] = new_labels
    zeros = jnp.zeros_like(s)
    o_meta[:] = jnp.concatenate(
        [new_to_move, new_done.astype(jnp.int32), new_winner, new_empty,
         new_moves, action, ext_active.astype(jnp.int32), zeros],
        axis=1,
    )
    o_rew[:] = jnp.concatenate([rew0, rew1], axis=1)


def step(
    topo: HexTopology,
    state: HexState,
    actions: jnp.ndarray,
    active: jnp.ndarray | None = None,
    block: int = 256,
    interpret: bool = False,
):
    """Drop-in replacement for ``core.env.step`` backed by one Pallas kernel."""
    B = state.batch_size
    L = topo.lanes
    if B % block:
        block = B  # single-slab fallback for odd batch sizes
    if active is None:
        active = jnp.ones_like(state.done)

    meta = jnp.stack(
        [
            state.to_move,
            state.done.astype(jnp.int32),
            state.winner,
            state.empty,
            state.move_count,
            actions.astype(jnp.int32),
            active.astype(jnp.int32),
            jnp.zeros_like(state.to_move),
        ],
        axis=1,
    )

    grid = (B // block,)
    def row_spec(width):
        return pl.BlockSpec((block, width), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((B, L), jnp.int32),
        jax.ShapeDtypeStruct((B, L), jnp.int32),
        jax.ShapeDtypeStruct((B, L), jnp.int32),
        jax.ShapeDtypeStruct((B, META_WIDTH), jnp.int32),
        jax.ShapeDtypeStruct((B, 2), jnp.float32),
    )
    kernel = functools.partial(_step_kernel, topo.n, L)
    s0_new, s1_new, labels_new, meta_new, rewards = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec(L), row_spec(L), row_spec(L), row_spec(META_WIDTH)],
        out_specs=(
            row_spec(L), row_spec(L), row_spec(L), row_spec(META_WIDTH),
            row_spec(2),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(
        state.stones[:, 0].astype(jnp.int32),
        state.stones[:, 1].astype(jnp.int32),
        state.labels,
        meta,
    )

    new_state = HexState(
        stones=jnp.stack([s0_new != 0, s1_new != 0], axis=1),
        labels=labels_new,
        to_move=meta_new[:, META_TO_MOVE],
        done=meta_new[:, META_DONE] != 0,
        winner=meta_new[:, META_WINNER],
        empty=meta_new[:, META_EMPTY],
        move_count=meta_new[:, META_MOVES],
    )
    return new_state, rewards


# ---------------------------------------------------------------------------
# Fused random-legal rollout: T env steps inside ONE kernel invocation.
# State never leaves VMEM between steps; per-step cost is pure VPU work.
# Sampling: uniform over empty world cells via argmax of per-lane random
# bits — a bijective relabeling of "masked categorical over zero logits in
# the mover frame", i.e. the same BaseRandomPolicy distribution the lax
# bench path uses (the frame transpose is a permutation of the empties).
# Finished games auto-reset to empty boards, like reset_where(initial_state).
# ---------------------------------------------------------------------------


def _random_rollout_kernel(n, L, T, use_device_prng, *refs):
    if use_device_prng:
        (seed_ref, s0_ref, s1_ref, lbl_ref, meta_ref,
         o_s0, o_s1, o_lbl, o_meta, o_games) = refs
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        bits_ref = None
    else:  # interpret/testing path: pre-generated bits input
        (seed_ref, s0_ref, s1_ref, lbl_ref, meta_ref, bits_ref,
         o_s0, o_s1, o_lbl, o_meta, o_games) = refs
    num_cells = n * n
    shape = s0_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    cell_mask = lane < num_cells
    id_labels = lane  # identity labels for resets

    meta0 = meta_ref[:]
    s = meta0[:, META_TO_MOVE : META_TO_MOVE + 1]
    empty = meta0[:, META_EMPTY : META_EMPTY + 1]

    def body(t, carry):
        s0, s1, labels, s, empty, games = carry

        # --- sample a uniform empty world cell per game -------------------
        if use_device_prng:
            bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        else:
            bits = bits_ref[t]
        empties = ((s0 + s1) == 0) & cell_mask
        # Mosaic argmax lowers only for f32 (and cannot cast uint32->f32):
        # go via int32 after shifting to the non-negative top-24-bit range —
        # still uniform, and empty cells strictly beat non-empty ones
        score = jnp.where(
            empties,
            pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32).astype(jnp.float32) + 1.0,
            jnp.float32(0.0),
        )
        c = jnp.argmax(score, axis=1, keepdims=True).astype(jnp.int32)

        # --- place the stone (always valid: an empty cell always exists
        #     right after reset, and games reset the moment they finish) ---
        onehot = lane == c
        mover_is_0 = s == 0
        new_s0 = s0 | (onehot & mover_is_0).astype(jnp.int32)
        new_s1 = s1 | (onehot & ~mover_is_0).astype(jnp.int32)
        stones_s = jnp.where(mover_is_0, new_s0, new_s1) > 0

        y, x = c // n, c % n
        e0 = num_cells + 2 * s
        e1 = e0 + 1
        label_e0 = jnp.sum(jnp.where(lane == e0, labels, 0), axis=1, keepdims=True)
        label_e1 = jnp.sum(jnp.where(lane == e1, labels, 0), axis=1, keepdims=True)

        top, bot = y > 0, y < n - 1
        lft, rgt = x > 0, x < n - 1
        offs = (-n, -n + 1, -1, 1, n - 1, n)
        valids = (top, top & rgt, lft, rgt, bot & lft, bot)

        match = jnp.zeros(shape, jnp.int32)
        joined_e0 = jnp.zeros(c.shape, jnp.int32)
        joined_e1 = jnp.zeros(c.shape, jnp.int32)

        def one_slot(slot_id, slot_valid, is_virtual, match, j0, j1):
            oh = lane == slot_id
            slot_label = jnp.sum(jnp.where(oh, labels, 0), axis=1, keepdims=True)
            occ = jnp.sum((oh & stones_s).astype(jnp.int32), axis=1, keepdims=True) > 0
            eligible = slot_valid & (occ | is_virtual)
            match = match | ((labels == slot_label) & eligible).astype(jnp.int32)
            j0 = j0 | (eligible & (slot_label == label_e0)).astype(jnp.int32)
            j1 = j1 | (eligible & (slot_label == label_e1)).astype(jnp.int32)
            return match, j0, j1

        for off, v in zip(offs, valids):
            sid = jnp.clip(c + off, 0, L - 1)
            match, joined_e0, joined_e1 = one_slot(sid, v, False, match, joined_e0, joined_e1)
        v_e0 = (mover_is_0 & (y == 0)) | (~mover_is_0 & (x == 0))
        v_e1 = (mover_is_0 & (y == n - 1)) | (~mover_is_0 & (x == n - 1))
        match, joined_e0, joined_e1 = one_slot(e0, v_e0, True, match, joined_e0, joined_e1)
        match, joined_e0, joined_e1 = one_slot(e1, v_e1, True, match, joined_e0, joined_e1)

        labels = jnp.where(match > 0, c, labels)

        new_empty = empty - 1
        done = ((joined_e0 & joined_e1) > 0) | (new_empty <= 0)

        # --- auto-reset finished games -----------------------------------
        s0_out = jnp.where(done, jnp.int32(0), new_s0)
        s1_out = jnp.where(done, jnp.int32(0), new_s1)
        labels = jnp.where(done, id_labels, labels)
        s_out = jnp.where(done, 0, 1 - s)
        empty_out = jnp.where(done, num_cells, new_empty)
        games = games + done.astype(jnp.int32)
        return s0_out, s1_out, labels, s_out, empty_out, games

    games0 = jnp.zeros_like(s)
    s0, s1, labels, s, empty, games = jax.lax.fori_loop(
        0, T, body, (s0_ref[:], s1_ref[:], lbl_ref[:], s, empty, games0)
    )

    o_s0[:] = s0
    o_s1[:] = s1
    o_lbl[:] = labels
    zeros = jnp.zeros_like(s)
    o_meta[:] = jnp.concatenate(
        [s, zeros, zeros - 1, empty, zeros, zeros, zeros + 1, zeros], axis=1
    )
    o_games[:] = games


def random_rollout(
    topo: HexTopology,
    state: HexState,
    seed: int,
    n_steps: int,
    block: int = 512,
    interpret: bool = False,
):
    """Run ``n_steps`` uniform-random-legal moves per game with auto-reset,
    entirely inside one Pallas kernel.  Returns (state', games_finished (B,)).

    Intended for throughput benchmarking and soak testing; the per-step
    semantics (placement, union, win/draw, reset) mirror the lax path — the
    invariants are asserted in ``tests/test_pallas_step.py``.

    ``interpret=True`` (CPU testing) feeds pre-generated random bits as an
    input, since the TPU hardware PRNG has no interpreter lowering.
    """
    B = state.batch_size
    L = topo.lanes
    if B % block:
        block = B

    meta = jnp.stack(
        [
            state.to_move,
            state.done.astype(jnp.int32),
            state.winner,
            state.empty,
            state.move_count,
            jnp.zeros_like(state.to_move),
            jnp.ones_like(state.to_move),
            jnp.zeros_like(state.to_move),
        ],
        axis=1,
    )
    seed_arr = jnp.asarray([seed], jnp.int32)

    def row_spec(width):
        return pl.BlockSpec(
            (block, width), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        )

    kernel = functools.partial(
        _random_rollout_kernel, topo.n, L, n_steps, not interpret
    )
    in_specs = [row_spec(L), row_spec(L), row_spec(L), row_spec(META_WIDTH)]
    inputs = [
        state.stones[:, 0].astype(jnp.int32),
        state.stones[:, 1].astype(jnp.int32),
        state.labels,
        meta,
    ]
    if interpret:
        bits = jax.random.bits(
            jax.random.key(seed), (n_steps, B, L), jnp.uint32
        )
        in_specs.append(
            pl.BlockSpec(
                (n_steps, block, L), lambda i, *_: (0, i, 0),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(bits)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block,),
        in_specs=in_specs,
        out_specs=(
            row_spec(L), row_spec(L), row_spec(L), row_spec(META_WIDTH),
            row_spec(1),
        ),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((B, L), jnp.int32),
        jax.ShapeDtypeStruct((B, L), jnp.int32),
        jax.ShapeDtypeStruct((B, L), jnp.int32),
        jax.ShapeDtypeStruct((B, META_WIDTH), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
    )
    s0, s1, labels, meta_new, games = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(seed_arr, *inputs)

    new_state = HexState(
        stones=jnp.stack([s0 != 0, s1 != 0], axis=1),
        labels=labels,
        to_move=meta_new[:, META_TO_MOVE],
        done=meta_new[:, META_DONE] != 0,
        winner=meta_new[:, META_WINNER],
        empty=meta_new[:, META_EMPTY],
        move_count=meta_new[:, META_MOVES],
    )
    return new_state, games[:, 0]

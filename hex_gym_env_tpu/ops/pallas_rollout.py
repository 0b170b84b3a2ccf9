"""The ENTIRE selfplay rollout as ONE Pallas kernel.

Round-2 state of the rollout (``train/rollout.py``): a ``lax.scan`` whose
body issues ~5 Pallas launches (agent pass, 3 env steps, opponent-bank pass)
plus XLA glue per transition — ~20 ms for T=128 x B=512 at 6x6, i.e.
launch/latency-bound, not compute-bound (the pure-env kernel proves the chip
does 60M env-steps/s).  This kernel runs all T steps inside a single
``pallas_call``: the env state, agent params, stacked opponent bank, and
first-move table stay VMEM-resident across the whole rollout (the grid is
the time axis; carry lives in constant-index output blocks, flushed once),
and the per-step transition rows stream out to HBM.

Per grid step t (semantics of ``SelfplayRunner.run``'s scan body, which
itself reproduces ``minihex/SelfplayWrapper.py:174-199`` + ``:146-172`` +
``:69-104``):

  1. mover-frame obs/legal (the reference's invert-after-every-step,
     ``HexSingleGame.py:259-271`` — here two 0/1-matrix transposes on the
     MXU), agent MLP forward (the ``[W_pi|W_vf]`` packing of
     ``ops/pallas_ppo``), masked Gumbel-max sample, log-prob, value;
  2. env step (guaranteed-legal placement + flat-label union + win/draw,
     the ``ops/pallas_step`` math inlined);
  3. opponent reply where the game continues: stacked-bank window-masked
     forward (``ops/pallas_policy`` layout), masked sample, env step;
  4. auto-reset finished games: fresh board, seat redraw (``seat_mode``),
     80/20 best/pool opponent redraw (``SelfplayWrapper.py:97-104``), and
     the opponent's opening move where it holds seat 0 — sampled from the
     precomputed per-member empty-board logits table (a constant of the
     bank within one rollout; bit-equivalent to running the bank forward).

Sampling matches the masked-categorical distribution exactly (Gumbel-max
over masked logits); the PRNG stream is the TPU hardware PRNG, i.e. the same
documented deviation as ``policy_impl='pallas'``.  On CPU the kernel runs in
interpreter mode with every random draw injected as an input, which makes
the trajectory fully replayable — ``tests/test_pallas_rollout.py`` replays
every emitted transition through the lax env ops and asserts exact state
equality, including the final carry.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hex_gym_env_tpu.core.state import HexState, Winner
from hex_gym_env_tpu.core.topology import HexTopology
from hex_gym_env_tpu.ops.masked import MASKED_LOGIT
from hex_gym_env_tpu.ops.pallas_policy import (
    PolicyOps,
    _block_seed,
    _gumbel,
    _sample_row,
    _seed_scalar,
)

# carry meta lanes (B, 8) int32
M_TO_MOVE = 0
M_DONE = 1
M_EMPTY = 2
M_MOVES = 3
M_SEAT = 4
M_USE_BEST = 5
M_OPP_IDX = 6
M_WIDTH = 8

# emitted per-step int lanes (T, B, 8) int32
I_ACTION = 0
I_OPP_ACTION = 1
I_FIRST_ACTION = 2
I_DONE = 3
I_SEAT = 4
I_USE_BEST = 5
I_OPP_IDX = 6

# emitted per-step float lanes (T, B, 8) float32
F_LOGP = 0
F_VALUE = 1
F_REWARD = 2


def _col(meta: jnp.ndarray, j: int) -> jnp.ndarray:
    return meta[:, j : j + 1]


def _lane_col(arr: jnp.ndarray, lane_iota: jnp.ndarray, j: int) -> jnp.ndarray:
    """Extract lane ``j`` of a (B, 128) plane as a (B, 1) column."""
    return jnp.sum(jnp.where(lane_iota == j, arr, 0), axis=1, keepdims=True)


def _transpose_matrix(n: int, F: int, L: int) -> jnp.ndarray:
    """(L, L) 0/1 matrix sending world lane (y, x) -> (x, y).

    Built from iota inside the kernel (Pallas cannot close over array
    constants); a (B, L) @ (L, L) product transposes every board in the
    batch in one MXU pass — the lane permutation Mosaic has no shuffle for.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    ry, rx = r // n, r % n
    return ((r < F) & (c == rx * n + ry)).astype(jnp.float32)


def _apply_move(n, L, lane, s0, s1, labels, s_col, c, act_col):
    """Place a guaranteed-legal stone at world cell ``c`` for mover ``s_col``
    where ``act_col``; returns (s0', s1', labels', win_col).

    The flat-label union of ``ops/pallas_step._step_kernel`` with the
    invalid-move branch removed — every action here comes from a masked
    sample, so it is legal by construction.
    """
    F = n * n
    onehot = lane == c
    mover0 = s_col == 0

    new_s0 = s0 | (onehot & act_col & mover0).astype(jnp.int32)
    new_s1 = s1 | (onehot & act_col & ~mover0).astype(jnp.int32)
    stones_s = jnp.where(mover0, new_s0, new_s1) > 0

    y, x = c // n, c % n
    e0 = F + 2 * s_col
    e1 = e0 + 1
    label_e0 = jnp.sum(jnp.where(lane == e0, labels, 0), axis=1, keepdims=True)
    label_e1 = jnp.sum(jnp.where(lane == e1, labels, 0), axis=1, keepdims=True)

    top, bot = y > 0, y < n - 1
    lft, rgt = x > 0, x < n - 1
    offs = (-n, -n + 1, -1, 1, n - 1, n)
    valids = (top, top & rgt, lft, rgt, bot & lft, bot)

    match = jnp.zeros(s0.shape, jnp.int32)
    joined_e0 = jnp.zeros(act_col.shape, jnp.int32)
    joined_e1 = jnp.zeros(act_col.shape, jnp.int32)

    def one_slot(slot_id, slot_valid, is_virtual, match, j0, j1):
        oh = lane == slot_id
        slot_label = jnp.sum(jnp.where(oh, labels, 0), axis=1, keepdims=True)
        occ = jnp.sum((oh & stones_s).astype(jnp.int32), axis=1, keepdims=True) > 0
        eligible = slot_valid & (occ | is_virtual) & act_col
        match = match | ((labels == slot_label) & eligible).astype(jnp.int32)
        j0 = j0 | (eligible & (slot_label == label_e0)).astype(jnp.int32)
        j1 = j1 | (eligible & (slot_label == label_e1)).astype(jnp.int32)
        return match, j0, j1

    for off, v in zip(offs, valids):
        sid = jnp.clip(c + off, 0, L - 1)
        match, joined_e0, joined_e1 = one_slot(sid, v, False, match, joined_e0, joined_e1)
    v_e0 = (mover0 & (y == 0)) | (~mover0 & (x == 0))
    v_e1 = (mover0 & (y == n - 1)) | (~mover0 & (x == n - 1))
    match, joined_e0, joined_e1 = one_slot(e0, v_e0, True, match, joined_e0, joined_e1)
    match, joined_e0, joined_e1 = one_slot(e1, v_e1, True, match, joined_e0, joined_e1)

    new_labels = jnp.where(match > 0, c, labels)
    pre_connected = label_e0 == label_e1
    win = act_col & (((joined_e0 & joined_e1) > 0) | pre_connected)
    return new_s0, new_s1, new_labels, win


def _rollout_kernel(
    n, L, A, T, n_layers, H, P1, P1c, LW, activation, best_prob,
    per_episode_seat, chunk, use_device_prng, bank_bf16, eval_mode, *refs,
):
    """``eval_mode=True`` is the evaluator variant (``Evaluator.play_vs_pool``
    semantics, ``EvaluationCallback`` protocol): the agent plays its ARGMAX
    action (SB3 eval ``deterministic=True``), the served opponent stays
    stochastic, and finished games FREEZE instead of auto-resetting (rewards
    emit once, then zeros) — no seat/opponent redraws, no opening moves."""
    F = n * n
    n_t = 2 * (n_layers + 1)
    act_fn = jnp.tanh if activation == "tanh" else (lambda v: jnp.maximum(v, 0.0))

    seed_ref = refs[0]
    s0_in, s1_in, lbl_in, meta_in = refs[1:5]
    agent = refs[5 : 5 + n_t]
    bankT = refs[5 + n_t : 5 + 2 * n_t]
    ft_ref = refs[5 + 2 * n_t]
    pos = 6 + 2 * n_t
    if use_device_prng:
        agent_bits_ref = opp_bits_ref = first_bits_ref = reset_bits_ref = None
    else:
        agent_bits_ref, opp_bits_ref, first_bits_ref, reset_bits_ref = refs[
            pos : pos + 4
        ]
        pos += 4
    o_obs, o_int, o_flt, o_s0, o_s1, o_lbl, o_meta = refs[pos : pos + 7]

    t = pl.program_id(0)
    if use_device_prng:
        pltpu.prng_seed(seed_ref[0] ^ _block_seed(stream=3), seed_ref[1])

    @pl.when(t == 0)
    def _():
        o_s0[:] = s0_in[:]
        o_s1[:] = s1_in[:]
        o_lbl[:] = lbl_in[:]
        o_meta[:] = meta_in[:]

    s0 = o_s0[:]
    s1 = o_s1[:]
    labels = o_lbl[:]
    meta = o_meta[:]

    tm = _col(meta, M_TO_MOVE)
    done = _col(meta, M_DONE) != 0
    empty = _col(meta, M_EMPTY)
    mc = _col(meta, M_MOVES)
    seat = _col(meta, M_SEAT)
    use_best = _col(meta, M_USE_BEST)
    opp_idx = _col(meta, M_OPP_IDX)

    B = s0.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    lane_a = jax.lax.broadcasted_iota(jnp.int32, (B, A), 1)
    PT = _transpose_matrix(n, F, L)
    cell_f = (lane < F).astype(jnp.float32)

    def draw_bits(ref, shape):
        if use_device_prng:
            return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        return ref[0][:, : shape[1]]

    def mover_obs_legal(s0, s1, tm_col):
        """Mover-frame observation (B, L) f32 and legal mask (B, A) f32."""
        d = (s1 - s0).astype(jnp.float32)
        occ = (s0 + s1).astype(jnp.float32)
        mover0 = tm_col == 0
        dT = jnp.dot(d, PT, preferred_element_type=jnp.float32)
        occT = jnp.dot(occ, PT, preferred_element_type=jnp.float32)
        obs = jnp.where(mover0, d, -dT)
        legal = jnp.where(mover0, 1.0 - occ, 1.0 - occT) * cell_f
        return obs, legal[:, :A]

    def to_world(a_col, tm_col):
        ym, xm = a_col // n, a_col % n
        mover0 = tm_col == 0
        yw = jnp.where(mover0, ym, xm)
        xw = jnp.where(mover0, xm, ym)
        return yw * n + xw

    # ---- 1. agent forward + sample --------------------------------------
    obs_f, legal_f = mover_obs_legal(s0, s1, tm)
    x = obs_f[:, :F]
    h = x
    for li in range(n_layers):
        h = act_fn(
            jnp.dot(h, agent[2 * li][:], preferred_element_type=jnp.float32)
            + agent[2 * li + 1][:]
        )
    head = (
        jnp.dot(h, agent[2 * n_layers][:], preferred_element_type=jnp.float32)
        + agent[2 * n_layers + 1][:]
    )
    logits = head[:, :A]
    value = head[:, A : A + 1]

    masked = jnp.where(legal_f > 0.0, logits, MASKED_LOGIT)
    if eval_mode:  # SB3 eval plays deterministically (masked.mode)
        a_col = jnp.argmax(masked, axis=1, keepdims=True).astype(jnp.int32)
    else:
        a_bits = draw_bits(agent_bits_ref, (B, A))
        a_col = _sample_row(masked, _gumbel(a_bits))
    zmax = jnp.max(masked, axis=1, keepdims=True)
    z = masked - zmax
    lse = jnp.log(jnp.sum(jnp.exp(z), axis=1, keepdims=True))
    logp = jnp.sum(jnp.where(lane_a == a_col, z - lse, 0.0), axis=1, keepdims=True)

    # ---- 2. agent move ---------------------------------------------------
    act1 = ~done
    c1 = to_world(a_col, tm)
    s0, s1, labels, win1 = _apply_move(n, L, lane, s0, s1, labels, tm, c1, act1)
    empty = empty - act1.astype(jnp.int32)
    draw1 = act1 & (win1 == 0) & (empty <= 0)
    done = done | (win1 > 0) | draw1
    tm = jnp.where(act1, 1 - tm, tm)
    mc = mc + act1.astype(jnp.int32)

    # ---- 3. opponent reply ----------------------------------------------
    obs2, legal2 = mover_obs_legal(s0, s1, tm)
    idx = jnp.where(use_best != 0, P1 - 1, opp_idx)  # (B, 1)
    window_all = (
        jax.lax.broadcasted_iota(jnp.int32, (B, LW), 1) // H
    ) == idx
    onehot_m = (
        jax.lax.broadcasted_iota(jnp.int32, (B, P1c), 1) == idx
    ).astype(jnp.float32)

    # optional bf16 bank matmuls: weights arrive bf16 from the host; cast
    # the LHS at each dot, accumulate f32 (see rollout_bank_bf16)
    mm_t = jnp.bfloat16 if bank_bf16 else jnp.float32

    opp_logits_parts = []
    for off in range(0, B, chunk):
        sl = slice(off, off + chunk)
        xc = obs2[sl, :F]
        window = window_all[sl]
        oh_m = onehot_m[sl]
        h_all = (
            jnp.dot(xc.astype(mm_t), bankT[0][:], preferred_element_type=jnp.float32)
            + bankT[1][:].astype(jnp.float32)
        )
        hc = act_fn(jnp.where(window, h_all, 0.0))
        for li in range(1, n_layers):
            zc = jnp.dot(
                hc.astype(mm_t), bankT[2 * li][:], preferred_element_type=jnp.float32
            )
            zc = zc + jnp.dot(
                oh_m.astype(mm_t), bankT[2 * li + 1][:],
                preferred_element_type=jnp.float32,
            )
            hh = act_fn(zc)  # (chunk, H) compact
            pad = [jnp.zeros((hh.shape[0], LW - P1 * H), jnp.float32)] if LW > P1 * H else []
            hc = jnp.where(window, jnp.concatenate([hh] * P1 + pad, axis=1), 0.0)
        lg = jnp.dot(
            hc.astype(mm_t), bankT[2 * n_layers][:], preferred_element_type=jnp.float32
        )
        lg = lg + jnp.dot(
            oh_m.astype(mm_t), bankT[2 * n_layers + 1][:],
            preferred_element_type=jnp.float32,
        )
        opp_logits_parts.append(lg)
    opp_logits = (
        jnp.concatenate(opp_logits_parts, axis=0)
        if len(opp_logits_parts) > 1
        else opp_logits_parts[0]
    )

    masked2 = jnp.where(legal2 > 0.0, opp_logits, MASKED_LOGIT)
    o_bits = draw_bits(opp_bits_ref, (B, A))
    oa_col = _sample_row(masked2, _gumbel(o_bits))

    act2 = ~done
    c2 = to_world(oa_col, tm)
    s0, s1, labels, win2 = _apply_move(n, L, lane, s0, s1, labels, tm, c2, act2)
    empty = empty - act2.astype(jnp.int32)
    draw2 = act2 & (win2 == 0) & (empty <= 0)
    done = done | (win2 > 0) | draw2
    tm = jnp.where(act2, 1 - tm, tm)
    mc = mc + act2.astype(jnp.int32)

    reward = win1.astype(jnp.float32) - win2.astype(jnp.float32)
    done_out = done

    # ---- 4. auto-reset + redraws + opponent opening ----------------------
    # (training mode only — eval freezes finished games instead)
    if eval_mode:
        fa_col = jnp.zeros_like(a_col)
    else:
        # Mosaic has no unsigned-int reductions: bitcast the bit plane to
        # int32 before the lane extraction, then shift logically — the
        # top-24-bit value is non-negative either way, giving uniform
        # [0, 1) floats.
        r_bits = pltpu.bitcast(draw_bits(reset_bits_ref, (B, 128)), jnp.int32)
        to_unit = lambda col: (  # noqa: E731
            jax.lax.shift_right_logical(col, 8).astype(jnp.float32)
            * jnp.float32(2.0**-24)
        )
        u_seat = to_unit(_lane_col(r_bits, lane, 0))
        u_best = to_unit(_lane_col(r_bits, lane, 1))
        u_idx = to_unit(_lane_col(r_bits, lane, 2))

        m = done
        s0 = jnp.where(m, 0, s0)
        s1 = jnp.where(m, 0, s1)
        labels = jnp.where(m, lane, labels)
        empty = jnp.where(m, F, empty)
        tm = jnp.where(m, 0, tm)
        mc = jnp.where(m, 0, mc)
        done = jnp.where(m, 0, done.astype(jnp.int32)) != 0

        if per_episode_seat:
            seat = jnp.where(m, (u_seat < 0.5).astype(jnp.int32), seat)
        use_best = jnp.where(m, (u_best < best_prob).astype(jnp.int32), use_best)
        new_idx = jnp.minimum(
            (u_idx * (P1 - 1)).astype(jnp.int32), P1 - 2
        )  # uniform over the P pool slots (P1-1 == best is excluded)
        opp_idx = jnp.where(m, new_idx, opp_idx)

        act3 = m & (seat == 1)
        idx3 = jnp.where(use_best != 0, P1 - 1, opp_idx)
        onehot3 = (
            jax.lax.broadcasted_iota(jnp.int32, (B, P1c), 1) == idx3
        ).astype(jnp.float32)
        first_logits = jnp.dot(onehot3, ft_ref[:], preferred_element_type=jnp.float32)
        f_bits = draw_bits(first_bits_ref, (B, A))
        fa_col = _sample_row(first_logits, _gumbel(f_bits))  # empty board: all legal
        c3 = fa_col  # opener is seat 0 -> mover frame == world frame
        s0, s1, labels, _ = _apply_move(n, L, lane, s0, s1, labels, tm, c3, act3)
        empty = empty - act3.astype(jnp.int32)
        tm = jnp.where(act3, 1 - tm, tm)
        mc = mc + act3.astype(jnp.int32)

    # ---- emit ------------------------------------------------------------
    o_obs[0] = obs_f.astype(jnp.int32)
    zi = jnp.zeros_like(a_col)
    o_int[0] = jnp.concatenate(
        [a_col, oa_col, fa_col, done_out.astype(jnp.int32), seat, use_best,
         opp_idx, zi],
        axis=1,
    )
    zf = jnp.zeros_like(logp)
    o_flt[0] = jnp.concatenate(
        [logp, value, reward, zf, zf, zf, zf, zf], axis=1
    )

    o_s0[:] = s0
    o_s1[:] = s1
    o_lbl[:] = labels
    o_meta[:] = jnp.concatenate(
        [tm, done.astype(jnp.int32), empty, mc, seat, use_best, opp_idx, zi],
        axis=1,
    )


class FusedRolloutOut(NamedTuple):
    obs: jnp.ndarray  # (T, B, L) int32 mover-frame boards (lanes >= F zero)
    ints: jnp.ndarray  # (T, B, 8) int32 — I_* lanes
    flts: jnp.ndarray  # (T, B, 8) float32 — F_* lanes
    s0: jnp.ndarray
    s1: jnp.ndarray
    labels: jnp.ndarray
    meta: jnp.ndarray


def fused_rollout(
    topo: HexTopology,
    pol: PolicyOps,
    packed_agent: list,
    bank_tensors: list,
    first_table: jnp.ndarray,  # (P1c, A) float32 — empty-board logits per member
    state: HexState,
    meta_extra: dict,
    key: jax.Array,
    n_steps: int,
    best_prob: float,
    per_episode_seat: bool,
    interpret: bool = False,
    bank_bf16: bool = False,
    eval_mode: bool = False,
) -> FusedRolloutOut:
    """Run ``n_steps`` fused selfplay transitions; see module docstring.
    ``eval_mode`` switches to the evaluator semantics (argmax agent,
    freeze-at-done, no resets — see ``_rollout_kernel``)."""
    B = state.batch_size
    L = topo.lanes
    A = topo.num_cells
    n_t = 2 * (pol.n_layers + 1)
    P1c, _ = first_table.shape
    LW = bank_tensors[0].shape[1]
    P1 = meta_extra["n_members"]
    chunk = B
    for cand in (128, 64, 32, 16, 8):
        if B % cand == 0:
            chunk = cand
            break

    meta = jnp.stack(
        [
            state.to_move,
            state.done.astype(jnp.int32),
            state.empty,
            state.move_count,
            meta_extra["agent_seat"].astype(jnp.int32),
            meta_extra["use_best"].astype(jnp.int32),
            meta_extra["opp_idx"].astype(jnp.int32),
            jnp.zeros_like(state.to_move),
        ],
        axis=1,
    )

    def const_spec(x):
        return pl.BlockSpec(x.shape, lambda i, *_: (0,) * x.ndim, memory_space=pltpu.VMEM)

    def stream_spec(w, dtype_unused=None):
        return pl.BlockSpec((1, B, w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)

    inputs = [
        state.stones[:, 0].astype(jnp.int32),
        state.stones[:, 1].astype(jnp.int32),
        state.labels,
        meta,
        *packed_agent,
        *bank_tensors,
        first_table,
    ]
    in_specs = [const_spec(x) for x in inputs]

    if interpret:
        kb = jax.random.split(key, 4)
        bits = [
            jax.random.bits(kb[0], (n_steps, B, A), jnp.uint32),
            jax.random.bits(kb[1], (n_steps, B, A), jnp.uint32),
            jax.random.bits(kb[2], (n_steps, B, A), jnp.uint32),
            jax.random.bits(kb[3], (n_steps, B, 128), jnp.uint32),
        ]
        inputs += bits
        in_specs += [stream_spec(A), stream_spec(A), stream_spec(A), stream_spec(128)]

    out_specs = (
        stream_spec(L),
        stream_spec(M_WIDTH),
        stream_spec(M_WIDTH),
        const_spec(inputs[0]),
        const_spec(inputs[1]),
        const_spec(inputs[2]),
        const_spec(meta),
    )
    out_shape = (
        jax.ShapeDtypeStruct((n_steps, B, L), jnp.int32),
        jax.ShapeDtypeStruct((n_steps, B, M_WIDTH), jnp.int32),
        jax.ShapeDtypeStruct((n_steps, B, M_WIDTH), jnp.float32),
        jax.ShapeDtypeStruct((B, L), jnp.int32),
        jax.ShapeDtypeStruct((B, L), jnp.int32),
        jax.ShapeDtypeStruct((B, L), jnp.int32),
        jax.ShapeDtypeStruct((B, M_WIDTH), jnp.int32),
    )

    if bank_bf16:  # block specs are dtype-agnostic; cast in place
        for j in range(4 + n_t, 4 + 2 * n_t):
            inputs[j] = inputs[j].astype(jnp.bfloat16)

    kernel = functools.partial(
        _rollout_kernel,
        topo.n, L, A, n_steps, pol.n_layers, pol.H, P1, P1c, LW,
        pol.activation, best_prob, per_episode_seat, chunk, not interpret,
        bank_bf16, eval_mode,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret
    )(_seed_scalar(key), *inputs)
    return FusedRolloutOut(*outs)


def verify_rollout_trajectory(
    topo: HexTopology,
    model,
    variables: Any,
    carry,
    out: FusedRolloutOut,
    n_steps: int,
    seat_mode: str,
    pool_size: int,
    atol: float = 1e-5,
):
    """Replay a fused rollout's emitted record through the independent lax
    env ops and assert exact trajectory equality (host-side debug utility;
    also the body of ``tests/test_pallas_rollout.py`` and the on-hardware
    check in ``scripts/tpu_selftest.py``).

    Works for ANY PRNG source because the kernel emits every draw it made
    (actions, opponent replies, opening moves, reset seat/opponent draws):
    observations, legal masks, action legality, rewards, dones, reset
    bookkeeping, policy value/log-prob (vs ``model.apply``), and the final
    carry state down to the connectivity labels are all re-derived and
    compared.  Returns the replayed final state.  Raises ``AssertionError``
    on any mismatch.
    """
    import numpy as np

    from hex_gym_env_tpu.core import env as hex_env

    F = topo.num_cells
    n = topo.n
    B = carry.env.batch_size
    ar = np.arange(B)
    state = carry.env
    seat = np.asarray(carry.agent_seat)
    use_best = np.asarray(carry.use_best)
    opp_idx = np.asarray(carry.opp_idx)
    fresh = hex_env.initial_state(topo, B)

    for t in range(n_steps):
        obs_ref = np.asarray(hex_env.observe(topo, state))
        obs_out = np.asarray(out.obs[t][:, :F]).reshape(B, n, n)
        np.testing.assert_array_equal(obs_out, obs_ref, err_msg=f"obs @ {t}")
        legal_ref = np.asarray(hex_env.legal_mask(topo, state))
        np.testing.assert_array_equal(
            obs_out.reshape(B, F) == 0, legal_ref, err_msg=f"legal @ {t}"
        )

        a = np.asarray(out.ints[t, :, I_ACTION])
        assert legal_ref[ar, a].all(), f"illegal agent action at step {t}"

        logits, value = model.apply(variables, obs_ref.astype(jnp.float32))
        masked_l = jnp.where(legal_ref, logits, -jnp.inf)
        logp = jax.nn.log_softmax(masked_l, axis=-1)
        np.testing.assert_allclose(
            np.asarray(out.flts[t, :, F_VALUE]), np.asarray(value), atol=atol,
            err_msg=f"value @ {t}",
        )
        np.testing.assert_allclose(
            np.asarray(out.flts[t, :, F_LOGP]), np.asarray(logp)[ar, a],
            atol=atol, err_msg=f"log_prob @ {t}",
        )

        st1, rew1 = hex_env.step(topo, state, jnp.asarray(a))
        r = np.asarray(rew1)[ar, seat]
        oa = np.asarray(out.ints[t, :, I_OPP_ACTION])
        active2 = ~np.asarray(st1.done)
        legal2 = np.asarray(hex_env.legal_mask(topo, st1))
        assert legal2[ar, oa][active2].all(), f"illegal opponent reply at {t}"
        st2, rew2 = hex_env.step(
            topo, st1, jnp.asarray(oa), active=jnp.asarray(active2)
        )
        r = r + np.asarray(rew2)[ar, seat]

        np.testing.assert_allclose(
            np.asarray(out.flts[t, :, F_REWARD]), r, err_msg=f"reward @ {t}"
        )
        done = np.asarray(st2.done)
        np.testing.assert_array_equal(
            np.asarray(out.ints[t, :, I_DONE]) != 0, done, err_msg=f"done @ {t}"
        )

        st3 = hex_env.reset_where(topo, st2, jnp.asarray(done), fresh)
        seat2 = np.asarray(out.ints[t, :, I_SEAT])
        use_best2 = np.asarray(out.ints[t, :, I_USE_BEST]) != 0
        opp_idx2 = np.asarray(out.ints[t, :, I_OPP_IDX])
        np.testing.assert_array_equal(seat2[~done], seat[~done])
        np.testing.assert_array_equal(use_best2[~done], use_best[~done])
        np.testing.assert_array_equal(opp_idx2[~done], opp_idx[~done])
        if seat_mode == "fixed_random":
            np.testing.assert_array_equal(seat2, seat)
        assert ((opp_idx2 >= 0) & (opp_idx2 < pool_size)).all()

        fa = np.asarray(out.ints[t, :, I_FIRST_ACTION])
        open_mask = done & (seat2 == 1)
        st4, _ = hex_env.step(
            topo, st3, jnp.asarray(fa), active=jnp.asarray(open_mask)
        )
        state, seat, use_best, opp_idx = st4, seat2, use_best2, opp_idx2

    np.testing.assert_array_equal(
        np.asarray(out.s0 != 0), np.asarray(state.stones[:, 0])
    )
    np.testing.assert_array_equal(
        np.asarray(out.s1 != 0), np.asarray(state.stones[:, 1])
    )
    np.testing.assert_array_equal(np.asarray(out.labels), np.asarray(state.labels))
    np.testing.assert_array_equal(
        np.asarray(out.meta[:, M_TO_MOVE]), np.asarray(state.to_move)
    )
    np.testing.assert_array_equal(
        np.asarray(out.meta[:, M_EMPTY]), np.asarray(state.empty)
    )
    np.testing.assert_array_equal(
        np.asarray(out.meta[:, M_DONE]) != 0, np.asarray(state.done)
    )
    return state


# auto-mode VMEM ceiling for the mega-kernel (bytes).  The 16MB budget must
# hold: carry blocks in+out, the double-buffered output streams, the stacked
# bank tensors (lane-padded), and the row-chunked activation transients.
MAX_VMEM_BYTES = 13 * 1024 * 1024


def vmem_estimate(model, cfg, batch: int) -> int:
    """Rough VMEM footprint of the fused kernel at ``batch`` rows: used by
    the auto gate so oversized batches (e.g. a 4096-env PRNG soak test)
    fall back to the scan path instead of failing/blowing the budget."""
    H = model.pi_layers[0]
    L = 128  # boards up to 11x11 lane-pack to 128
    F8 = -(-(cfg.board_size**2) // 8) * 8  # sublane-padded input rows
    P1 = cfg.buffer_size + 1
    LW = -(-(P1 * H) // 128) * 128
    chunk = 128 if batch % 128 == 0 else min(batch, 128)
    carry = 2 * 3 * batch * L * 4 + 2 * 2 * batch * 8 * 4
    streams = 3 * 2 * batch * L * 4  # (1,B,128) blocks, double-buffered
    # W2s/Whs lane-pad to 128; W1s spans F8 sublanes; + bias stacks
    bank = 2 * LW * 128 * 4 + LW * (F8 + 8) * 4
    transients = 2 * chunk * LW * 4
    agent = 3 * 128 * 128 * 4
    return carry + streams + bank + transients + agent


def supported(model, cfg, batch: int | None = None) -> bool:
    """Gate: plain equal-tower MLP, fused policy packing available, no
    sampled mid-game boards (the opening-table shortcut requires fresh
    resets to be empty boards, like the scan path's ``first_move_logits``),
    and — when ``batch`` is given — a VMEM footprint inside the budget."""
    from hex_gym_env_tpu.ops import pallas_policy

    if cfg.board_size**2 + 4 > 128:
        # The kernel and its vmem_estimate hardcode 128-lane packing (board
        # cells + 4 meta slots in one lane row); 12x12+ needs 256 lanes and
        # must take the scan path rather than fail at trace time.
        return False
    if cfg.sample_board or not pallas_policy.supported(model, cfg.buffer_size):
        return False
    if batch is not None and vmem_estimate(model, cfg, batch) > MAX_VMEM_BYTES:
        return False
    return True


def resolve(model, cfg, batch: int | None = None) -> "PolicyOps | None":
    """Shared gating for the fused-rollout consumers (``SelfplayRunner``
    passes ``batch=n_envs``, ``Evaluator`` ``batch=eval_episodes``): returns
    ``PolicyOps`` when the mega-kernel should drive this (model, config,
    batch), else None.

    "auto" fuses only on TPU AND when the per-step pallas policy path
    resolved too — a pinned ``policy_impl='lax'`` (the strict SB3-parity
    presets) pins the jax.random sampling stream, which the fused kernel's
    hardware PRNG would silently replace.  "fused" forces (raising when the
    model/pool/board mode cannot be packed); "scan" disables.
    """
    from hex_gym_env_tpu.ops import pallas_policy

    impl = getattr(cfg, "rollout_impl", "auto")
    if impl not in ("auto", "scan", "fused"):
        raise ValueError(
            f"rollout_impl must be one of 'auto'/'scan'/'fused', got {impl!r}"
        )
    if impl == "scan":
        return None
    on_tpu = jax.default_backend() == "tpu"
    pol_ok = pallas_policy.resolve_policy_ops(model, cfg) is not None
    if impl == "fused" or (impl == "auto" and on_tpu and pol_ok):
        if supported(model, cfg, batch):
            return PolicyOps(model, interpret=not on_tpu)
        if impl == "fused":
            raise ValueError(
                "rollout_impl='fused' requires a plain equal-tower "
                "MlpPolicy, a bank that fits the stacked-lane packing, "
                "sample_board=False, and a batch whose VMEM footprint "
                f"fits the kernel budget ({MAX_VMEM_BYTES >> 20}MB)"
            )
    return None

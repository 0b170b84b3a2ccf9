"""Fused on-device selfplay rollout.

Replaces the reference's per-step Python round trip — SB3 ``collect_rollouts``
calling ``SelfPlayEnv.step`` which plays the agent move then the opponent's
reply through ``continue_game`` (``minihex/SelfplayWrapper.py:146-199``) —
with a single ``lax.scan`` whose body does, for every env in lockstep:

  1. agent forward (current params) -> masked sample -> env step;
  2. opponent reply where the game continues (``continue_game``);
  3. auto-reset finished games: fresh board, per-episode seat draw, 80/20
     best/pool opponent draw (``setup_opponents``), and the opponent's first
     move when the agent sits second (``SelfplayWrapper.py:79-81``).

One scan iteration == one agent transition for every env, exactly the data
SB3 would collect, but thousands of games at a time with zero host syncs.

Opponent inference strategy: instead of gathering per-env parameter trees
out of the snapshot bank (an irregular, memory-amplifying gather), every
bank member runs a dense forward over the whole batch — (P, B, A) logits —
and each env selects its row.  Dense batched matmuls are what the MXU is
for; at reference scales (pool <= 256, params ~12.5k) this is microseconds.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from hex_gym_env_tpu.core import env as hex_env
from hex_gym_env_tpu.core import random_board
from hex_gym_env_tpu.core.state import HexState
from hex_gym_env_tpu.core.topology import HexTopology
from hex_gym_env_tpu.ops import masked
from hex_gym_env_tpu.train.bank import OpponentBank, sample_opponents
from hex_gym_env_tpu.utils.config import SelfplayConfig


# the ONE dispatch rule for the env-step backend, shared with the
# composable public API (core.env.make_ops) so the two never disagree.
# Inside a T-step rollout scan with 3 env steps per body, the fused kernel
# is the difference between ~100 and ~3 kernel launches per transition.
resolve_step_impl = hex_env.resolve_step_impl


class Transition(NamedTuple):
    """One agent transition per env (stacked to (T, ...) by the scan)."""

    obs: jnp.ndarray  # (B, N, N) int8 — mover-frame board the agent saw
    legal: jnp.ndarray  # (B, A) bool
    action: jnp.ndarray  # (B,) int32
    log_prob: jnp.ndarray  # (B,) float32
    value: jnp.ndarray  # (B,) float32
    reward: jnp.ndarray  # (B,) float32 — reward[agent_seat] incl. opponent reply
    done: jnp.ndarray  # (B,) bool — episode ended within this transition


@struct.dataclass
class RolloutCarry:
    env: HexState
    agent_seat: jnp.ndarray  # (B,) int32
    use_best: jnp.ndarray  # (B,) bool — opponent is the designated best
    opp_idx: jnp.ndarray  # (B,) int32 — pool slot otherwise


class SelfplayRunner:
    """Factory of jit-friendly rollout closures for one config."""

    def __init__(self, topo: HexTopology, model, cfg: SelfplayConfig):
        self.topo = topo
        self.model = model
        self.cfg = cfg
        mode = getattr(cfg, "cnn_bank_mode", "auto")
        if mode not in ("auto", "dense", "gathered"):
            raise ValueError(
                f"cnn_bank_mode must be 'auto'/'dense'/'gathered', got {mode!r}"
            )
        self.step = resolve_step_impl(cfg.env_step_impl)
        # fused policy-pass kernels (None -> composable lax path).  One
        # Pallas launch each for agent forward+sample and bank forward+sample
        # instead of ~20 small XLA kernels per pass (ops/pallas_policy.py).
        from hex_gym_env_tpu.ops import pallas_policy, pallas_rollout

        self.pol = pallas_policy.resolve_policy_ops(model, cfg)
        # whole-rollout mega-kernel (None -> per-step scan).  All T steps in
        # ONE Pallas launch (ops/pallas_rollout.py); ~5 launches + XLA glue
        # per transition otherwise.  Gating shared with the Evaluator
        # (pallas_rollout.resolve).
        self.fused_pol = pallas_rollout.resolve(model, cfg, batch=cfg.n_envs)

    # -- helpers -----------------------------------------------------------

    def fresh_envs(self, key: jax.Array) -> HexState:
        if self.cfg.sample_board:
            boards = random_board.sample_boards(key, self.topo, self.cfg.n_envs)
            return hex_env.state_from_boards(self.topo, boards)
        return hex_env.initial_state(self.topo, self.cfg.n_envs)

    def policy_logits_value(self, variables: Any, state: HexState):
        obs = hex_env.observe(self.topo, state)
        legal = hex_env.legal_mask(self.topo, state)
        logits, value = self.model.apply(variables, obs.astype(jnp.float32))
        return obs, legal, logits, value

    def opponent_logits(
        self, bank: OpponentBank, use_best: jnp.ndarray, opp_idx: jnp.ndarray,
        state: HexState,
    ):
        obs_f = hex_env.observe(self.topo, state).astype(jnp.float32)
        legal = hex_env.legal_mask(self.topo, state)
        from hex_gym_env_tpu.models.cnn import CnnPolicy, gathered_bank_logits

        # mode validated once in __init__
        mode = getattr(self.cfg, "cnn_bank_mode", "auto")
        if isinstance(self.model, CnnPolicy) and mode != "dense":
            # compute only each env's assigned opponent (gathered folded
            # conv stack + weight-dense tower; the best snapshot rides the
            # same pass) — the dense P x B pass was the measured CNN
            # throughput ceiling (RESULTS.md r4 -> r5)
            dtype = (
                jnp.bfloat16
                if getattr(self.cfg, "rollout_bank_bf16", False)
                else jnp.float32
            )
            logits = gathered_bank_logits(
                self.model, bank.params, bank.best_params,
                use_best, opp_idx, obs_f, dtype=dtype,
            )
            return logits, legal
        per_member = self.bank_forward(bank.params, obs_f)  # (P, B, A)
        chosen = jnp.take_along_axis(
            per_member, opp_idx[None, :, None], axis=0
        )[0]  # (B, A)
        best = self.model.apply(bank.best_params, obs_f)[0]
        return jnp.where(use_best[:, None], best, chosen), legal

    def bank_forward(self, stacked_variables, obs_f: jnp.ndarray) -> jnp.ndarray:
        """All members' logits over a shared batch, (P, B, A).

        CNN banks take the grouped-conv/BN-folded stacked forward
        (``models/cnn.bank_logits``) — ``vmap`` of a per-member conv makes
        XLA lower each layer with ``batch_group_count=P`` plus 5 BatchNorm
        layers of VPU work per member; the grouped forward is one op per
        layer with the member axis in the channel dim (VERDICT r3 item 6).
        """
        from hex_gym_env_tpu.models.cnn import CnnPolicy, bank_logits

        if isinstance(self.model, CnnPolicy):
            dtype = (
                jnp.bfloat16
                if getattr(self.cfg, "rollout_bank_bf16", False)
                else jnp.float32
            )
            return bank_logits(self.model, stacked_variables, obs_f, dtype=dtype)
        return jax.vmap(lambda v: self.model.apply(v, obs_f)[0])(stacked_variables)

    def opponent_move(
        self, bank: OpponentBank, use_best, opp_idx, state: HexState,
        key: jax.Array, active: jnp.ndarray, stacked=None,
    ):
        """Opponent acts stochastically with the action mask, like
        ``OpponentPolicy.choose_action`` (``SelfplayWrapper.py:30-32``)."""
        if self.pol is not None and stacked is not None:
            obs = hex_env.observe(self.topo, state)
            legal = hex_env.legal_mask(self.topo, state)
            action, _ = self.pol.bank_act(stacked, use_best, opp_idx, obs, legal, key)
        else:
            logits, legal = self.opponent_logits(bank, use_best, opp_idx, state)
            action = masked.sample(key, logits, legal)
        return self.step(self.topo, state, action, active=active)

    def first_move_logits(self, bank: OpponentBank):
        """Every pool member's logits on the empty board, (P, A) and (A,).

        With ``sample_board=False`` a freshly reset board is empty, so the
        opponent's opening-move logits are a constant of its parameters —
        computed ONCE per rollout instead of running the full bank forward
        inside every scan step (the bank pass over tiny GEMMs is the rollout
        hot spot).  Bitwise-identical to the in-loop inference it replaces.
        """
        n = self.topo.n
        empty = jnp.zeros((1, n, n), jnp.float32)
        members = self.bank_forward(bank.params, empty)[:, 0]  # (P, A)
        best = self.model.apply(bank.best_params, empty)[0][0]
        return members, best

    def reset_finished(
        self, carry: RolloutCarry, bank: OpponentBank, key: jax.Array,
        first_logits=None, stacked=None,
    ):
        """Auto-reset done games + seat/opponent redraw + opponent first move."""
        cfg = self.cfg
        m = carry.env.done
        k_fresh, k_seat, k_opp, k_move = jax.random.split(key, 4)
        st = hex_env.reset_where(self.topo, carry.env, m, self.fresh_envs(k_fresh))

        seat = carry.agent_seat
        if cfg.seat_mode == "per_episode":
            redraw = jax.random.bernoulli(k_seat, 0.5, m.shape).astype(jnp.int32)
            seat = jnp.where(m, redraw, seat)
        # "fixed_random": the reference's first-reset-only seat draw
        # (SelfplayWrapper.py:72-73); assigned once in init_carry.

        nb, ni = sample_opponents(k_opp, bank.size, cfg.n_envs, cfg.best_prob)
        use_best = jnp.where(m, nb, carry.use_best)
        opp_idx = jnp.where(m, ni, carry.opp_idx)

        # Where the opponent holds seat 0 it opens the fresh game
        # (SelfplayWrapper.py:79-81; the returned reward is discarded there too).
        active = m & (seat == 1)
        if first_logits is not None and not cfg.sample_board:
            members, best_l = first_logits
            logits = jnp.where(
                use_best[:, None], best_l[None, :], members[opp_idx]
            )
            # every cell of the empty board is legal; inactive rows' samples
            # are discarded by the step's ``active`` mask
            legal = jnp.ones((cfg.n_envs, self.topo.num_cells), bool)
            action = masked.sample(k_move, logits, legal)
            st, _ = self.step(self.topo, st, action, active=active)
        else:
            st, _ = self.opponent_move(
                bank, use_best, opp_idx, st, k_move, active=active, stacked=stacked
            )
        return RolloutCarry(env=st, agent_seat=seat, use_best=use_best, opp_idx=opp_idx)

    # -- entry points ------------------------------------------------------

    def init_carry(self, bank: OpponentBank, key: jax.Array) -> RolloutCarry:
        cfg = self.cfg
        k_fresh, k_seat, k_opp, k_move = jax.random.split(key, 4)
        st = self.fresh_envs(k_fresh)
        seat = jax.random.bernoulli(k_seat, 0.5, (cfg.n_envs,)).astype(jnp.int32)
        use_best, opp_idx = sample_opponents(k_opp, bank.size, cfg.n_envs, cfg.best_prob)
        stacked = self.pol.stack_bank(bank) if self.pol is not None else None
        st, _ = self.opponent_move(
            bank, use_best, opp_idx, st, k_move, active=seat == 1, stacked=stacked
        )
        return RolloutCarry(env=st, agent_seat=seat, use_best=use_best, opp_idx=opp_idx)

    def run_fused(
        self, params: Any, bank: OpponentBank, carry: RolloutCarry,
        key: jax.Array, n_steps: int,
    ):
        """Whole-rollout mega-kernel path (``ops/pallas_rollout``): all
        ``n_steps`` transitions in ONE Pallas launch.  Same distribution as
        the scan path; hardware-PRNG stream (the ``policy_impl='pallas'``
        deviation).  Trajectory-level semantics are replay-verified against
        the lax env ops in ``tests/test_pallas_rollout.py``."""
        from hex_gym_env_tpu.core.state import HexState, Winner
        from hex_gym_env_tpu.ops import pallas_rollout as pr

        pol = self.fused_pol
        packed = pol.pack_agent(params["params"])
        stacked = pol.stack_bank(bank)
        n = self.topo.n
        # opening-move logits table: each member's logits on the empty board
        # (constant within a rollout; see first_move_logits above)
        empty_b = jnp.zeros((1, n, n), jnp.float32)
        members = jax.vmap(lambda v: self.model.apply(v, empty_b)[0][0])(bank.params)
        best = self.model.apply(bank.best_params, empty_b)[0][0]
        ft = jnp.concatenate([members, best[None]], axis=0)  # (P1, A)
        P1 = stacked.n_members
        P1c = stacked.tensors[-1].shape[0]
        ft = jnp.pad(ft.astype(jnp.float32), ((0, P1c - P1), (0, 0)))

        out = pr.fused_rollout(
            self.topo, pol, packed, stacked.tensors, ft, carry.env,
            dict(
                n_members=P1,
                agent_seat=carry.agent_seat,
                use_best=carry.use_best,
                opp_idx=carry.opp_idx,
            ),
            key, n_steps, self.cfg.best_prob,
            self.cfg.seat_mode == "per_episode",
            interpret=pol.interpret,
            bank_bf16=getattr(self.cfg, "rollout_bank_bf16", False),
        )
        F = self.topo.num_cells
        obs_cells = out.obs[:, :, :F]
        tr = Transition(
            obs=obs_cells.astype(jnp.int8).reshape(n_steps, -1, n, n),
            legal=obs_cells == 0,
            action=out.ints[..., pr.I_ACTION],
            log_prob=out.flts[..., pr.F_LOGP],
            value=out.flts[..., pr.F_VALUE],
            reward=out.flts[..., pr.F_REWARD],
            done=out.ints[..., pr.I_DONE] != 0,
        )
        B = carry.env.batch_size
        env2 = HexState(
            stones=jnp.stack([out.s0 != 0, out.s1 != 0], axis=1),
            labels=out.labels,
            to_move=out.meta[:, pr.M_TO_MOVE],
            done=out.meta[:, pr.M_DONE] != 0,
            winner=jnp.full((B,), int(Winner.ONGOING), jnp.int32),
            empty=out.meta[:, pr.M_EMPTY],
            move_count=out.meta[:, pr.M_MOVES],
        )
        carry2 = RolloutCarry(
            env=env2,
            agent_seat=out.meta[:, pr.M_SEAT],
            use_best=out.meta[:, pr.M_USE_BEST] != 0,
            opp_idx=out.meta[:, pr.M_OPP_IDX],
        )
        _, _, _, last_values = self.policy_logits_value(params, env2)
        return carry2, tr, last_values

    def run(
        self, params: Any, bank: OpponentBank, carry: RolloutCarry,
        key: jax.Array, n_steps: int,
    ):
        """Collect ``n_steps`` agent transitions per env.

        Returns (carry', transitions (T, ...), last_values (B,)).
        """
        if self.fused_pol is not None:
            return self.run_fused(params, bank, carry, key, n_steps)

        first_logits = None if self.cfg.sample_board else self.first_move_logits(bank)
        pol = self.pol
        packed_agent = pol.pack_agent(params["params"]) if pol is not None else None
        stacked_bank = pol.stack_bank(bank) if pol is not None else None

        def body(c: RolloutCarry, k):
            k_agent, k_opp, k_reset = jax.random.split(k, 3)

            if pol is not None:
                obs = hex_env.observe(self.topo, c.env)
                legal = hex_env.legal_mask(self.topo, c.env)
                res = pol.agent_act(packed_agent, obs, legal, k_agent)
                action, log_prob, value = res.action, res.log_prob, res.value
            else:
                obs, legal, logits, value = self.policy_logits_value(params, c.env)
                action, log_prob = masked.sample_with_info(k_agent, logits, legal)
            st1, rew1 = self.step(self.topo, c.env, action)
            seat_col = c.agent_seat[:, None]
            r_agent = jnp.take_along_axis(rew1, seat_col, axis=1)[:, 0]

            st2, rew2 = self.opponent_move(
                bank, c.use_best, c.opp_idx, st1, k_opp, active=~st1.done,
                stacked=stacked_bank,
            )
            r_agent = r_agent + jnp.take_along_axis(rew2, seat_col, axis=1)[:, 0]
            done = st2.done

            c2 = self.reset_finished(
                RolloutCarry(st2, c.agent_seat, c.use_best, c.opp_idx), bank,
                k_reset, first_logits=first_logits, stacked=stacked_bank,
            )
            t = Transition(
                obs=obs.astype(jnp.int8),
                legal=legal,
                action=action,
                log_prob=log_prob,
                value=value,
                reward=r_agent,
                done=done,
            )
            return c2, t

        carry, transitions = jax.lax.scan(
            body, carry, jax.random.split(key, n_steps)
        )
        _, _, _, last_values = self.policy_logits_value(params, carry.env)
        return carry, transitions, last_values

"""On-device evaluation vs the opponent pool + pool-update protocol.

Mirrors the reference's ``SelfPlayCallback`` + eval-mode wrapper:

- eval mode serves pool member ``i`` to episode ``i``
  (``SelfplayWrapper.py:92-96``; every experiment sets
  ``n_eval_episodes = buffer_size`` so each member is played once);
- the agent acts deterministically (SB3 ``evaluate_policy`` default), the
  opponent stochastically;
- ``score = mean_reward * exp(mean(pool_scores) - 1)``
  (``EvaluationCallback.py:35``); when ``mean_reward > 0`` and the score
  beats the pool minimum, a random argmin-score member is replaced by the
  current parameters and the best snapshot is promoted on a strict
  improvement (``EvaluationCallback.py:36-48``,
  ``SelfplayWrapper.py:125-137``).

Here all E = ``n_eval_episodes`` episodes run as one vmapped batch: episode
``i`` plays pool member ``min(i, P-1)`` — the reference's eval-mode
``setup_opponents`` serves ``pool[i]`` and keeps the LAST member past the
end of the buffer (``SelfplayWrapper.py:92-96``), which only matters when
``n_eval_episodes != buffer_size`` (every reference experiment sets them
equal).  A fixed-length scan of N^2+1 agent/opponent move pairs covers any
game (finished games freeze), and the pool mutation happens on device.

Seat protocol: under ``seat_mode="per_episode"`` each eval episode draws a
fresh agent seat.  Under ``seat_mode="fixed_random"`` (the reference's
first-reset-only draw, ``SelfplayWrapper.py:72-73``) eval reuses the
rollout envs' fixed seats — the reference evaluates through the *same* env
object it trains in, so its eval episodes inherit the training seat; eval
episode ``i`` here inherits the seat of rollout env ``i mod n_envs``.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from hex_gym_env_tpu.core import env as hex_env
from hex_gym_env_tpu.core import random_board
from hex_gym_env_tpu.core.topology import HexTopology
from hex_gym_env_tpu.ops import masked
from hex_gym_env_tpu.train.bank import OpponentBank, replace_member
from hex_gym_env_tpu.utils.config import SelfplayConfig


class EvalResult(NamedTuple):
    rewards: jnp.ndarray  # (E,) final agent reward per eval episode
    mean_reward: jnp.ndarray  # ()
    score: jnp.ndarray  # ()
    replaced: jnp.ndarray  # () bool — pool member replaced this eval
    best_score: jnp.ndarray  # () after potential promotion


def serve_indices(n_episodes: int, pool_size: int) -> jnp.ndarray:
    """Pool slot served to each eval episode: ``pool[i]`` then repeat the
    last member past the buffer end (``SelfplayWrapper.py:92-96``)."""
    return jnp.minimum(jnp.arange(n_episodes), pool_size - 1)


def eval_seats(
    cfg: SelfplayConfig,
    key: jax.Array,
    n_episodes: int,
    fixed_seats: jnp.ndarray | None,
) -> jnp.ndarray:
    """Agent seat per eval episode.

    ``fixed_random`` + carry seats: episode ``i`` inherits rollout env
    ``i mod n_envs``'s seat (the reference evaluates through its training
    env, so eval inherits the run's fixed seat); otherwise a fresh draw.
    """
    if cfg.seat_mode == "fixed_random" and fixed_seats is not None:
        return fixed_seats[
            jnp.arange(n_episodes) % fixed_seats.shape[0]
        ].astype(jnp.int32)
    return jax.random.bernoulli(key, 0.5, (n_episodes,)).astype(jnp.int32)


class Evaluator:
    def __init__(self, topo: HexTopology, model, cfg: SelfplayConfig):
        self.topo = topo
        self.model = model
        self.cfg = cfg
        from hex_gym_env_tpu.ops import pallas_rollout
        from hex_gym_env_tpu.train.rollout import resolve_step_impl

        self.step = resolve_step_impl(cfg.env_step_impl)
        # eval as ONE Pallas launch (argmax agent, freeze-at-done) when the
        # fused rollout path resolves; same gating -> strict presets (which
        # pin the scan/lax streams) keep the lax evaluator
        self.fused_pol = pallas_rollout.resolve(
            model, cfg, batch=cfg.eval_episodes
        )

    def _opponent_logits(self, served_params: Any, state) -> jnp.ndarray:
        """Served member i plays episode i.

        MLP: paired vmap over (snapshot_i, obs_i).  CNN: E batch-1 vmapped
        conv forwards lower terribly; the grouped stacked forward runs all
        served members as one conv per layer (``models/cnn.bank_logits``
        with ``paired=True``)."""
        from hex_gym_env_tpu.models.cnn import CnnPolicy, bank_logits

        obs_f = hex_env.observe(self.topo, state).astype(jnp.float32)
        if isinstance(self.model, CnnPolicy):
            return bank_logits(self.model, served_params, obs_f, paired=True)
        return jax.vmap(
            lambda v, o: self.model.apply(v, o[None])[0][0]
        )(served_params, obs_f)

    def play_vs_pool(
        self,
        params: Any,
        bank: OpponentBank,
        key: jax.Array,
        fixed_seats: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """``n_eval_episodes`` episodes against the served pool sequence;
        returns (E,) final agent rewards.  ``fixed_seats`` (the rollout
        carry's per-env seats) drives the seat assignment under
        ``seat_mode="fixed_random"``."""
        topo, cfg = self.topo, self.cfg
        P = bank.size
        E = cfg.eval_episodes
        sym = getattr(cfg, "symmetric_eval", False)
        if self.fused_pol is not None and not cfg.sample_board and not sym:
            return self._play_vs_pool_fused(params, bank, key, fixed_seats)
        k_board, k_seat, k_first, k_play = jax.random.split(key, 4)
        if sym:
            # opt-in symmetric criterion: every served member twice — once
            # with the agent in each seat; seat_mode/fixed_seats are
            # intentionally overridden (that asymmetry is what the knob
            # removes).  Row i and row E+i serve the same member.
            n_ep = 2 * E
            serve = jnp.tile(serve_indices(E, P), 2)
            seat = jnp.concatenate(
                [jnp.zeros((E,), jnp.int32), jnp.ones((E,), jnp.int32)]
            )
        else:
            n_ep = E
            serve = serve_indices(E, P)
            seat = eval_seats(cfg, k_seat, E, fixed_seats)
        served = jax.tree.map(lambda x: x[serve], bank.params)

        if cfg.sample_board:
            boards = random_board.sample_boards(k_board, topo, n_ep)
            state = hex_env.state_from_boards(topo, boards)
        else:
            state = hex_env.initial_state(topo, n_ep)

        def opponent_move(st, k, active):
            logits = self._opponent_logits(served, st)
            legal = hex_env.legal_mask(topo, st)
            a = masked.sample(k, logits, legal)
            return self.step(topo, st, a, active=active)

        # opponent opens where it holds seat 0
        state, _ = opponent_move(state, k_first, active=seat == 1)

        def body(carry, k):
            st, total = carry
            obs = hex_env.observe(topo, st).astype(jnp.float32)
            legal = hex_env.legal_mask(topo, st)
            logits, _ = self.model.apply(params, obs)
            a = masked.mode(logits, legal)  # deterministic agent
            st, rew1 = self.step(topo, st, a)
            st, rew2 = opponent_move(st, k, active=~st.done)
            seat_col = seat[:, None]
            got = (
                jnp.take_along_axis(rew1, seat_col, axis=1)[:, 0]
                + jnp.take_along_axis(rew2, seat_col, axis=1)[:, 0]
            )
            return (st, total + got), None

        n_pairs = topo.num_cells // 2 + 2
        (state, total), _ = jax.lax.scan(
            body, (state, jnp.zeros((n_ep,), jnp.float32)), jax.random.split(k_play, n_pairs)
        )
        if sym:
            return 0.5 * (total[:E] + total[E:])  # per-member two-seat mean
        return total

    def _play_vs_pool_fused(
        self,
        params: Any,
        bank: OpponentBank,
        key: jax.Array,
        fixed_seats: jnp.ndarray | None,
    ) -> jnp.ndarray:
        """The whole eval pass as one mega-kernel launch
        (``pallas_rollout.fused_rollout(eval_mode=True)``): agent argmax +
        stochastic served opponents + freeze-at-done.  Same protocol and
        distributions as the lax loop above; hardware-PRNG stream (the
        ``policy_impl='pallas'`` deviation).  Replay-verified in
        ``tests/test_pallas_rollout.py::test_fused_eval_replays_exactly``.
        """
        from hex_gym_env_tpu.ops import masked as masked_ops
        from hex_gym_env_tpu.ops import pallas_rollout as pr

        topo, cfg = self.topo, self.cfg
        pol = self.fused_pol
        E = cfg.eval_episodes
        n = topo.n
        serve = serve_indices(E, bank.size)
        k_seat, k_first, k_play = jax.random.split(key, 3)
        seat = eval_seats(cfg, k_seat, E, fixed_seats)

        state = hex_env.initial_state(topo, E)
        # opponent opens where it holds seat 0: served member's empty-board
        # logits (one batched pass; this path is MLP-only — CNN evals take
        # the scan branch, whose opponent pass routes through the grouped
        # stacked forward), masked draw, active-masked step
        empty_b = jnp.zeros((1, n, n), jnp.float32)
        members = jax.vmap(lambda v: self.model.apply(v, empty_b)[0][0])(bank.params)
        logits0 = members[serve]  # (E, A)
        legal0 = jnp.ones((E, topo.num_cells), bool)
        a0 = masked_ops.sample(k_first, logits0, legal0)
        state, _ = self.step(topo, state, a0, active=seat == 1)

        packed = pol.pack_agent(params["params"])
        stacked = pol.stack_bank(bank)
        P1 = stacked.n_members
        P1c = stacked.tensors[-1].shape[0]
        ft = jnp.zeros((P1c, topo.num_cells), jnp.float32)  # unused in eval

        n_pairs = topo.num_cells // 2 + 2
        out = pr.fused_rollout(
            topo, pol, packed, stacked.tensors, ft, state,
            dict(
                n_members=P1,
                agent_seat=seat,
                use_best=jnp.zeros((E,), bool),
                opp_idx=serve.astype(jnp.int32),
            ),
            k_play, n_pairs, cfg.best_prob, False,
            interpret=pol.interpret,
            bank_bf16=getattr(cfg, "rollout_bank_bf16", False),
            eval_mode=True,
        )
        return out.flts[..., pr.F_REWARD].sum(axis=0)

    def play_vs_pool_sharded(
        self,
        params: Any,
        bank: OpponentBank,
        key: jax.Array,
        episode_ids: jnp.ndarray,
        seats_all: jnp.ndarray,
    ) -> jnp.ndarray:
        """Evaluate an explicit slice of the episode grid (sharded eval).

        Unlike ``play_vs_pool`` (one batched draw per move for the whole
        batch — whose PRNG stream depends on the batch width), every random
        draw here is keyed per GLOBAL episode id (``fold_in(key, eid)``
        then per move pair), so a mesh of D devices each evaluating its
        slice produces bitwise the same per-episode rewards at every D
        (``tests/test_sharding.py``).  ``seats_all`` is the full (gathered)
        rollout seat vector for the ``fixed_random`` inheritance rule;
        ``sample_board`` runs are served by the replicated evaluator
        instead (board sampling has no per-episode key derivation).

        Under ``symmetric_eval`` the global grid has 2E rows: episode
        ``e`` plays member ``min(e mod E, P-1)`` with the agent in seat
        ``e // E`` — the caller averages halves after gathering.
        """
        topo, cfg = self.topo, self.cfg
        if cfg.sample_board:
            raise NotImplementedError(
                "sharded eval does not support sample_board; use the "
                "replicated evaluator"
            )
        P = bank.size
        E = cfg.eval_episodes
        El = episode_ids.shape[0]
        k_seat, k_first, k_play = jax.random.split(key, 3)
        if getattr(cfg, "symmetric_eval", False):
            member = jnp.minimum(episode_ids % E, P - 1)
            seat = (episode_ids // E).astype(jnp.int32)
        else:
            member = jnp.minimum(episode_ids, P - 1)
            if cfg.seat_mode == "fixed_random":
                seat = seats_all[episode_ids % seats_all.shape[0]].astype(jnp.int32)
            else:
                seat = jax.vmap(
                    lambda e: jax.random.bernoulli(jax.random.fold_in(k_seat, e), 0.5)
                )(episode_ids).astype(jnp.int32)
        served = jax.tree.map(lambda x: x[member], bank.params)

        ep_first = jax.vmap(lambda e: jax.random.fold_in(k_first, e))(episode_ids)
        ep_play = jax.vmap(lambda e: jax.random.fold_in(k_play, e))(episode_ids)

        def sample_rows(keys, logits, legal):
            return jax.vmap(
                lambda k, l, m: jax.random.categorical(k, masked.mask_logits(l, m))
            )(keys, logits, legal).astype(jnp.int32)

        state = hex_env.initial_state(topo, El)

        def opponent_move(st, keys, active):
            logits = self._opponent_logits(served, st)
            legal = hex_env.legal_mask(topo, st)
            a = sample_rows(keys, logits, legal)
            return self.step(topo, st, a, active=active)

        state, _ = opponent_move(state, ep_first, active=seat == 1)

        def body(carry, s):
            st, total = carry
            obs = hex_env.observe(topo, st).astype(jnp.float32)
            legal = hex_env.legal_mask(topo, st)
            logits, _ = self.model.apply(params, obs)
            a = masked.mode(logits, legal)  # deterministic agent
            st, rew1 = self.step(topo, st, a)
            keys = jax.vmap(lambda k: jax.random.fold_in(k, s))(ep_play)
            st, rew2 = opponent_move(st, keys, active=~st.done)
            seat_col = seat[:, None]
            got = (
                jnp.take_along_axis(rew1, seat_col, axis=1)[:, 0]
                + jnp.take_along_axis(rew2, seat_col, axis=1)[:, 0]
            )
            return (st, total + got), None

        n_pairs = topo.num_cells // 2 + 2
        (state, total), _ = jax.lax.scan(
            body, (state, jnp.zeros((El,), jnp.float32)), jnp.arange(n_pairs)
        )
        return total

    def apply_pool_update(
        self,
        params: Any,
        bank: OpponentBank,
        rewards: jnp.ndarray,
        k_slot: jax.Array,
    ) -> tuple[OpponentBank, EvalResult]:
        """The pool-mutation tail of an eval pass (score, replace, promote
        of the agent's ``params``) given the (E,) episode rewards — shared
        by the replicated and the sharded evaluators so the protocol lives
        in exactly one place."""
        mean_reward = rewards.mean()
        # Opt-in pool-freeze mitigation (default 0.0 = reference-exact):
        # the reference's replacement rule self-terminates once pool scores
        # saturate near the score formula's own ceiling — measured at the
        # 71M budget every seed's pool froze by ~18M steps and the agent
        # then degraded farming it (RESULTS.md r4b).  A small per-eval
        # decay of the recorded scores keeps the replacement bar moving so
        # the curriculum never freezes; strict presets leave it at 0.
        # Only the pool scores decay — NOT ``best_score`` (changed in r5,
        # ADVICE r4): decaying the promotion bar made best-snapshot
        # selection non-monotone (a later, weaker agent could overwrite
        # ``best_params``), corrupting the ``best_*`` deliverable the
        # sweeps compare.  The replacement bar is ``min(scores)``, so the
        # anti-freeze mechanism is unaffected.
        decay = getattr(self.cfg, "pool_score_decay", 0.0)
        if decay:
            bank = bank.replace(scores=bank.scores * (1.0 - decay))
        score = mean_reward * jnp.exp(jnp.mean(bank.scores) - 1.0)
        do_replace = (mean_reward > 0) & (score > jnp.min(bank.scores))
        bank = replace_member(bank, k_slot, params, score, do_replace)
        return bank, EvalResult(
            rewards=rewards,
            mean_reward=mean_reward,
            score=score,
            replaced=do_replace,
            best_score=bank.best_score,
        )

    def eval_and_update(
        self,
        params: Any,
        bank: OpponentBank,
        key: jax.Array,
        fixed_seats: jnp.ndarray | None = None,
    ) -> tuple[OpponentBank, EvalResult]:
        k_play, k_slot = jax.random.split(key)
        rewards = self.play_vs_pool(params, bank, k_play, fixed_seats=fixed_seats)
        return self.apply_pool_update(params, bank, rewards, k_slot)

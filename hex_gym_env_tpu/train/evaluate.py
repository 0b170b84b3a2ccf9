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

Here all P episodes run as one vmapped batch: env ``i`` plays pool member
``i``, a fixed-length scan of N^2+1 agent/opponent move pairs covers any
game (finished games freeze), and the pool mutation happens on device.
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
    rewards: jnp.ndarray  # (P,) final agent reward vs each pool member
    mean_reward: jnp.ndarray  # ()
    score: jnp.ndarray  # ()
    replaced: jnp.ndarray  # () bool — pool member replaced this eval
    best_score: jnp.ndarray  # () after potential promotion


class Evaluator:
    def __init__(self, topo: HexTopology, model, cfg: SelfplayConfig):
        self.topo = topo
        self.model = model
        self.cfg = cfg
        from hex_gym_env_tpu.train.rollout import resolve_step_impl

        self.step = resolve_step_impl(cfg.env_step_impl)

    def _opponent_logits(self, bank: OpponentBank, state) -> jnp.ndarray:
        """Member i plays env i: paired vmap over (snapshot_i, obs_i)."""
        obs_f = hex_env.observe(self.topo, state).astype(jnp.float32)
        return jax.vmap(
            lambda v, o: self.model.apply(v, o[None])[0][0]
        )(bank.params, obs_f)

    def play_vs_pool(self, params: Any, bank: OpponentBank, key: jax.Array) -> jnp.ndarray:
        """One episode vs each pool member; returns (P,) final agent rewards."""
        topo, cfg = self.topo, self.cfg
        P = bank.size
        k_board, k_seat, k_first, k_play = jax.random.split(key, 4)

        if cfg.sample_board:
            boards = random_board.sample_boards(k_board, topo, P)
            state = hex_env.state_from_boards(topo, boards)
        else:
            state = hex_env.initial_state(topo, P)
        seat = jax.random.bernoulli(k_seat, 0.5, (P,)).astype(jnp.int32)

        def opponent_move(st, k, active):
            logits = self._opponent_logits(bank, st)
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
            body, (state, jnp.zeros((P,), jnp.float32)), jax.random.split(k_play, n_pairs)
        )
        return total

    def eval_and_update(
        self, params: Any, bank: OpponentBank, key: jax.Array
    ) -> tuple[OpponentBank, EvalResult]:
        k_play, k_slot = jax.random.split(key)
        rewards = self.play_vs_pool(params, bank, k_play)
        mean_reward = rewards.mean()
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

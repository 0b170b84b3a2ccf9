"""Selfplay PPO training state and the fused train step.

One ``train_step`` = one SB3 ``collect_rollouts`` + ``train`` cycle
(``MaskablePPO.learn`` internals, driven by ``scripts/selfplay_new.py:56-62``
in the reference), entirely on device: rollout scan, GAE, and the
epochs x minibatches PPO sweep compile into a single XLA program.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from hex_gym_env_tpu.core.topology import HexTopology, get_topology
from hex_gym_env_tpu.models import make_policy
from hex_gym_env_tpu.train import gae, ppo
from hex_gym_env_tpu.train.bank import OpponentBank, init_bank
from hex_gym_env_tpu.train.evaluate import Evaluator, EvalResult
from hex_gym_env_tpu.train.rollout import RolloutCarry, SelfplayRunner
from hex_gym_env_tpu.utils.config import TrainConfig


@struct.dataclass
class TrainState:
    params: Any  # full flax variables dict: {"params": ..., [other collections]}
    opt_state: Any
    bank: OpponentBank
    carry: RolloutCarry
    key: jax.Array
    # () int32 — completed PPO iterations.  Transitions are derived host-side
    # as iteration * n_steps * n_envs (exact, unbounded Python int): a raw
    # int32 transition counter would silently wrap past 2.147B transitions,
    # which the 1e9-default presets already approach.
    iteration: jnp.ndarray
    # () int32 — agent transitions since the last eval; gates ``eval_freq``
    # inside fused supersteps (bounded by eval_freq + one iteration).
    eval_accum: jnp.ndarray


class TrainMetrics(NamedTuple):
    mean_episode_reward: jnp.ndarray  # mean agent reward over finished episodes
    episodes_finished: jnp.ndarray
    ppo: ppo.PPOStats


class SelfplayPPO:
    """Builder wiring topology, model, runner, learner, and evaluator."""

    def __init__(self, cfg: TrainConfig):
        cfg.ppo.validate(cfg.selfplay.n_envs)
        self.cfg = cfg
        self.topo: HexTopology = get_topology(cfg.selfplay.board_size)
        self.model = make_policy(cfg.selfplay.policy, self.topo.num_cells)
        self.runner = SelfplayRunner(self.topo, self.model, cfg.selfplay)
        self.optimizer = ppo.make_optimizer(cfg.ppo)
        self.update_fn = self._resolve_update_fn()
        self.evaluator = Evaluator(self.topo, self.model, cfg.selfplay)
        self.gae_fn = self._resolve_gae_fn()

    def _resolve_gae_fn(self):
        """Same recurrence, same operation order, two lowerings: the lax
        reverse scan, or one fully-unrolled VMEM-resident Pallas kernel on
        TPU for short rollouts (``ops/pallas_gae.py``) — the scan's
        per-iteration launch overhead is ~2.7 ms at the headline shape.
        Backend selection follows ``cfg.ppo.gae_impl`` ("auto"/"lax"/
        "pallas"); hardware equality of the two lowerings is to MXU
        tolerance only, so configs that pin the lax paths (strict SB3
        presets) pin "lax" here too rather than escape incidentally."""
        import jax as _jax

        from hex_gym_env_tpu.ops import pallas_gae

        impl = self.cfg.ppo.gae_impl
        if impl not in ("auto", "lax", "pallas"):
            raise ValueError(
                f"gae_impl must be one of 'auto'/'lax'/'pallas', got {impl!r}"
            )
        if impl == "lax":
            return gae.compute_gae
        if impl == "pallas":
            if self.cfg.ppo.n_steps > pallas_gae.MAX_UNROLL_STEPS:
                raise ValueError(
                    f"gae_impl='pallas' unrolls all steps in VMEM; n_steps "
                    f"{self.cfg.ppo.n_steps} > {pallas_gae.MAX_UNROLL_STEPS}"
                )
            return pallas_gae.compute_gae
        if (
            _jax.default_backend() == "tpu"
            and self.cfg.ppo.n_steps <= pallas_gae.MAX_UNROLL_STEPS
        ):
            return pallas_gae.compute_gae
        return gae.compute_gae

    def _resolve_update_fn(self):
        """Pick the epoch-sweep backend (see ``PPOConfig.update_impl``)."""
        import jax as _jax

        from hex_gym_env_tpu.ops import pallas_ppo

        impl = self.cfg.ppo.update_impl
        if impl not in ("auto", "lax", "pallas", "pallas-fast"):
            raise ValueError(
                "update_impl must be one of 'auto'/'lax'/'pallas'/"
                f"'pallas-fast', got {impl!r}"
            )
        if impl in ("pallas", "pallas-fast") and not pallas_ppo.supported_policy(
            self.model
        ):
            raise ValueError(
                f"update_impl={impl!r} requires a plain equal-tower MLP policy "
                "(CNN/BatchNorm models use the lax sweep)"
            )
        if impl == "pallas-fast":
            # shuffle-once + prefetched block order: the throughput sweep
            # whose minibatch index stream deviates from SB3 (documented in
            # ops/pallas_ppo.fast_schedule); never selected by "auto"
            return pallas_ppo.make_pallas_fast_update_fn(
                self.model, self.cfg.ppo,
                interpret=_jax.default_backend() != "tpu",
            )
        use_pallas = impl == "pallas" or (
            impl == "auto"
            and pallas_ppo.supported_policy(self.model, self.cfg.ppo)
            and _jax.default_backend() == "tpu"
        )
        if use_pallas:
            return pallas_ppo.make_pallas_update_fn(self.model, self.cfg.ppo)
        return ppo.make_update_fn(self.model, self.cfg.ppo, self.optimizer)

    @property
    def per_iter(self) -> int:
        """Agent transitions per PPO iteration."""
        return self.cfg.ppo.n_steps * self.cfg.selfplay.n_envs

    def timesteps(self, state: TrainState) -> int:
        """Exact agent-transition count (unbounded host int)."""
        return int(state.iteration) * self.per_iter

    # -- state ------------------------------------------------------------

    def init_state(self, key: jax.Array) -> TrainState:
        k_model, k_carry, key = jax.random.split(key, 3)
        n = self.topo.n
        variables = self.model.init(k_model, jnp.zeros((1, n, n), jnp.float32))
        bank = init_bank(variables, self.cfg.selfplay.buffer_size)
        carry = self.runner.init_carry(bank, k_carry)
        return TrainState(
            params=variables,
            opt_state=self.optimizer.init(variables["params"]),
            bank=bank,
            carry=carry,
            key=key,
            iteration=jnp.zeros((), jnp.int32),
            eval_accum=jnp.zeros((), jnp.int32),
        )

    def seed_bank(
        self,
        state: TrainState,
        seeds: list,
        score: float = 0.5,
        as_best: bool = True,
        pin_best: bool = True,
    ) -> TrainState:
        """Plant parameter snapshots into the opponent pool before training.

        The reference's legacy outer loop seeds selfplay from loaded
        checkpoints (``scripts/selfplay.py:35,59-92`` builds the opponent
        history starting from ``MaskablePPO.load``); this is the equivalent
        for the pool protocol.  ``seeds`` is a list of full variables dicts
        (see ``models/loading.py``).  Seeded slots get ``score`` (high scores
        make them sticky, since replacement targets argmin-score slots).
        ``as_best`` installs ``seeds[0]`` as the designated best opponent;
        ``pin_best`` sets ``best_score = score`` so promotion requires
        actually out-scoring the seed.

        ``score`` must stay below 1.0 when ``pin_best`` is set: eval scores
        are ``mean_reward * exp(mean(pool_scores) - 1) < 1`` whenever any
        pool slot scores < 1 (``EvaluationCallback.py:35``), so a pinned
        best at 1.0 could never be out-promoted and every ``best_*``
        artifact would forever be the seed's parameters, not the agent's.
        """
        bank = state.bank
        if len(seeds) > bank.size:
            raise ValueError(
                f"{len(seeds)} seed snapshots exceed the opponent pool size "
                f"{bank.size} (JAX would silently drop the out-of-bounds "
                "writes)"
            )
        if pin_best and score >= 1.0:
            raise ValueError(
                f"pin_best with score={score} >= 1.0 makes best-promotion "
                "unreachable (eval score < 1 whenever any pool slot scores "
                "< 1); use score < 1.0 or pin_best=False"
            )
        stack = bank.params
        scores = bank.scores
        for i, sd in enumerate(seeds):
            stack = jax.tree.map(lambda s, n: s.at[i].set(n), stack, sd)
            scores = scores.at[i].set(score)
        best = seeds[0] if as_best else bank.best_params
        best_score = jnp.asarray(score if (as_best and pin_best) else bank.best_score, jnp.float32)
        return state.replace(
            bank=OpponentBank(
                params=stack, scores=scores, best_params=best, best_score=best_score
            )
        )

    # -- one fused PPO iteration ------------------------------------------

    def train_step(self, state: TrainState) -> tuple[TrainState, TrainMetrics]:
        cfg = self.cfg
        key, k_roll, k_update = jax.random.split(state.key, 3)

        carry, tr, last_values = self.runner.run(
            state.params, state.bank, state.carry, k_roll, cfg.ppo.n_steps
        )
        advantages, returns = self.gae_fn(
            tr.reward, tr.value, tr.done, last_values,
            cfg.ppo.gamma, cfg.ppo.gae_lambda,
        )

        def flat(x):
            return x.reshape((-1,) + x.shape[2:])

        batch = ppo.PPOBatch(
            obs=flat(tr.obs),
            legal=flat(tr.legal),
            action=flat(tr.action),
            log_prob_old=flat(tr.log_prob),
            value_old=flat(tr.value),
            advantage=flat(advantages),
            ret=flat(returns),
        )
        params, opt_state, stats = self.update_fn(
            state.params, state.opt_state, batch, k_update
        )

        finished = tr.done.sum()
        # episode reward == the terminal transition's reward (0 elsewhere)
        mean_ep_reward = jnp.where(
            finished > 0,
            jnp.sum(jnp.where(tr.done, tr.reward, 0.0)) / finished.astype(jnp.float32),
            0.0,
        )
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            bank=state.bank,
            carry=carry,
            key=key,
            iteration=state.iteration + 1,
            eval_accum=state.eval_accum + self.per_iter,
        )
        return new_state, TrainMetrics(mean_ep_reward, finished, stats)

    def train_steps(self, state: TrainState, k: int):
        """``k`` full PPO iterations fused into one XLA program.

        Over a tunneled/remote device the per-dispatch host round trip
        (~tens of ms) dwarfs the device time of one iteration at small
        rollout sizes; scanning ``k`` iterations amortizes it.  Returns the
        final state plus per-iteration metrics stacked on a leading (k,)
        axis, so logging fidelity is unchanged.
        """

        def body(s, _):
            s, m = self.train_step(s)
            return s, m

        return jax.lax.scan(body, state, None, length=k)

    def train_and_eval_steps(self, state: TrainState, k: int):
        """``k`` iterations of (PPO update + cadenced eval/pool-update), one
        program.

        The fused TPU-native training driver: the host pays ONE dispatch per
        ``k`` iterations, while the eval pass and opponent-pool mutation (the
        reference's ``SelfPlayCallback``) run on device gated by the same
        ``eval_freq`` cadence the unfused ``Trainer.fit`` loop uses — eval
        fires when the transitions accumulated since the last eval reach
        ``eval_freq`` (``EvaluationCallback.py:30``'s ``n_calls % eval_freq``
        in our iteration-quantized form), so toggling ``iters_per_dispatch``
        does not change the pool curriculum or the RNG stream.  Returns the
        final state plus per-iteration (TrainMetrics, EvalResult, did_eval)
        stacked on a leading (k,) axis; ``EvalResult`` rows where
        ``did_eval`` is False are zeros.
        """
        eval_freq = self.cfg.selfplay.eval_freq

        def body(s, _):
            s, m = self.train_step(s)
            do_eval = s.eval_accum >= eval_freq

            def run_eval(st: TrainState):
                return self.eval_step(st)

            def skip_eval(st: TrainState):
                zero = jnp.zeros((), jnp.float32)
                dummy = EvalResult(
                    rewards=jnp.zeros(
                        (self.cfg.selfplay.eval_episodes,), jnp.float32
                    ),
                    mean_reward=zero,
                    score=zero,
                    replaced=jnp.zeros((), bool),
                    best_score=st.bank.best_score,
                )
                return st, dummy

            s, r = jax.lax.cond(do_eval, run_eval, skip_eval, s)
            return s, (m, r, do_eval)

        return jax.lax.scan(body, state, None, length=k)

    # -- eval + pool update ------------------------------------------------

    def eval_step(self, state: TrainState):
        key, k_eval = jax.random.split(state.key)
        bank, result = self.evaluator.eval_and_update(
            state.params, state.bank, k_eval,
            fixed_seats=state.carry.agent_seat,
        )
        return (
            state.replace(bank=bank, key=key, eval_accum=jnp.zeros((), jnp.int32)),
            result,
        )

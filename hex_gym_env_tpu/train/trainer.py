"""Host-side training orchestration.

The only Python between device programs: the loop that alternates jitted
``train_step`` / ``eval_step`` calls, fetches a handful of scalars per
iteration for logging, and writes checkpoints.  Equivalent role to
``model.learn(..., callback=[SelfPlayCallback(...)])`` in the reference
(``scripts/selfplay_new.py:58-62``), with the eval cadence measured in
agent transitions exactly like the callback's ``n_calls % eval_freq``.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from hex_gym_env_tpu.train.selfplay import SelfplayPPO, TrainState
from hex_gym_env_tpu.utils import checkpoint as ckpt_lib
from hex_gym_env_tpu.utils.config import TrainConfig
from hex_gym_env_tpu.utils.metrics import MetricsLogger


class Trainer:
    def __init__(self, cfg: TrainConfig, logger: Optional[MetricsLogger] = None):
        self.cfg = cfg
        self.algo = SelfplayPPO(cfg)
        self.logger = logger or MetricsLogger(cfg.log_dir, cfg.model_name)
        # Donating the train state halves HBM churn; the old state is never
        # reused (timesteps are tracked host-side deterministically).
        self.train_step = jax.jit(self.algo.train_step, donate_argnums=0)
        self.eval_step = jax.jit(self.algo.eval_step)
        self.train_span = jax.jit(
            self.algo.train_and_eval_steps, static_argnums=1, donate_argnums=0
        )
        self._ckpt: Optional[ckpt_lib.CheckpointManager] = None

    def _ckpt_mgr(self) -> ckpt_lib.CheckpointManager:
        if self._ckpt is None:
            self._ckpt = ckpt_lib.CheckpointManager(
                os.path.join(self.cfg.model_dir, self.cfg.model_name)
            )
        return self._ckpt

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        seed = self.cfg.selfplay.seed if seed is None else seed
        return self.algo.init_state(jax.random.key(seed))

    def resume(self) -> TrainState:
        template = jax.eval_shape(lambda: self.init_state())
        return self._ckpt_mgr().restore(template)

    def fit(self, state: Optional[TrainState] = None) -> TrainState:
        if self.cfg.iters_per_dispatch > 1:
            return self.fit_fused(state)
        cfg = self.cfg
        state = self.init_state() if state is None else state
        per_iter = cfg.ppo.n_steps * cfg.selfplay.n_envs
        t_start = time.perf_counter()
        steps_start = int(state.timesteps)  # one blocking fetch, at startup

        # ``state.timesteps`` advances by exactly ``per_iter`` per train_step,
        # so eval/checkpoint cadence and the loop condition run on a host-side
        # counter — no device round trip on the control path.  Metric scalars
        # are fetched one iteration late: the fetch of iteration k overlaps
        # the device executing iteration k+1 (over the tunnel, a blocking
        # per-iteration round trip would otherwise serialize with compute).
        steps = steps_start
        next_eval = cfg.selfplay.eval_freq
        next_ckpt = cfg.checkpoint_every
        pending = None  # (steps_k, metrics_k, eval_result_k or None)
        t_prev = time.perf_counter()

        def flush_pending(pending, t_prev):
            p_steps, p_metrics, p_result = pending
            m = jax.device_get(p_metrics)  # waits for iteration k only
            now = time.perf_counter()
            scalars = {
                "rollout/ep_rew_mean": float(m.mean_episode_reward),
                "rollout/episodes": float(m.episodes_finished),
                "train/policy_loss": float(m.ppo.policy_loss),
                "train/value_loss": float(m.ppo.value_loss),
                "train/entropy": float(m.ppo.entropy),
                "train/approx_kl": float(m.ppo.approx_kl),
                "train/clip_frac": float(m.ppo.clip_frac),
                "perf/steps_per_s": per_iter / max(now - t_prev, 1e-9),
            }
            if p_result is not None:
                r = jax.device_get(p_result)
                scalars.update(
                    {
                        "eval/mean_reward": float(r.mean_reward),
                        "eval/score": float(r.score),
                        "eval/replaced": float(r.replaced),
                        "eval/best_score": float(r.best_score),
                    }
                )
            self.logger.log(p_steps, scalars)
            return now

        while steps < cfg.total_timesteps:
            state, metrics = self.train_step(state)  # async dispatch
            steps += per_iter

            result = None
            if steps >= next_eval:
                state, result = self.eval_step(state)
                next_eval = steps + cfg.selfplay.eval_freq

            if pending is not None:
                t_prev = flush_pending(pending, t_prev)
            pending = (steps, metrics, result)

            if steps >= next_ckpt:
                self._ckpt_mgr().save(steps, state)
                # the reference also snapshots its best pool model every
                # checkpoint period (EvaluationCallback.py:53-55)
                best_score = float(state.bank.best_score)
                ckpt_lib.save_params(
                    os.path.join(
                        cfg.model_dir, cfg.model_name, f"best_{best_score:.4f}"
                    ),
                    state.bank.best_params,
                )
                next_ckpt = steps + cfg.checkpoint_every

        if pending is not None:
            flush_pending(pending, t_prev)
        wall = time.perf_counter() - t_start
        total = int(state.timesteps) - steps_start
        self.logger.log(
            int(state.timesteps),
            {"perf/total_steps_per_s": total / max(wall, 1e-9)},
        )
        return state

    def fit_fused(self, state: Optional[TrainState] = None) -> TrainState:
        """Superstep driver: ``iters_per_dispatch`` fused (train + eval)
        iterations per host dispatch (``SelfplayPPO.train_and_eval_steps``).

        Per-iteration logging fidelity is preserved — every iteration's train
        metrics AND eval/pool-update result come back stacked and are written
        as individual records.  Checkpoints land between supersteps.
        """
        cfg = self.cfg
        state = self.init_state() if state is None else state
        per_iter = cfg.ppo.n_steps * cfg.selfplay.n_envs
        k = cfg.iters_per_dispatch
        t_start = time.perf_counter()
        steps_start = int(state.timesteps)

        steps = steps_start
        next_ckpt = cfg.checkpoint_every
        pending = None  # (first_step, metrics(k,...), results(k,...))
        t_prev = time.perf_counter()

        def flush_pending(pending, t_prev):
            first_step, p_metrics, p_results = pending
            m, r = jax.device_get((p_metrics, p_results))
            now = time.perf_counter()
            dt_iter = max(now - t_prev, 1e-9) / k
            for i in range(k):
                self.logger.log(
                    first_step + i * per_iter,
                    {
                        "rollout/ep_rew_mean": float(m.mean_episode_reward[i]),
                        "rollout/episodes": float(m.episodes_finished[i]),
                        "train/policy_loss": float(m.ppo.policy_loss[i]),
                        "train/value_loss": float(m.ppo.value_loss[i]),
                        "train/entropy": float(m.ppo.entropy[i]),
                        "train/approx_kl": float(m.ppo.approx_kl[i]),
                        "train/clip_frac": float(m.ppo.clip_frac[i]),
                        "perf/steps_per_s": per_iter / dt_iter,
                        "eval/mean_reward": float(r.mean_reward[i]),
                        "eval/score": float(r.score[i]),
                        "eval/replaced": float(r.replaced[i]),
                        "eval/best_score": float(r.best_score[i]),
                    },
                )
            return now

        while steps < cfg.total_timesteps:
            state, (metrics, results) = self.train_span(state, k)
            steps += k * per_iter

            if pending is not None:
                t_prev = flush_pending(pending, t_prev)
            pending = (steps - (k - 1) * per_iter, metrics, results)

            if steps >= next_ckpt:
                self._ckpt_mgr().save(steps, state)
                best_score = float(state.bank.best_score)
                ckpt_lib.save_params(
                    os.path.join(
                        cfg.model_dir, cfg.model_name, f"best_{best_score:.4f}"
                    ),
                    state.bank.best_params,
                )
                next_ckpt = steps + cfg.checkpoint_every

        if pending is not None:
            flush_pending(pending, t_prev)
        wall = time.perf_counter() - t_start
        total = int(state.timesteps) - steps_start
        self.logger.log(
            int(state.timesteps),
            {"perf/total_steps_per_s": total / max(wall, 1e-9)},
        )
        return state

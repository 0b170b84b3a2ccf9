"""Host-side training orchestration.

The only Python between device programs: the loop that alternates jitted
``train_step`` / ``eval_step`` calls, fetches a handful of scalars per
iteration for logging, and writes checkpoints.  Equivalent role to
``model.learn(..., callback=[SelfPlayCallback(...)])`` in the reference
(``scripts/selfplay_new.py:58-62``), with the eval cadence measured in
agent transitions exactly like the callback's ``n_calls % eval_freq``.

Both drivers share one eval-cadence rule — eval fires when the transitions
accumulated since the last eval reach ``eval_freq`` — so ``fit`` (host-gated)
and ``fit_fused`` (device-gated via ``lax.cond``) produce the identical pool
curriculum and RNG stream for the same config.

Multi-process runs (``jax.distributed``): every process executes the same
device programs (SPMD), but checkpoints and metrics are written by process 0
only (``bootstrap.is_main_process``).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from hex_gym_env_tpu.parallel.bootstrap import is_main_process
from hex_gym_env_tpu.train.selfplay import SelfplayPPO, TrainState
from hex_gym_env_tpu.utils import checkpoint as ckpt_lib
from hex_gym_env_tpu.utils.config import TrainConfig
from hex_gym_env_tpu.utils.metrics import MetricsLogger


class Trainer:
    def __init__(
        self,
        cfg: TrainConfig,
        logger: Optional[MetricsLogger] = None,
        algo: Optional[SelfplayPPO] = None,
    ):
        """``algo`` swaps in a different training program (e.g.
        ``parallel.DistributedSelfplayPPO``) — the Trainer jit-wraps whatever
        it is given, so distributed runs are first-class rather than a
        post-construction field overwrite."""
        self.cfg = cfg
        self.algo = SelfplayPPO(cfg) if algo is None else algo
        if logger is not None:
            self.logger = logger
        elif is_main_process():
            self.logger = MetricsLogger(cfg.log_dir, cfg.model_name)
        else:
            self.logger = _NullLogger()
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
        shardings = (
            self.algo.state_shardings(template)
            if hasattr(self.algo, "state_shardings")
            else None
        )
        return self._ckpt_mgr().restore(template, shardings=shardings)

    def _save_checkpoint(self, steps: int, state: TrainState, best0: float) -> None:
        """Checkpoint + best-snapshot save.

        Orbax saves are COLLECTIVE in multi-process runs — every process
        must call them (each host writes its local shards, process 0 writes
        the metadata); gating on ``is_main_process`` would deadlock a
        multi-host save of the sharded rollout carry.  Only the host-side
        metric/log stream is process-0-only (``_NullLogger``).

        The reference also snapshots its best pool model every checkpoint
        period (``EvaluationCallback.py:53-55``); we additionally skip the
        ``best_*`` param dump while ``best_score`` has not moved since fit
        started — before the first promotion the "best" is either the
        zero-params random policy or a seeded opponent checkpoint, neither
        of which is this run's agent.
        """
        self._ckpt_mgr().save(steps, state)
        best_score = float(state.bank.best_score)
        if best_score > best0:
            ckpt_lib.save_params(
                os.path.join(
                    self.cfg.model_dir, self.cfg.model_name, f"best_{best_score:.4f}"
                ),
                state.bank.best_params,
            )

    def fit(self, state: Optional[TrainState] = None) -> TrainState:
        if self.cfg.iters_per_dispatch > 1:
            return self.fit_fused(state)
        cfg = self.cfg
        state = self.init_state() if state is None else state
        per_iter = self.algo.per_iter
        t_start = time.perf_counter()
        steps_start = self.algo.timesteps(state)  # one blocking fetch, at startup
        best0 = float(state.bank.best_score)

        # ``state.iteration`` advances by exactly one per train_step, so
        # eval/checkpoint cadence and the loop condition run on host-side
        # counters — no device round trip on the control path.  Metric scalars
        # are fetched one iteration late: the fetch of iteration k overlaps
        # the device executing iteration k+1 (over the tunnel, a blocking
        # per-iteration round trip would otherwise serialize with compute).
        steps = steps_start
        eval_accum = int(state.eval_accum)  # mirrors the device accumulator
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
            eval_accum += per_iter

            result = None
            if eval_accum >= cfg.selfplay.eval_freq:
                state, result = self.eval_step(state)
                eval_accum = 0

            if pending is not None:
                t_prev = flush_pending(pending, t_prev)
            pending = (steps, metrics, result)

            if steps >= next_ckpt:
                self._save_checkpoint(steps, state, best0)
                next_ckpt = steps + cfg.checkpoint_every

        if pending is not None:
            flush_pending(pending, t_prev)
        wall = time.perf_counter() - t_start
        total = self.algo.timesteps(state) - steps_start
        self.logger.log(
            self.algo.timesteps(state),
            {"perf/total_steps_per_s": total / max(wall, 1e-9)},
        )
        return state

    def fit_fused(self, state: Optional[TrainState] = None) -> TrainState:
        """Superstep driver: ``iters_per_dispatch`` fused (train + cadenced
        eval) iterations per host dispatch (``SelfplayPPO.train_and_eval_steps``).

        Per-iteration logging fidelity is preserved — every iteration's train
        metrics come back stacked and are written as individual records, and
        eval scalars are written for exactly the iterations where the
        device-side ``eval_freq`` gate fired.  Checkpoints land between
        supersteps.
        """
        cfg = self.cfg
        state = self.init_state() if state is None else state
        per_iter = self.algo.per_iter
        k = cfg.iters_per_dispatch
        t_start = time.perf_counter()
        steps_start = self.algo.timesteps(state)
        best0 = float(state.bank.best_score)

        steps = steps_start
        next_ckpt = cfg.checkpoint_every
        pending = None  # (first_step, metrics(k,...), results(k,...), did_eval(k,))
        t_prev = time.perf_counter()

        def flush_pending(pending, t_prev):
            first_step, p_metrics, p_results, p_did = pending
            m, r, did = jax.device_get((p_metrics, p_results, p_did))
            now = time.perf_counter()
            dt_iter = max(now - t_prev, 1e-9) / k
            for i in range(k):
                scalars = {
                    "rollout/ep_rew_mean": float(m.mean_episode_reward[i]),
                    "rollout/episodes": float(m.episodes_finished[i]),
                    "train/policy_loss": float(m.ppo.policy_loss[i]),
                    "train/value_loss": float(m.ppo.value_loss[i]),
                    "train/entropy": float(m.ppo.entropy[i]),
                    "train/approx_kl": float(m.ppo.approx_kl[i]),
                    "train/clip_frac": float(m.ppo.clip_frac[i]),
                    "perf/steps_per_s": per_iter / dt_iter,
                }
                if bool(did[i]):
                    scalars.update(
                        {
                            "eval/mean_reward": float(r.mean_reward[i]),
                            "eval/score": float(r.score[i]),
                            "eval/replaced": float(r.replaced[i]),
                            "eval/best_score": float(r.best_score[i]),
                        }
                    )
                self.logger.log(first_step + i * per_iter, scalars)
            return now

        while steps < cfg.total_timesteps:
            state, (metrics, results, did_eval) = self.train_span(state, k)
            steps += k * per_iter

            if pending is not None:
                t_prev = flush_pending(pending, t_prev)
            pending = (steps - (k - 1) * per_iter, metrics, results, did_eval)

            if steps >= next_ckpt:
                self._save_checkpoint(steps, state, best0)
                next_ckpt = steps + cfg.checkpoint_every

        if pending is not None:
            flush_pending(pending, t_prev)
        wall = time.perf_counter() - t_start
        total = self.algo.timesteps(state) - steps_start
        self.logger.log(
            self.algo.timesteps(state),
            {"perf/total_steps_per_s": total / max(wall, 1e-9)},
        )
        return state


class _NullLogger:
    """Metrics sink for non-main processes in multi-process runs."""

    def log(self, step: int, scalars: dict) -> None:
        pass

    def close(self) -> None:
        pass

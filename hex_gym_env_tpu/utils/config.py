"""Typed configuration for training runs.

Replaces the reference's per-experiment hardcoded constants
(``scripts/experiments/*.py``, e.g. ``7x7_MLP-default_lr-0.0003.py:28-29``)
and its vestigial ``config.ini`` with one frozen dataclass; the preset grid
lives in ``hex_gym_env_tpu/experiments/``.

PPO defaults are the SB3 values decoded from the shipped checkpoint
``models/6x6_buffer_64_10.zip`` (see BASELINE.md): n_steps 2048, minibatch
64, 10 epochs, gamma 0.99, GAE lambda 0.95, clip 0.2, ent_coef 0,
vf_coef 0.5, grad-clip 0.5, lr 3e-4, Adam eps 1e-5.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    learning_rate: float = 3e-4
    n_steps: int = 2048  # agent transitions per env per rollout
    minibatch_size: int = 64
    n_epochs: int = 10
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_range: float = 0.2
    ent_coef: float = 0.0
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    adam_eps: float = 1e-5
    # epoch-sweep backend: "auto" runs the single-kernel fused Pallas sweep
    # (ops/pallas_ppo.py) on TPU for plain MLP policies — the sweep is
    # otherwise hundreds of sequential tiny-GEMM grad steps and dominates
    # iteration latency; "lax" keeps the composable optax path everywhere.
    # "pallas-fast" additionally replaces SB3's per-epoch full reshuffle
    # with the shuffle-once schedule (ops/pallas_ppo.fast_schedule) — the
    # fastest sweep, with a documented minibatch-stream deviation; "auto"
    # never selects it, and strict SB3-parity presets pin "lax".
    update_impl: str = "auto"  # "auto" | "lax" | "pallas" | "pallas-fast"
    # GAE backend: "auto" takes the fully-unrolled Pallas kernel
    # (ops/pallas_gae.py) on TPU when n_steps fits its unroll bound, else
    # the lax reverse scan; "lax"/"pallas" pin it explicitly.  Strict
    # SB3-parity presets pin "lax" so their recurrence lowering matches the
    # CI-verified scan bit-for-bit rather than to hardware tolerance.
    gae_impl: str = "auto"  # "auto" | "lax" | "pallas"

    def validate(self, n_envs: int) -> None:
        total = self.n_steps * n_envs
        if total % self.minibatch_size:
            raise ValueError(
                f"rollout size {total} (= n_steps {self.n_steps} x n_envs "
                f"{n_envs}) must be divisible by minibatch_size "
                f"{self.minibatch_size}"
            )


@dataclasses.dataclass(frozen=True)
class SelfplayConfig:
    """Selfplay environment + opponent-pool protocol knobs.

    ``seat_mode`` quirk note: the reference randomizes the agent's seat only
    on the *first* reset — ``SelfplayWrapper.py:72-73`` guards on
    ``agent_player_num == None`` and then assigns the attribute, so the seat
    stays fixed for the rest of the run.  ``per_episode`` (default here) is
    the symmetric generalization; ``fixed_random`` reproduces the reference.
    """

    board_size: int = 7
    n_envs: int = 64
    buffer_size: int = 20  # opponent pool size (reference default, SelfplayWrapper.py:39)
    best_prob: float = 0.8  # P(opponent = best) per episode (SelfplayWrapper.py:97-104)
    sample_board: bool = False
    seat_mode: str = "per_episode"  # "per_episode" | "fixed_random"
    policy: str = "MLP-default"
    # env-step backend inside rollout/eval scans: "auto" picks the fused
    # Pallas kernel on TPU and the composable lax path elsewhere
    env_step_impl: str = "auto"  # "auto" | "lax" | "pallas"
    # policy-pass backend inside the rollout scan: "auto" fuses the agent
    # forward+sample and the opponent-bank forward+sample each into one
    # Pallas launch on TPU (MLP policies; see ops/pallas_policy.py).  The
    # sampling distribution is identical; the PRNG stream differs from lax.
    policy_impl: str = "auto"  # "auto" | "lax" | "pallas"
    # rollout backend: "scan" drives one lax.scan whose body launches the
    # per-step kernels above (~5 Pallas launches + XLA glue per transition);
    # "fused" compiles the ENTIRE T-step selfplay rollout into one Pallas
    # kernel (ops/pallas_rollout.py) — env state, agent params, and the
    # stacked opponent bank stay VMEM-resident across all T steps and the
    # transitions stream out to HBM.  "auto" picks "fused" on TPU when the
    # model/pool fit (plain MLP, no sample_board), else "scan".  Sampling
    # distributions are identical; the PRNG stream differs from lax (same
    # caveat as policy_impl).
    rollout_impl: str = "auto"  # "auto" | "scan" | "fused"
    # Opt-in: run opponent-bank forwards in bfloat16 (weights + matmul
    # LHS; f32 accumulation) — the fused MLP rollout kernel's bank
    # matmuls AND the scan path's CNN grouped-bank forward honor it.
    # Opponent logits shift by ~1e-2 relative, a documented
    # distributional deviation of the (stochastic) opponent play only —
    # agent forward, value, and log-prob stay exact f32.  The MLP scan
    # path ignores it; strict presets pin the scan path and f32.
    rollout_bank_bf16: bool = False
    # Opt-in symmetric eval criterion (False = reference-exact): play every
    # pool member from BOTH seats (2E episodes per eval) and record the
    # per-member mean, so the score/replacement/promotion formulas demand
    # two-seat competence.  The reference's one-episode-per-member eval can
    # promote a seat specialist as "best" (measured: a 5x5 strict seed's
    # promoted snapshot won 118-vs-1 by seat, RESULTS.md r4); strict
    # presets MUST leave this False.
    symmetric_eval: bool = False
    # CNN opponent-bank strategy inside the rollout scan: "dense" runs
    # every pool member on every board (P x B conv FLOPs per opponent ply
    # — the r4 path, 44-46k transitions/s at 9x9/pool-31); "gathered"
    # computes only each env's ASSIGNED opponent (fold BN, gather the conv
    # stack per env, one feature_group_count=B conv per layer; the dense
    # tower stays weight-dense + row-select).  "auto" = gathered (selected
    # rows match dense to f32-reassociation tolerance; MLP banks ignore
    # this — their dense pass is a single tiny batched GEMM).
    cnn_bank_mode: str = "auto"  # "auto" | "dense" | "gathered"
    # Opt-in pool-freeze mitigation (0.0 = reference-exact protocol): decay
    # every pool member's recorded score by this fraction per eval pass, so
    # the replacement bar keeps moving (best_score does NOT decay — the
    # promotion bar stays monotone so the best_* deliverable can't be
    # overwritten by a weaker later agent; ADVICE r4).  The reference's
    # rule self-terminates once scores saturate (measured: at 71M budgets
    # every seed's pool froze by ~18M steps and the final agent degraded —
    # RESULTS.md r4b).  A small value (e.g. 1e-3) keeps the curriculum
    # churning; strict presets MUST leave it 0.
    pool_score_decay: float = 0.0
    eval_freq: int = 1000  # agent transitions between evals (per reference script)
    # eval episodes per eval pass; None -> buffer_size (what every reference
    # experiment sets).  Values past buffer_size replay the last pool member
    # (SelfplayWrapper.py:92-96 serve-then-repeat-last semantics).
    n_eval_episodes: int | None = None
    seed: int = 0

    @property
    def eval_episodes(self) -> int:
        return self.buffer_size if self.n_eval_episodes is None else self.n_eval_episodes


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    ppo: PPOConfig = dataclasses.field(default_factory=PPOConfig)
    selfplay: SelfplayConfig = dataclasses.field(default_factory=SelfplayConfig)
    total_timesteps: int = 1_000_000
    model_name: str = "hex_tpu"
    checkpoint_every: int = 1_000_000  # agent transitions (EvaluationCallback.py:53-55)
    log_dir: str = "log"
    model_dir: str = "models"
    # >1 fuses this many (train + eval/pool-update) iterations into ONE
    # device program per host dispatch (Trainer "superstep") — the remedy for
    # dispatch-latency-bound training over a tunneled chip.  1 keeps the
    # reference's host-driven cadence: eval only every ``eval_freq``
    # transitions.
    iters_per_dispatch: int = 1

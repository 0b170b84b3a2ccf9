"""Training entry point.

Replaces the reference's per-experiment launcher files
(``scripts/selfplay_new.py``, ``scripts/experiments/*.py`` — hyperparameters
as edited constants, no argparse) with one CLI over the preset registry:

    python scripts/train.py --experiment 7x7_MLP-default_lr-0.0003 \
        --total-timesteps 2000000 [--n-envs 512] [--multichip] [--resume]

``--multichip`` runs the SPMD data-parallel trainer over every visible
device; otherwise single-device.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")  # repo-root execution


def _enable_compile_cache() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    _enable_compile_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--experiment", default="7x7_MLP-default_lr-0.0003")
    ap.add_argument("--list", action="store_true", help="list presets and exit")
    ap.add_argument("--total-timesteps", type=int, default=None)
    ap.add_argument("--n-envs", type=int, default=None)
    ap.add_argument("--n-steps", type=int, default=None)
    ap.add_argument("--minibatch-size", type=int, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--learning-rate", type=float, default=None)
    ap.add_argument("--eval-freq", type=int, default=None)
    ap.add_argument("--checkpoint-every", type=int, default=None)
    ap.add_argument("--iters-per-dispatch", type=int, default=None,
                    help=">1 fuses this many train+eval iterations per "
                         "device dispatch (fast over a tunneled chip)")
    ap.add_argument("--env-step-impl", choices=["auto", "lax", "pallas"],
                    default=None)
    ap.add_argument("--update-impl",
                    choices=["auto", "lax", "pallas", "pallas-fast"],
                    default=None,
                    help="PPO epoch-sweep backend; auto fuses the sweep into "
                         "one Pallas kernel on TPU for MLP policies; "
                         "pallas-fast additionally swaps SB3's per-epoch "
                         "reshuffle for the shuffle-once schedule (fastest; "
                         "documented minibatch-stream deviation)")
    ap.add_argument("--rollout-impl", choices=["auto", "scan", "fused"],
                    default=None,
                    help="rollout backend; fused runs ALL T steps in one "
                         "Pallas kernel (auto picks it on TPU when the "
                         "pallas policy path resolves)")
    ap.add_argument("--symmetric-eval", action="store_true",
                    help="opt-in: eval every pool member from BOTH seats "
                         "(2E episodes, per-member mean) so promotion "
                         "requires two-seat competence; reference-exact "
                         "protocol off")
    ap.add_argument("--cnn-bank-mode", choices=["auto", "dense", "gathered"],
                    default=None,
                    help="CNN opponent-bank strategy: gathered computes only "
                         "each env's assigned opponent (default via auto); "
                         "dense pins the r4 all-members pass")
    ap.add_argument("--pool-score-decay", type=float, default=None,
                    help="decay pool scores by this fraction per eval pass "
                         "(opt-in mitigation for the measured pool-freeze "
                         "pathology; 0 = reference-exact rule)")
    ap.add_argument("--bank-bf16", action="store_true",
                    help="bf16 opponent-bank matmuls inside the fused "
                         "rollout (stochastic-opponent logits deviation)")
    ap.add_argument("--policy-impl", choices=["auto", "lax", "pallas"],
                    default=None,
                    help="rollout policy-pass backend; auto uses the fused "
                         "Pallas kernels with the TPU hardware PRNG (same "
                         "sampling distribution as lax, DIFFERENT stream — "
                         "pin 'lax' for cross-backend bit-reproducibility)")
    ap.add_argument("--model-name", default=None,
                    help="override the run/checkpoint directory name")
    ap.add_argument("--seed-pool", default=None,
                    help="comma list of policy specs (random|sb3:zip|orbax:dir) "
                         "planted into the opponent pool; the first becomes "
                         "the designated best opponent")
    ap.add_argument("--multichip", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from hex_gym_env_tpu.experiments import get_config, list_experiments

    if args.list:
        print("\n".join(list_experiments()))
        return

    overrides = {}
    if args.total_timesteps is not None:
        overrides["total_timesteps"] = args.total_timesteps
    if args.n_envs is not None:
        overrides["n_envs"] = args.n_envs
    if args.n_steps is not None:
        overrides["n_steps"] = args.n_steps
    if args.minibatch_size is not None:
        overrides["minibatch_size"] = args.minibatch_size
    if args.seed is not None:
        overrides["seed"] = args.seed
    if args.learning_rate is not None:
        overrides["learning_rate"] = args.learning_rate
    if args.eval_freq is not None:
        overrides["eval_freq"] = args.eval_freq
    if args.checkpoint_every is not None:
        overrides["checkpoint_every"] = args.checkpoint_every
    if args.iters_per_dispatch is not None:
        overrides["iters_per_dispatch"] = args.iters_per_dispatch
    if args.env_step_impl is not None:
        overrides["env_step_impl"] = args.env_step_impl
    if args.update_impl is not None:
        overrides["update_impl"] = args.update_impl
    if args.policy_impl is not None:
        overrides["policy_impl"] = args.policy_impl
    if args.rollout_impl is not None:
        overrides["rollout_impl"] = args.rollout_impl
    if args.bank_bf16:
        overrides["rollout_bank_bf16"] = True
    if args.pool_score_decay is not None:
        overrides["pool_score_decay"] = args.pool_score_decay
    if args.cnn_bank_mode is not None:
        overrides["cnn_bank_mode"] = args.cnn_bank_mode
    if args.symmetric_eval:
        overrides["symmetric_eval"] = True
    if args.model_name is not None:
        overrides["model_name"] = args.model_name
    cfg = get_config(args.experiment, **overrides)

    import jax

    from hex_gym_env_tpu.train.trainer import Trainer

    if args.multichip:
        from hex_gym_env_tpu.parallel import DistributedSelfplayPPO, make_mesh

        mesh = make_mesh()
        trainer = Trainer(cfg, algo=DistributedSelfplayPPO(cfg, mesh))
        state = (
            trainer.algo.shard_state(trainer.resume())
            if args.resume
            else trainer.algo.init_sharded_state(jax.random.key(cfg.selfplay.seed))
        )
    else:
        trainer = Trainer(cfg)
        state = trainer.resume() if args.resume else None

    # Loud reproducibility note (auto impl selection is backend-dependent):
    # a fixed-seed run is only bit-reproducible across backends when the
    # rollout sampling stream is pinned (policy_impl="lax"); on TPU "auto"
    # selects the hardware-PRNG Pallas kernels (same distribution,
    # different stream).  Strict presets pin "lax".
    if cfg.selfplay.policy_impl == "auto" and jax.default_backend() == "tpu":
        print("note: policy_impl=auto -> Pallas hardware-PRNG sampling on "
              "TPU (distribution-identical to lax, different stream; pin "
              "--policy-impl lax for cross-backend bit-reproducibility)")

    if args.seed_pool:
        from hex_gym_env_tpu.models.loading import load_policy_params

        seeds = [
            load_policy_params(s, cfg.selfplay.board_size, trainer.algo.model)[1]
            for s in args.seed_pool.split(",")
        ]
        if state is None:
            state = trainer.init_state()
        state = trainer.algo.seed_bank(state, seeds)
        if args.multichip:
            state = trainer.algo.shard_state(state)

    print(f"training {cfg.model_name}: {cfg.total_timesteps} transitions "
          f"on {len(jax.devices())} device(s)")
    trainer.fit(state)


if __name__ == "__main__":
    main()

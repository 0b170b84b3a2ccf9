"""Per-stage timing breakdown of one PPO training iteration.

The VERDICT r2 throughput task needs cost attribution, not a single number:
this script times each stage of ``SelfplayPPO.train_step`` in isolation on
the current backend (real TPU chip under axon; CPU elsewhere) —

  rollout        the T-step selfplay rollout (``SelfplayRunner.run``)
  gae            advantage/return computation on the rollout output
  update         the epochs x minibatches PPO sweep (resolved impl)
  update_lax     the composable lax/optax sweep (for comparison)
  perm_gather    the host-side permutation + minibatch gather prologue of
                 the fused Pallas sweep (its non-kernel cost)
  train_step     the whole fused iteration (one XLA program)
  superstep      ``train_steps(k)`` amortized per iteration

Prints one JSON object per stage plus a summary line with the implied
sustained transitions/s.  Shapes default to the round-1 throughput bar
(6x6, 512 envs, n_steps 128, minibatch 1024, pool 64).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

sys.path.insert(0, ".")  # repo-root execution

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from hex_gym_env_tpu.train import gae as gae_mod
from hex_gym_env_tpu.train import ppo
from hex_gym_env_tpu.train.selfplay import SelfplayPPO
from hex_gym_env_tpu.utils.config import PPOConfig, SelfplayConfig, TrainConfig
from hex_gym_env_tpu.utils.profiling import time_fn


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--board-size", type=int, default=6)
    p.add_argument("--n-envs", type=int, default=512)
    p.add_argument("--n-steps", type=int, default=128)
    p.add_argument("--minibatch-size", type=int, default=1024)
    p.add_argument("--buffer-size", type=int, default=64)
    p.add_argument("--n-epochs", type=int, default=10)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--superstep", type=int, default=8)
    p.add_argument("--policy", default="MLP-default",
                   help="policy family (MLP-default/MLP-deep/MLP-wide-deep/CNN)")
    p.add_argument("--policy-impl", default="auto")
    p.add_argument("--update-impl", default="auto")
    p.add_argument("--rollout-impl", default="auto")
    p.add_argument("--cnn-bank-mode", default="auto",
                   choices=["auto", "dense", "gathered"],
                   help="CNN opponent-bank strategy (gathered = only each "
                        "env's assigned member; dense = r4 all-members)")
    p.add_argument("--bank-bf16", action="store_true",
                   help="bf16 opponent-bank forwards (the rollout_bank_bf16 "
                        "deviation; halves bank weight/activation traffic)")
    p.add_argument("--cpu", action="store_true",
                   help="force CPU (the axon plugin ignores JAX_PLATFORMS)")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg = TrainConfig(
        ppo=PPOConfig(
            n_steps=args.n_steps,
            minibatch_size=args.minibatch_size,
            n_epochs=args.n_epochs,
            update_impl=args.update_impl,
        ),
        selfplay=SelfplayConfig(
            board_size=args.board_size,
            n_envs=args.n_envs,
            buffer_size=args.buffer_size,
            policy=args.policy,
            policy_impl=args.policy_impl,
            rollout_impl=args.rollout_impl,
            rollout_bank_bf16=args.bank_bf16,
            cnn_bank_mode=args.cnn_bank_mode,
            eval_freq=10**9,
        ),
    )
    algo = SelfplayPPO(cfg)
    state = algo.init_state(jax.random.key(0))
    per_iter = args.n_steps * args.n_envs
    report: dict[str, float] = {}

    # --- analytic stage models for the roofline attribution ---------------
    # (executed-GEMM counts; see utils/roofline.py.  The fused rollout's
    # lane-padded bank GEMMs are counted at their semantic width — padding
    # lanes are not credited, so its pct_peak_flops is a slight UNDER-count.)
    from hex_gym_env_tpu.utils import roofline

    from hex_gym_env_tpu.core.topology import get_topology

    N = args.board_size
    F = A = N * N
    H = algo.model.pi_layers[0]
    NL = len(algo.model.pi_layers)
    P1 = args.buffer_size + 1
    L = get_topology(N).lanes
    if args.policy == "CNN":
        fwd = roofline.cnn_forward_flops(F, n_actions=A)
        if args.cnn_bank_mode != "dense":
            # gathered pass: one conv stack per env + weight-dense towers
            opp = roofline.cnn_gathered_bank_flops(
                F, args.buffer_size, n_actions=A
            )
        else:
            opp = P1 * fwd  # dense bank runs the full extractor per member
    else:
        fwd = roofline.mlp_forward_flops(F, H, NL, A)
        opp = P1 * roofline.policy_tower_flops(F, H, NL, A)
    # Byte models exist only for the backends they describe: the fused
    # rollout kernel's output streams and the Pallas sweep's input streams.
    # When the run resolves to the scan rollout or the lax sweep (CNN, CPU,
    # pinned impls), pass None so the row omits HBM fields instead of
    # reporting an under-counted stream model (r4 self-review finding).
    fused_rollout = algo.runner.fused_pol is not None
    from hex_gym_env_tpu.ops import pallas_ppo as _pppo

    fused_update = (
        jax.default_backend() == "tpu"
        and cfg.ppo.update_impl in ("auto", "pallas", "pallas-fast")
        and _pppo.supported_policy(algo.model, cfg.ppo)
    )
    roll_bytes = per_iter * 3 * L * 4 if fused_rollout else None
    upd_bytes = per_iter * args.n_epochs * (F + 16) if fused_update else None
    step_bytes = (
        roll_bytes + upd_bytes
        if (fused_rollout and fused_update)
        else None
    )
    stage_models = {
        # per-transition: one agent fwd + one dense bank pass (opponent
        # reply); fused-kernel bytes: three (B, L) f32 output streams per
        # step (state itself stays VMEM-resident)
        "rollout": (per_iter * (fwd + opp), roll_bytes),
        # 10-epoch sweep: fwd+bwd ~ 3x fwd GEMM flops per sample visit;
        # Pallas-sweep bytes: int8 obs stream + packed float scalars
        "update": (per_iter * args.n_epochs * 3 * fwd, upd_bytes),
        # the lax sweep materializes gathered f32 obs + legal + scalars
        "update_lax": (
            per_iter * args.n_epochs * 3 * fwd,
            per_iter * args.n_epochs * (F * 4 + A + 16 + 4 * 4) * 2,
        ),
        # GAE recurrence: ~5 flops/transition over 4 f32 arrays r+w
        "gae": (per_iter * 5, per_iter * 4 * 4 * 2),
        "perm_gather": (0.0, per_iter * (args.n_epochs * (F + 16) + 3 * 12)),
        "train_step": (
            per_iter * (fwd + opp + args.n_epochs * 3 * fwd),
            step_bytes,
        ),
    }
    stage_models["superstep_per_iter"] = stage_models["train_step"]
    roofline_rows = []

    def record(name: str, seconds: float, denom: int = per_iter) -> None:
        report[name] = seconds
        out = {
            "stage": name,
            "ms": round(seconds * 1e3, 3),
            "transitions_per_s": round(denom / seconds),
        }
        if name in stage_models:
            fl, by = stage_models[name]  # per-iteration totals
            row = roofline.stage(name, seconds, denom, fl, by)
            roofline_rows.append(row)
            out |= {
                k: row[k]
                for k in (
                    "achieved_tflops", "pct_peak_flops", "achieved_gbps",
                    "pct_peak_hbm", "hbm_model", "bound",
                )
                if k in row
            }
        print(json.dumps(out), flush=True)

    # --- null dispatch: the tunnel/dispatch round-trip constant -----------
    # every per-stage figure below includes one of these; subtract it for
    # device time (the superstep figure amortizes it away instead)
    null = jax.jit(lambda x: x + 1.0)
    t = time_fn(null, jnp.zeros((8, 128), jnp.float32), repeats=args.repeats)
    record("null_dispatch", t["seconds_per_call"])

    # --- rollout ---------------------------------------------------------
    run = jax.jit(
        lambda p_, b, c, k: algo.runner.run(p_, b, c, k, args.n_steps)
    )
    t = time_fn(
        run, state.params, state.bank, state.carry, jax.random.key(1),
        repeats=args.repeats,
    )
    record("rollout", t["seconds_per_call"])

    carry, tr, last_values = run(
        state.params, state.bank, state.carry, jax.random.key(1)
    )

    # --- GAE -------------------------------------------------------------
    gfn = jax.jit(
        lambda r, v, d, lv: gae_mod.compute_gae(
            r, v, d, lv, cfg.ppo.gamma, cfg.ppo.gae_lambda
        )
    )
    t = time_fn(gfn, tr.reward, tr.value, tr.done, last_values, repeats=args.repeats)
    record("gae", t["seconds_per_call"])

    advantages, returns = gfn(tr.reward, tr.value, tr.done, last_values)

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

    # --- update (resolved impl) -----------------------------------------
    upd = jax.jit(algo.update_fn)
    t = time_fn(
        upd, state.params, state.opt_state, batch, jax.random.key(2),
        repeats=args.repeats,
    )
    record("update", t["seconds_per_call"])

    # --- update (lax, for comparison) ------------------------------------
    lax_upd = jax.jit(ppo.make_update_fn(algo.model, cfg.ppo, algo.optimizer))
    t = time_fn(
        lax_upd, state.params, state.opt_state, batch, jax.random.key(2),
        repeats=args.repeats,
    )
    record("update_lax", t["seconds_per_call"])

    # --- permutation + gather prologue of the fused sweep -----------------
    n = batch.action.shape[0]
    mbs = cfg.ppo.minibatch_size
    n_mb = n // mbs
    G = cfg.ppo.n_epochs * n_mb

    @jax.jit
    def prologue(b: ppo.PPOBatch, key):
        # mirrors make_pallas_update_fn's prologue: one batched 2-key sort
        # for every epoch's permutation + exactly TWO row gathers (int8
        # boards, packed (n, 4) float scalars); legal is derived in-kernel
        perms = ppo.epoch_permutations(key, n, cfg.ppo.n_epochs)
        idx = perms[:, : n_mb * mbs].reshape(G, mbs)
        flt = jnp.stack(
            [b.action.astype(jnp.float32), b.log_prob_old, b.advantage, b.ret],
            axis=1,
        )
        return b.obs.reshape(n, -1).astype(jnp.int8)[idx], flt[idx]

    t = time_fn(prologue, batch, jax.random.key(2), repeats=args.repeats)
    record("perm_gather", t["seconds_per_call"])

    # --- whole iteration --------------------------------------------------
    step = jax.jit(algo.train_step)
    t = time_fn(step, state, repeats=args.repeats)
    record("train_step", t["seconds_per_call"])

    # --- fused superstep --------------------------------------------------
    k = args.superstep
    multi = jax.jit(lambda s: algo.train_steps(s, k))
    t = time_fn(multi, state, repeats=max(1, args.repeats // 2))
    record("superstep_per_iter", t["seconds_per_call"] / k, denom=per_iter)

    print(
        json.dumps(
            {
                "summary": {
                    "backend": jax.default_backend(),
                    "shape": dataclasses.asdict(cfg.ppo)
                    | {"n_envs": args.n_envs, "buffer_size": args.buffer_size,
                       "board_size": args.board_size},
                    "per_iter_transitions": per_iter,
                    "sustained_transitions_per_s": round(
                        per_iter / (report["superstep_per_iter"])
                    ),
                    "model_flops_per_transition": round(
                        stage_models["train_step"][0] / per_iter
                    ),
                    "sustained_mfu_pct": round(
                        100.0
                        * stage_models["train_step"][0]
                        / report["superstep_per_iter"]
                        / roofline.PEAK_FLOPS_BF16,
                        3,
                    ),
                    "roofline": roofline_rows,
                }
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

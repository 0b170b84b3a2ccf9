"""Extract agent parameters from a TrainState checkpoint.

Training checkpoints (``models/<run>/<step>/``) hold the full resumable
TrainState (params, optimizer, opponent bank, env carry, PRNG).  This tool
pulls out just the agent's policy parameters as a standalone orbax params
snapshot consumable by ``scripts/match.py`` / ``tournament.py`` /
``play_gui.py`` via ``orbax:<path>``:

    python scripts/export_agent.py --experiment 7x7_MLP-default_lr-0.0003 \
        --model-name 7x7_vs_ref --n-envs 512 --n-steps 128 \
        --minibatch-size 1024 [--step N] [--out models/7x7_vs_ref/agent]

Pass the same shape-affecting overrides the training run used (n_envs /
n_steps / minibatch) so the restore template matches the checkpoint.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--experiment", required=True)
    ap.add_argument("--model-name", default=None)
    ap.add_argument("--n-envs", type=int, default=None)
    ap.add_argument("--n-steps", type=int, default=None)
    ap.add_argument("--minibatch-size", type=int, default=None)
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest)")
    ap.add_argument("--out", default=None,
                    help="output dir (default: <run dir>/agent_<step>)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from hex_gym_env_tpu.experiments import get_config
    from hex_gym_env_tpu.train.trainer import Trainer
    from hex_gym_env_tpu.utils.checkpoint import save_params

    overrides = {
        k: v
        for k, v in {
            "model_name": args.model_name,
            "n_envs": args.n_envs,
            "n_steps": args.n_steps,
            "minibatch_size": args.minibatch_size,
        }.items()
        if v is not None
    }
    cfg = get_config(args.experiment, **overrides)
    trainer = Trainer(cfg)
    mgr = trainer._ckpt_mgr()
    import jax

    template = jax.eval_shape(lambda: trainer.init_state())
    state = mgr.restore(template, step=args.step)
    step = trainer.algo.timesteps(state)
    out = args.out or os.path.join(
        cfg.model_dir, cfg.model_name, f"agent_{step}"
    )
    save_params(out, state.params)
    print(f"exported agent params at step {step} -> {out}")


if __name__ == "__main__":
    main()

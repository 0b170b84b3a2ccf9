"""Worker process for tests/test_multiprocess.py.

Usage: python tests/mp_worker.py <process_id> <num_processes> <coordinator>
       <outdir>

Each worker owns 4 virtual CPU devices; together they form one 8-device
global mesh.  Exercises the full multi-host stack SURVEY §4(4) prescribed:
``jax.distributed`` bootstrap (``parallel/bootstrap.py``), cross-process
collectives (gloo), ``DistributedSelfplayPPO`` training through the real
``Trainer.fit`` loop, collective orbax checkpointing, and process-0-only
metric logging.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coordinator, outdir = sys.argv[3], sys.argv[4]

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from hex_gym_env_tpu.parallel import bootstrap

    assert bootstrap.init_distributed(
        coordinator_address=coordinator, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc
    assert bootstrap.is_main_process() == (pid == 0)

    import numpy as np

    from hex_gym_env_tpu.parallel import DistributedSelfplayPPO, make_mesh
    from hex_gym_env_tpu.train.trainer import Trainer, _NullLogger
    from hex_gym_env_tpu.utils.config import PPOConfig, SelfplayConfig, TrainConfig

    cfg = TrainConfig(
        ppo=PPOConfig(n_steps=4, minibatch_size=8, n_epochs=1, update_impl="lax"),
        selfplay=SelfplayConfig(
            board_size=4, n_envs=16, buffer_size=2, eval_freq=64,
            n_eval_episodes=2,
        ),
        total_timesteps=2 * 4 * 16,  # 2 iterations
        model_name="mp_test",
        checkpoint_every=64,
        log_dir=os.path.join(outdir, "log"),
        model_dir=os.path.join(outdir, "models"),
    )
    mesh = make_mesh()  # spans both processes' devices
    trainer = Trainer(cfg)
    trainer.algo = DistributedSelfplayPPO(cfg, mesh)
    trainer.train_step = jax.jit(trainer.algo.train_step, donate_argnums=0)
    trainer.eval_step = jax.jit(trainer.algo.eval_step)

    print(f"WORKER {pid}: null_logger={isinstance(trainer.logger, _NullLogger)}",
          flush=True)

    state = trainer.algo.init_sharded_state(jax.random.key(0))
    state = trainer.fit(state)
    assert trainer.algo.timesteps(state) == cfg.total_timesteps

    # fully-replicated parameters are addressable on every process
    flat = np.concatenate(
        [np.asarray(l).ravel() for l in jax.tree.leaves(state.params)]
    )
    assert np.isfinite(flat).all()
    np.save(os.path.join(outdir, f"params_{pid}.npy"), flat)

    assert trainer._ckpt_mgr().latest_step() == cfg.total_timesteps
    print(f"WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()

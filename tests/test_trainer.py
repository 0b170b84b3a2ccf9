"""Trainer loop: pipelined logging, eval/checkpoint cadence, resume."""

import dataclasses
import json
import os

import numpy as np

from hex_gym_env_tpu.train.trainer import Trainer
from hex_gym_env_tpu.utils.config import PPOConfig, SelfplayConfig, TrainConfig
from hex_gym_env_tpu.utils.metrics import MetricsLogger


def _cfg(tmp_path, total=4 * 16 * 8, ckpt_every=10_000_000):
    return TrainConfig(
        ppo=PPOConfig(n_steps=8, minibatch_size=32, n_epochs=2),
        selfplay=SelfplayConfig(
            board_size=4, n_envs=16, buffer_size=2, eval_freq=256,
            n_eval_episodes=2,
        ),
        total_timesteps=total,
        model_name="trainer_test",
        checkpoint_every=ckpt_every,
        log_dir=str(tmp_path / "log"),
        model_dir=str(tmp_path / "models"),
    )


def _records(cfg):
    path = os.path.join(cfg.log_dir, cfg.model_name, "metrics.jsonl")
    return [json.loads(l) for l in open(path)]


def test_fit_logs_every_iteration_and_evals_on_cadence(tmp_path):
    cfg = _cfg(tmp_path)  # 4 iterations of 128 transitions
    trainer = Trainer(cfg)
    state = trainer.fit()
    assert trainer.algo.timesteps(state) == cfg.total_timesteps

    recs = _records(cfg)
    train_recs = [r for r in recs if "rollout/ep_rew_mean" in r]
    # one record per train iteration, in step order, none dropped by pipelining
    assert [r["step"] for r in train_recs] == [128, 256, 384, 512]
    # eval cadence: eval_freq=256 -> evals land at steps 256 and 512
    eval_steps = [r["step"] for r in train_recs if "eval/mean_reward" in r]
    assert eval_steps == [256, 512]
    for r in train_recs:
        assert np.isfinite(r["train/policy_loss"])


def test_fit_fused_supersteps_log_every_iteration(tmp_path):
    # 2 supersteps x 3 iterations x 128 transitions
    cfg = dataclasses.replace(
        _cfg(tmp_path, total=6 * 16 * 8), model_name="fused_test",
        iters_per_dispatch=3,
    )
    trainer = Trainer(cfg)
    state = trainer.fit()
    assert trainer.algo.timesteps(state) == cfg.total_timesteps

    recs = _records(cfg)
    train_recs = [r for r in recs if "rollout/ep_rew_mean" in r]
    assert [r["step"] for r in train_recs] == [128 * i for i in range(1, 7)]
    # fused mode honors eval_freq (256 transitions = every 2nd iteration),
    # exactly like the unfused driver — NOT once per iteration
    eval_steps = [r["step"] for r in train_recs if "eval/mean_reward" in r]
    assert eval_steps == [256, 512, 768]
    for r in train_recs:
        if "eval/score" in r:
            assert np.isfinite(r["eval/score"])


def test_fused_and_unfused_eval_cadence_identical(tmp_path):
    """VERDICT item 3: toggling iters_per_dispatch must not change the pool
    curriculum — both drivers eval at the same transition counts."""
    total = 6 * 16 * 8
    cadences = {}
    for name, k in (("cad_unfused", 1), ("cad_fused", 3)):
        cfg = dataclasses.replace(
            _cfg(tmp_path, total=total), model_name=name, iters_per_dispatch=k
        )
        Trainer(cfg).fit()
        recs = _records(cfg)
        cadences[name] = [r["step"] for r in recs if "eval/mean_reward" in r]
    assert cadences["cad_unfused"] == cadences["cad_fused"] == [256, 512, 768]


def test_fit_checkpoints_and_resumes(tmp_path):
    cfg = _cfg(tmp_path, total=2 * 16 * 8, ckpt_every=128)
    trainer = Trainer(cfg)
    trainer.fit()
    ckpt_dir = os.path.join(cfg.model_dir, cfg.model_name)
    assert os.path.isdir(ckpt_dir)
    assert trainer._ckpt_mgr().latest_step() == 256

    # resume continues from the checkpointed timestep counter
    cfg2 = dataclasses.replace(cfg, total_timesteps=3 * 16 * 8)
    trainer2 = Trainer(
        cfg2, logger=MetricsLogger(cfg2.log_dir, cfg2.model_name)
    )
    state = trainer2.resume()
    assert trainer2.algo.timesteps(state) == 256
    state = trainer2.fit(state)
    assert trainer2.algo.timesteps(state) == 384


def test_timesteps_counter_supports_past_int32(tmp_path):
    """VERDICT item 6: transition counts beyond 2**31 must not wrap.

    The device counter counts iterations (int32, one per PPO update); the
    transition count is derived host-side as an unbounded Python int.
    """
    cfg = _cfg(tmp_path)
    trainer = Trainer(cfg)
    state = trainer.init_state()
    # pretend 40M iterations have run: 40e6 * 128 = 5.12e9 transitions > 2**31
    state = state.replace(iteration=state.iteration + 40_000_000)
    got = trainer.algo.timesteps(state)
    assert got == 40_000_000 * 128
    assert got > 2**31


def test_distributed_trainer_e2e_fit_ckpt_resume(tmp_path):
    """First-class distributed Trainer (VERDICT r2 item 5): Trainer.fit over
    DistributedSelfplayPPO on the 8-device mesh with iters_per_dispatch=3 —
    eval cadence, checkpointing, and resume all through the public
    constructor (no field overwrites)."""
    import jax

    from hex_gym_env_tpu.parallel import DistributedSelfplayPPO, make_mesh

    cfg = _cfg(tmp_path, total=6 * 16 * 8, ckpt_every=384)
    # 64 envs over 8 devices -> 8 local envs x 8 steps = 64 per-device rows
    cfg = dataclasses.replace(
        cfg,
        model_name="dist_trainer_test", iters_per_dispatch=3,
        selfplay=dataclasses.replace(cfg.selfplay, n_envs=64, eval_freq=1024),
        total_timesteps=6 * 64 * 8, checkpoint_every=3 * 64 * 8,
    )
    mesh = make_mesh()
    trainer = Trainer(cfg, algo=DistributedSelfplayPPO(cfg, mesh))
    assert trainer.algo is not None and trainer.algo.mesh is mesh
    state = trainer.algo.init_sharded_state(jax.random.key(cfg.selfplay.seed))
    state = trainer.fit(state)
    assert trainer.algo.timesteps(state) == cfg.total_timesteps

    # eval cadence identical to the single-device drivers (eval_freq = 2
    # iterations of 512)
    recs = _records(cfg)
    train_recs = [r for r in recs if "rollout/ep_rew_mean" in r]
    assert [r["step"] for r in train_recs] == [512 * i for i in range(1, 7)]
    eval_steps = [r["step"] for r in train_recs if "eval/mean_reward" in r]
    assert eval_steps == [1024, 2048, 3072]

    # checkpoint landed between supersteps; resume restores and continues
    assert trainer._ckpt_mgr().latest_step() == 3072
    cfg2 = dataclasses.replace(cfg, total_timesteps=9 * 64 * 8)
    trainer2 = Trainer(
        cfg2,
        logger=MetricsLogger(cfg2.log_dir, cfg2.model_name),
        algo=DistributedSelfplayPPO(cfg2, mesh),
    )
    state2 = trainer2.algo.shard_state(trainer2.resume())
    assert trainer2.algo.timesteps(state2) == 3072
    state2 = trainer2.fit(state2)
    assert trainer2.algo.timesteps(state2) == 9 * 64 * 8
    # params stay bitwise-replicated across the mesh after resume + fit
    leaf = jax.tree.leaves(state2.params)[0]
    vals = [np.asarray(s.data) for s in leaf.addressable_shards]
    for v in vals[1:]:
        np.testing.assert_array_equal(v, vals[0])

"""Utils tests: experiments registry, metrics writers, checkpoint roundtrip."""

import json
import os
import struct as pystruct

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hex_gym_env_tpu.experiments import REGISTRY, get_config, list_experiments
from hex_gym_env_tpu.utils.metrics import MetricsLogger, _masked_crc
from hex_gym_env_tpu.utils import checkpoint as ckpt


def test_experiment_registry_complete():
    names = list_experiments()
    # 9 size-titled + 4 families x 3 lrs + 4 buffer_exp + 3 strict-SB3 = 28
    assert len(names) == 28
    for n in (5, 6, 7):
        strict = get_config(f"{n}x{n}_strict_sb3")
        assert strict.ppo.n_steps == 2048 and strict.ppo.minibatch_size == 64
        assert strict.selfplay.seat_mode == "fixed_random"
        assert strict.ppo.update_impl == "lax"
    for n in range(3, 12):
        assert f"{n}x{n}_MLP-default_lr-0.0003" in names
    cfg = get_config("7x7_buffer_256")
    assert cfg.selfplay.buffer_size == 256
    assert cfg.selfplay.eval_freq == 8000
    assert cfg.total_timesteps == 10_000_000
    cfg = get_config("CNN_lr-0.003")
    assert cfg.selfplay.policy == "CNN"
    assert cfg.ppo.learning_rate == pytest.approx(3e-3)
    assert cfg.selfplay.board_size == 9


def test_get_config_overrides():
    cfg = get_config("5x5_MLP-default_lr-0.0003", n_envs=32, learning_rate=1e-3,
                     total_timesteps=123)
    assert cfg.selfplay.n_envs == 32
    assert cfg.ppo.learning_rate == 1e-3
    assert cfg.total_timesteps == 123
    # base preset untouched
    assert REGISTRY["5x5_MLP-default_lr-0.0003"].selfplay.n_envs == 256


def test_metrics_logger_jsonl_and_tb(tmp_path):
    logger = MetricsLogger(str(tmp_path), "run1")
    logger.log(10, {"a/b": 1.5, "c": -2.0})
    logger.log(20, {"a/b": 2.5})
    logger.close()

    lines = open(tmp_path / "run1" / "metrics.jsonl").read().strip().splitlines()
    recs = [json.loads(l) for l in lines]
    assert recs[0]["step"] == 10 and recs[0]["a/b"] == 1.5
    assert recs[1]["step"] == 20

    # TFRecord framing: length-crc-payload-crc chains must parse cleanly
    tb_files = [f for f in os.listdir(tmp_path / "run1") if f.startswith("events.out")]
    assert len(tb_files) == 1
    data = open(tmp_path / "run1" / tb_files[0], "rb").read()
    off, events = 0, 0
    while off < len(data):
        (length,) = pystruct.unpack("<Q", data[off : off + 8])
        (len_crc,) = pystruct.unpack("<I", data[off + 8 : off + 12])
        assert len_crc == _masked_crc(data[off : off + 8])
        payload = data[off + 12 : off + 12 + length]
        (ev_crc,) = pystruct.unpack("<I", data[off + 12 + length : off + 16 + length])
        assert ev_crc == _masked_crc(payload)
        off += 16 + length
        events += 1
    assert events == 1 + 3  # header + three scalars


def test_params_checkpoint_roundtrip(tmp_path):
    params = {"dense": {"kernel": jnp.arange(12.0).reshape(3, 4), "bias": jnp.ones(4)}}
    path = str(tmp_path / "params")
    ckpt.save_params(path, params)
    restored = ckpt.load_params(path, jax.tree.map(jnp.zeros_like, params))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_state_checkpoint_roundtrip(tmp_path):
    from hex_gym_env_tpu.train import SelfplayPPO
    from hex_gym_env_tpu.utils.config import PPOConfig, SelfplayConfig, TrainConfig

    cfg = TrainConfig(
        ppo=PPOConfig(n_steps=4, minibatch_size=8, n_epochs=1),
        selfplay=SelfplayConfig(board_size=4, n_envs=4, buffer_size=2),
    )
    algo = SelfplayPPO(cfg)
    state = algo.init_state(jax.random.key(0))
    state, _ = jax.jit(algo.train_step)(state)

    mgr = ckpt.CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(algo.timesteps(state), state)
    assert mgr.latest_step() == 16

    template = jax.eval_shape(lambda: algo.init_state(jax.random.key(0)))
    restored = mgr.restore(template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        if jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored state must be steppable
    restored, _ = jax.jit(algo.train_step)(restored)
    assert algo.timesteps(restored) == 32


def test_roofline_stage_math():
    """Roofline rows: achieved rates derive from flops/bytes/seconds, the
    binding resource follows the larger peak fraction, zero-FLOP stages
    report honestly."""
    from hex_gym_env_tpu.utils import roofline

    # 1 TFLOP in 10 ms -> 100 TFLOP/s ~ half of bf16 peak -> compute-bound
    row = roofline.stage("x", 0.01, 1000, 1e12, 1e6)
    assert row["achieved_tflops"] == 100.0
    assert row["bound"] == "compute"
    # 8.19 GB in 10 ms -> 100% of HBM peak
    row = roofline.stage("y", 0.01, 1000, 0.0, 8.19e9)
    assert row["pct_peak_hbm"] == 100.0 and row["bound"] == "hbm"
    # tiny everything -> latency/VPU
    row = roofline.stage("z", 0.01, 1000, 1e6, 1e3)
    assert row["bound"] == "latency/VPU"
    # MLP forward flops: 6x6 default towers = packed GEMM widths
    fl = roofline.mlp_forward_flops(36, 64, 2, 36)
    assert fl == 2 * (36 * 128) + 2 * 128 * 128 + 2 * 128 * 37


def test_scaling_prediction_model():
    """The 1->4-host efficiency prediction is monotone in hosts, uses the
    measured iteration as pure compute, and meets the 80% target for the
    reference-scale gradient sizes."""
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "scaling_bench", pathlib.Path("scripts/scaling_bench.py")
    )
    sb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sb)

    class A:  # the argparse shape predict_multihost reads
        n_epochs, n_steps, envs_per_device, minibatch_size = 10, 64, 256, 2048

    report = {"iter_ms": 20.0, "platform": "tpu", "n_params": 32000}
    out = sb.predict_multihost(report, A)["predicted_scaling"]
    effs = [r["predicted_efficiency"] for r in out["hosts"]]
    assert effs == sorted(effs, reverse=True)  # more hosts, more comm
    assert out["meets_80pct_at_4_hosts"] is True
    assert out["model"]["grad_allreduces_per_iter"] == 80

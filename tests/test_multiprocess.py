"""True multi-process distributed training (VERDICT r1 #2 / SURVEY §4(4)).

Spawns 2 worker processes x 4 virtual CPU devices each, bootstrapped with
``jax.distributed.initialize`` through ``parallel/bootstrap.py`` —
exercising coordinator setup, cross-process gloo collectives inside
``DistributedSelfplayPPO``, the real ``Trainer.fit`` loop, collective orbax
checkpointing, and process-0-only metric writes.  Asserts the trained
parameters are BITWISE identical across processes.
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_training(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "tests", "mp_worker.py"),
                str(i), "2", f"localhost:{port}", str(tmp_path),
            ],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()  # exact child PID, never by pattern

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out

    # cross-process parameter replication is bitwise
    a = np.load(tmp_path / "params_0.npy")
    b = np.load(tmp_path / "params_1.npy")
    np.testing.assert_array_equal(a, b)
    assert a.size > 1000

    # metric stream exists and came from process 0 only
    assert "null_logger=False" in outs[0]
    assert "null_logger=True" in outs[1]
    metrics = tmp_path / "log" / "mp_test" / "metrics.jsonl"
    assert metrics.exists()

    # collective checkpoint landed once, at the final step
    ckpt_dir = tmp_path / "models" / "mp_test"
    assert ckpt_dir.is_dir()

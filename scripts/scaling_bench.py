"""Weak-scaling benchmark of the SPMD selfplay-PPO train step.

Measures BASELINE.md's scaling target (>=80% efficiency 1 -> N devices):
each device owns a fixed number of environments (``--envs-per-device``), so
perfect scaling doubles transitions/s when the data axis doubles.  The only
cross-device traffic is the per-minibatch ``pmean`` gradient reduction plus
scalar metric reductions (see ``hex_gym_env_tpu/parallel/distributed.py``).

    python scripts/scaling_bench.py --board-size 11 --envs-per-device 256

On real multi-chip hardware the mesh spans all visible devices and the
efficiency number is meaningful (collectives ride ICI).  On a virtual CPU
mesh (``--cpu`` + ``--xla_force_host_platform_device_count=N``) the devices
timeshare host cores, so the run validates the SPMD program and measures
collective *count*, not hardware efficiency — the report says which.

The reference has no multi-device anything to compare against (SURVEY.md
§2.10); its single-process env loop is the ``vs_baseline`` denominator.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def bench_devices(n_devices: int, args) -> dict:
    import jax

    from hex_gym_env_tpu.parallel import DistributedSelfplayPPO, make_mesh
    from hex_gym_env_tpu.utils.config import PPOConfig, SelfplayConfig, TrainConfig

    devices = jax.devices()
    if len(devices) < n_devices:
        cpus = jax.devices("cpu")
        if len(cpus) >= n_devices:
            devices = cpus
        else:
            raise SystemExit(
                f"need {n_devices} devices, have {len(devices)} "
                f"(+{len(cpus)} cpu); set --xla_force_host_platform_device_count"
            )
    devices = devices[:n_devices]

    cfg = TrainConfig(
        ppo=PPOConfig(
            n_steps=args.n_steps,
            minibatch_size=args.minibatch_size,
            n_epochs=args.n_epochs,
        ),
        selfplay=SelfplayConfig(
            board_size=args.board_size,
            n_envs=n_devices * args.envs_per_device,
            buffer_size=args.buffer_size,
        ),
    )
    mesh = make_mesh(n_data=n_devices, devices=devices)
    algo = DistributedSelfplayPPO(cfg, mesh)
    state = algo.init_sharded_state(jax.random.key(0))
    step = jax.jit(algo.train_step, donate_argnums=0)

    def drain(x):
        # block_until_ready alone can return early on the tunneled backend
        jax.block_until_ready(x)
        jax.device_get(jax.tree.leaves(x)[0].ravel()[:1])

    state, _ = step(state)  # compile + warmup
    drain(state.params)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state)
    drain(state.params)
    dt = time.perf_counter() - t0

    per_iter = cfg.ppo.n_steps * cfg.selfplay.n_envs
    return {
        "devices": n_devices,
        "platform": devices[0].platform,
        "board_size": args.board_size,
        "n_envs": cfg.selfplay.n_envs,
        "transitions_per_s": per_iter * args.iters / dt,
        "iter_ms": dt / args.iters * 1e3,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--board-size", type=int, default=11)
    ap.add_argument("--envs-per-device", type=int, default=256)
    ap.add_argument("--n-steps", type=int, default=64)
    ap.add_argument("--minibatch-size", type=int, default=2048)
    ap.add_argument("--n-epochs", type=int, default=10)
    ap.add_argument("--buffer-size", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--devices", default=None,
                    help="comma list of mesh sizes, e.g. 1,2,4,8 (default: 1,max)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    avail = max(len(jax.devices()), len(jax.devices("cpu")))
    sizes = (
        [int(s) for s in args.devices.split(",")]
        if args.devices
        else sorted({1, avail})
    )

    results = [bench_devices(d, args) for d in sizes]
    # efficiency is only meaningful within one platform: with 1 real TPU and
    # --devices 1,8 the 8-device run silently falls back to virtual CPU
    # devices, and a TPU-vs-CPU ratio would be nonsense
    base_by_platform: dict = {}
    for r in results:
        base_by_platform.setdefault(
            r["platform"], r["transitions_per_s"] / r["devices"]
        )
    for r in results:
        base = base_by_platform[r["platform"]]
        r["efficiency_vs_1dev"] = r["transitions_per_s"] / (r["devices"] * base)
        if r["devices"] == min(
            x["devices"] for x in results if x["platform"] == r["platform"]
        ):
            r["efficiency_baseline"] = True
        print(json.dumps(r))
    if any(r["platform"] == "cpu" for r in results):
        print(
            json.dumps(
                {
                    "note": "virtual CPU mesh: devices timeshare host cores; "
                    "efficiency is not a hardware number (validates the SPMD "
                    "program only)"
                }
            )
        )


if __name__ == "__main__":
    main()

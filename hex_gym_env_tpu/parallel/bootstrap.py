"""Multi-host runtime bootstrap.

The reference is single-process (SURVEY.md §2.10); this is the multi-host
entry the TPU build uses instead of any NCCL/MPI analog: one call to
``jax.distributed.initialize`` per host process, after which
``jax.devices()`` spans the pod slice and the ``data`` mesh collectives
ride ICI within a slice / DCN across slices, compiled by XLA.

Typical use on each host::

    from hex_gym_env_tpu.parallel import bootstrap, make_mesh
    bootstrap.init_distributed()            # no-op on single host / TPU pods
    mesh = make_mesh()                      # all global devices
    ...DistributedSelfplayPPO(cfg, mesh)...

For CPU-based multi-process emulation (tests/CI), pass coordinator/process
arguments explicitly.
"""

from __future__ import annotations

from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host runtime; returns True when initialized.

    On TPU pods all arguments are auto-detected from the environment; on a
    single process with no coordinator this is a safe no-op.  Must run
    before any JAX computation touches a backend — even ``jax.devices()`` /
    ``jax.process_count()`` initializes one, after which the runtime can no
    longer join a coordinator (so this function must not probe them first).
    """
    if jax.distributed.is_initialized():
        return True
    if coordinator_address is not None:
        # explicit multi-process request: failures must propagate
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    try:
        jax.distributed.initialize()
        return True
    except (ValueError, RuntimeError):
        # single-process environment (no coordinator discoverable)
        return False


def is_main_process() -> bool:
    return jax.process_index() == 0

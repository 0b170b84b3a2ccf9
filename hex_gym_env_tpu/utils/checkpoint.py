"""Orbax checkpoint/resume.

Strictly stronger than the reference's SB3 zip saves (which lose the
opponent pool on restart — noted in SURVEY.md §5): a checkpoint here
captures params, optimizer state, the full opponent bank (snapshots +
scores + best), the live env rollout carry, the PRNG key, and the timestep
counter, so a resumed run continues the exact trajectory.

Cadence mirrors the reference: a numbered save every ``checkpoint_every``
agent transitions plus a "best" save (``EvaluationCallback.py:53-55``,
``SelfplayWrapper.py:142-144``).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def _is_prng_key(x) -> bool:
    return hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)


def _unwrap_keys(tree: Any) -> Any:
    """Typed PRNG keys are not serializable; store their raw uint32 data.

    Works on both concrete arrays and abstract ``ShapeDtypeStruct`` templates
    (as produced by ``jax.eval_shape`` for restore targets).
    """

    def unwrap(x):
        if not _is_prng_key(x):
            return x
        if isinstance(x, jax.ShapeDtypeStruct):
            return jax.eval_shape(jax.random.key_data, x)
        return jax.random.key_data(x)

    return jax.tree.map(unwrap, tree)


def _rewrap_keys(tree: Any, template: Any) -> Any:
    """Re-wrap raw key data wherever the template holds a typed key."""
    return jax.tree.map(
        lambda t, x: jax.random.wrap_key_data(x) if _is_prng_key(t) else x,
        template,
        tree,
        is_leaf=_is_prng_key,
    )


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 20):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    def save(self, step: int, state: Any, force: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(_unwrap_keys(state)), force=force)
        self._mgr.wait_until_finished()

    def restore(
        self,
        state_template: Any,
        step: int | None = None,
        shardings: Any = None,
    ) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found under {self._dir}")
        # Abstract template leaves without shardings make orbax fall back to
        # the sharding FILE — which names the devices of the SAVING run, so
        # restoring a TPU-trained checkpoint on the CPU backend (e.g.
        # ``export_agent.py --cpu``) fails with "Device ... not found".
        # Pin shardingless abstract leaves to the CALLER's target layout
        # (``shardings``: a pytree congruent with the template, e.g. from
        # ``DistributedSelfplayPPO.state_shardings``) so a mesh restore
        # lands directly sharded; with no target, pin to the current
        # backend's device 0 (correct for single-device use; mesh callers
        # should pass ``shardings`` rather than rely on jit-entry reshard).
        if shardings is None:
            dev = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
            sharding_tree = jax.tree.map(lambda _: dev, state_template)
        else:
            sharding_tree = shardings

        def pin(x, sh):
            if isinstance(x, jax.ShapeDtypeStruct) and x.sharding is None:
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh)
            return x

        # ``_unwrap_keys`` preserves tree structure (typed-key leaves become
        # raw-uint32 leaves), so the sharding tree maps leaf-for-leaf.
        template = jax.tree.map(pin, _unwrap_keys(state_template), sharding_tree)
        raw = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return _rewrap_keys(raw, state_template)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()


def save_params(path: str, params: Any) -> None:
    """One-shot parameter snapshot (the ``save_best_model`` analog)."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), params, force=True)
    ckpt.wait_until_finished()


def load_params(path: str, template: Any) -> Any:
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(path), target=template)

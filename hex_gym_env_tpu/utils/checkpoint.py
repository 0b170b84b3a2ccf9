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


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 20):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    def save(self, step: int, state: Any, force: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
        self._mgr.wait_until_finished()

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found under {self._dir}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

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

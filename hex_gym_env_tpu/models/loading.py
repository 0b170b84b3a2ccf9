"""Policy-parameter loading by spec string.

Shared by the match/tournament scripts and the trainer's pool-seeding:

- ``random``          — zero parameters (uniform over legal moves, i.e. the
                        reference's ``BaseRandomPolicy``);
- ``sb3:<zip>``       — a reference SB3 checkpoint (``models/sb3_import``);
- ``orbax:<dir>``     — an hex_gym_env_tpu orbax params snapshot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def load_policy_params(spec: str, board_size: int, model=None, family: str = "MLP-default"):
    """Returns (model, variables) for ``spec`` at ``board_size``.

    ``family`` picks the architecture (``models.make_policy`` names) when no
    ``model`` is given — needed to restore non-MLP checkpoints (e.g. CNN).
    """
    from hex_gym_env_tpu.models import make_policy

    n = board_size
    if model is None:
        model = make_policy(family, n * n)
    template = model.init(jax.random.key(0), jnp.zeros((1, n, n), jnp.float32))
    if spec == "random":
        return model, jax.tree.map(jnp.zeros_like, template)
    kind, _, path = spec.partition(":")
    if kind == "sb3":
        from hex_gym_env_tpu.models.sb3_import import sb3_to_mlp_params

        return model, sb3_to_mlp_params(path)
    if kind == "orbax":
        from hex_gym_env_tpu.utils.checkpoint import load_params

        return model, load_params(path, template)
    raise ValueError(f"unknown policy spec: {spec}")

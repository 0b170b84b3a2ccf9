"""Policy model zoo mirroring the reference experiment grid.

Families (``scripts/experiments/*.py``):

- ``MLP-default``: pi/vf [64, 64], Tanh (SB3 MlpPolicy defaults; the three
  shipped size-titled checkpoints use this)
- ``MLP-deep``: pi/vf [64]*4, ReLU
- ``MLP-wide-deep``: pi/vf [128]*4, ReLU
- ``CNN``: conv extractor (features_dim 128) + pi/vf [128, 128], ReLU
"""

from __future__ import annotations

from flax import linen as nn

from hex_gym_env_tpu.models.mlp import MlpPolicy
from hex_gym_env_tpu.models.cnn import CnnPolicy
from hex_gym_env_tpu.models import sb3_import


def make_policy(family: str, n_actions: int) -> nn.Module:
    """Build a policy module for one of the reference's model families."""
    if family == "MLP-default":
        return MlpPolicy(n_actions=n_actions)
    if family == "MLP-deep":
        return MlpPolicy(
            n_actions=n_actions,
            pi_layers=(64,) * 4,
            vf_layers=(64,) * 4,
            activation=nn.relu,
        )
    if family == "MLP-wide-deep":
        return MlpPolicy(
            n_actions=n_actions,
            pi_layers=(128,) * 4,
            vf_layers=(128,) * 4,
            activation=nn.relu,
        )
    if family == "CNN":
        return CnnPolicy(n_actions=n_actions)
    raise ValueError(f"unknown policy family: {family!r}")


__all__ = ["MlpPolicy", "CnnPolicy", "make_policy", "sb3_import"]

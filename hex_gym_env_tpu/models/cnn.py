"""CNN feature-extractor policy matching the reference's ``CustomNetwork``.

Mirrors ``minihex/CustomNetwork.py:9-60`` + the CNN experiment's policy
kwargs (``scripts/experiments/CNN_lr-0.003.py:41-46``):

- Conv(1->64, 3x3, same) + BatchNorm + ReLU;
- two "residual" blocks that are actually plain double Conv+BN+ReLU stacks —
  the reference's ``residual()`` has **no skip connection** despite its name
  (``CustomNetwork.py:52-60``); reproduced faithfully;
- flatten -> Linear(features_dim=128) + ReLU;
- then SB3-style pi/vf towers [128, 128] with ReLU and the usual heads.

BatchNorm follows SB3 runtime behavior: running averages during rollout
(``train=False``), batch statistics + running-average updates during the
gradient step (``train=True``, with a mutable ``batch_stats`` collection).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from hex_gym_env_tpu.models.mlp import (
    ORTHO_ACTION_GAIN,
    ORTHO_HIDDEN_GAIN,
    ORTHO_VALUE_GAIN,
    _dense,
)


class _ConvBnRelu(nn.Module):
    filters: int

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.filters,
            (3, 3),
            strides=1,
            padding="SAME",
            kernel_init=nn.initializers.orthogonal(ORTHO_HIDDEN_GAIN),
            bias_init=nn.initializers.zeros,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return nn.relu(x)


class CnnPolicy(nn.Module):
    """Conv extractor + [128,128] ReLU towers; obs (B, N, N) float32."""

    n_actions: int
    features_dim: int = 128
    filters: int = 64
    pi_layers: Sequence[int] = (128, 128)
    vf_layers: Sequence[int] = (128, 128)

    @nn.compact
    def __call__(self, obs: jnp.ndarray, train: bool = False):
        x = obs.astype(jnp.float32)[..., None]  # NHWC with one channel
        x = _ConvBnRelu(self.filters, name="conv_in")(x, train)
        # two skip-less "residual" double-conv blocks, as in the reference
        x = _ConvBnRelu(self.filters, name="block1_a")(x, train)
        x = _ConvBnRelu(self.filters, name="block1_b")(x, train)
        x = _ConvBnRelu(self.filters, name="block2_a")(x, train)
        x = _ConvBnRelu(self.filters, name="block2_b")(x, train)
        x = x.reshape(x.shape[0], -1)
        feats = nn.relu(_dense(self.features_dim, ORTHO_HIDDEN_GAIN, "features")(x))

        pi = feats
        for i, width in enumerate(self.pi_layers):
            pi = nn.relu(_dense(width, ORTHO_HIDDEN_GAIN, f"pi_{i}")(pi))
        vf = feats
        for i, width in enumerate(self.vf_layers):
            vf = nn.relu(_dense(width, ORTHO_HIDDEN_GAIN, f"vf_{i}")(vf))

        logits = _dense(self.n_actions, ORTHO_ACTION_GAIN, "action_head")(pi)
        value = _dense(1, ORTHO_VALUE_GAIN, "value_head")(vf)
        return logits, value[..., 0]

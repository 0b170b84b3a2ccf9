"""Actor-critic MLP policy matching SB3's ``MlpPolicy`` family.

Architecture contract (decoded from the shipped reference checkpoints, see
BASELINE.md, and the experiment grid ``scripts/experiments/*.py``):

- flatten the (N, N) board to N^2 float32 features;
- two *separate* towers ``pi`` and ``vf`` (SB3 ``mlp_extractor``), default
  [64, 64] with Tanh (``MLP-default``); the deep/wide variants use ReLU
  (``MLP-deep_lr-*.py``: ``net_arch pi/vf [64]*4, activation_fn ReLU``);
- linear action head (N^2 logits) and linear value head (scalar);
- orthogonal init with SB3's gains: sqrt(2) for hidden layers, 0.01 for the
  action head, 1.0 for the value head; zero biases.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

ORTHO_HIDDEN_GAIN = 2.0**0.5
ORTHO_ACTION_GAIN = 0.01
ORTHO_VALUE_GAIN = 1.0


def _dense(features: int, gain: float, name: str) -> nn.Dense:
    return nn.Dense(
        features,
        kernel_init=nn.initializers.orthogonal(gain),
        bias_init=nn.initializers.zeros,
        name=name,
    )


class MlpPolicy(nn.Module):
    """Separate pi/vf towers + action/value heads.

    Call with float32 observations of shape (B, N, N) (or (B, N*N));
    returns ``(logits (B, N*N), value (B,))``.
    """

    n_actions: int
    pi_layers: Sequence[int] = (64, 64)
    vf_layers: Sequence[int] = (64, 64)
    activation: Callable = nn.tanh

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        x = obs.reshape(obs.shape[0], -1).astype(jnp.float32)

        pi = x
        for i, width in enumerate(self.pi_layers):
            pi = self.activation(_dense(width, ORTHO_HIDDEN_GAIN, f"pi_{i}")(pi))
        vf = x
        for i, width in enumerate(self.vf_layers):
            vf = self.activation(_dense(width, ORTHO_HIDDEN_GAIN, f"vf_{i}")(vf))

        logits = _dense(self.n_actions, ORTHO_ACTION_GAIN, "action_head")(pi)
        value = _dense(1, ORTHO_VALUE_GAIN, "value_head")(vf)
        return logits, value[..., 0]

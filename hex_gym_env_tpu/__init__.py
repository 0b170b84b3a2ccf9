"""hex_gym_env_tpu — a TPU-native Hex selfplay-RL framework.

A from-scratch JAX/XLA re-design of the capabilities of ``MBPrdctns/hex_gym_env``
(the "minihex" reference): the Hex board game as a batched, jit-compiled
environment; maskable-PPO selfplay with an on-device opponent snapshot bank;
Gymnasium-compatible host-side adapters; and multi-host scaling over a
``jax.sharding.Mesh``.

Design at a glance (vs. the reference):

- Reference: one scalar game per Python object, incremental region-label
  merging for win detection (``minihex/HexSingleGame.py:88-153``), SB3
  MaskablePPO on CPU torch.
- Here: thousands of games step in lockstep as lane-packed boolean bitboards
  ``(batch, 128)``; win detection is an incremental *reach-set* maintained by a
  fixpoint neighbor-OR propagation (see ``hex_gym_env_tpu/ops/connectivity.py``);
  policy forward, env step, GAE, and the PPO update are all fused into jitted
  XLA programs; data parallelism is a named mesh axis.
"""

__version__ = "0.1.0"

from hex_gym_env_tpu.core.topology import HexTopology
from hex_gym_env_tpu.core.state import HexState, Winner
from hex_gym_env_tpu.core import env as hex_env
from hex_gym_env_tpu.compat.gym_env import random_policy

__all__ = [
    "HexTopology",
    "HexState",
    "Winner",
    "hex_env",
    "random_policy",
    "__version__",
]

"""Import SB3 MaskablePPO checkpoint weights into flax MlpPolicy params.

The reference ships four SB3 zip checkpoints (``models/`` — see BASELINE.md).
This reads ``policy.pth`` straight out of the zip with ``torch.load`` (no
stable-baselines3 dependency needed) and transposes torch's (out, in) Linear
kernels into flax's (in, out) layout, enabling numeric cross-validation of
the forward pass and GUI play against the reference's own trained agents.

SB3 MlpPolicy state-dict layout (verified against
``/root/reference/models/6x6_buffer_64_10.zip``)::

    mlp_extractor.policy_net.{0,2,...}.{weight,bias}   pi tower
    mlp_extractor.value_net.{0,2,...}.{weight,bias}    vf tower
    action_net.{weight,bias}                           logits head
    value_net.{weight,bias}                            value head
"""

from __future__ import annotations

import io
import zipfile
from typing import Any, Dict

import numpy as np


def load_sb3_policy_state(path: str) -> Dict[str, np.ndarray]:
    """Return the raw torch state dict (as numpy) from an SB3 zip."""
    import torch  # local import: torch is only needed for checkpoint import

    with zipfile.ZipFile(path) as z:
        with z.open("policy.pth") as f:
            sd = torch.load(io.BytesIO(f.read()), map_location="cpu", weights_only=True)
    return {k: v.detach().numpy() for k, v in sd.items()}


def sb3_to_mlp_params(path: str) -> Dict[str, Any]:
    """Convert an SB3 MlpPolicy checkpoint into flax ``MlpPolicy`` params."""
    sd = load_sb3_policy_state(path)

    def linear(prefix: str) -> Dict[str, np.ndarray]:
        return {
            "kernel": sd[f"{prefix}.weight"].T.copy(),
            "bias": sd[f"{prefix}.bias"].copy(),
        }

    params: Dict[str, Any] = {}
    i = 0
    while f"mlp_extractor.policy_net.{2 * i}.weight" in sd:
        params[f"pi_{i}"] = linear(f"mlp_extractor.policy_net.{2 * i}")
        params[f"vf_{i}"] = linear(f"mlp_extractor.value_net.{2 * i}")
        i += 1
    params["action_head"] = linear("action_net")
    params["value_head"] = linear("value_net")
    return {"params": params}


def sb3_num_hidden_layers(path: str) -> int:
    sd = load_sb3_policy_state(path)
    i = 0
    while f"mlp_extractor.policy_net.{2 * i}.weight" in sd:
        i += 1
    return i

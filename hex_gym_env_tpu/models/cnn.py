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


# One constant for BOTH the live BatchNorm layers and the folded-bank
# forward (``fold_bn``): torch's nn.BatchNorm2d default, which the
# reference's extractor uses (``CustomNetwork.py:46-49``).  ADVICE r4:
# duplicating the literal silently decoupled the two paths.
BN_EPS = 1e-5


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
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=BN_EPS)(x)
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


# ---------------------------------------------------------------------------
# Stacked opponent-bank forward (grouped convs, BN folded)
# ---------------------------------------------------------------------------
#
# The rollout's opponent pass must evaluate EVERY bank member on the batch
# (the dense-bank design, train/rollout.py docstring).  For the MLP family
# that is a tiny batched GEMM; for this CNN, ``vmap(model.apply)`` over P
# stacked members makes XLA lower each conv with ``batch_group_count=P`` —
# a shape TPU handles poorly — and runs 5 BatchNorm layers of VPU work per
# member per step.  This path instead:
#
#   1. folds inference-mode BatchNorm into the conv weights once per
#      rollout (y = gamma*(Wx+b-mu)/sqrt(var+eps)+beta is just a per-output-
#      channel rescale of W and shift of b);
#   2. runs each conv layer for ALL members as ONE feature-grouped conv
#      (`feature_group_count=P`, channels laid out (P, C)) — a single
#      XLA op per layer with the member axis in the channel dimension;
#   3. runs the dense tower as P-batched einsum GEMMs (K = 5184/128 —
#      proper MXU shapes).
#
# Numerics: identical math to ``model.apply(train=False)`` up to f32
# reassociation (asserted to tolerance in tests/test_models.py).

_CONV_LAYERS = ("conv_in", "block1_a", "block1_b", "block2_a", "block2_b")


def fold_bn(variables):
    """Fold inference-mode BatchNorm into conv kernels/biases.

    ``variables`` is one member's ``{"params": ..., "batch_stats": ...}``
    (or a P-stacked version of it; folding is elementwise over members).
    Returns ``{layer: (kernel (3,3,Cin,Cout), bias (Cout,))}`` for the conv
    stack plus the dense params passed through.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    out = {}
    for name in _CONV_LAYERS:
        conv = params[name]["Conv_0"]
        bn = params[name]["BatchNorm_0"]
        bs = stats[name]["BatchNorm_0"]
        inv = bn["scale"] / jnp.sqrt(bs["var"] + BN_EPS)  # (..., Cout)
        kernel = conv["kernel"] * inv[..., None, None, None, :]
        bias = (conv["bias"] - bs["mean"]) * inv + bn["bias"]
        out[name] = (kernel, bias)
    return out


def bank_logits(model: CnnPolicy, stacked_variables, obs, paired: bool = False,
                dtype=jnp.float32):
    """All bank members' action logits in one grouped-conv forward.

    - ``paired=False``: ``obs (B, N, N)`` shared by every member ->
      ``(P, B, A)`` (the rollout's dense-bank pass);
    - ``paired=True``: ``obs (P, N, N)``, member i sees board i ->
      ``(P, A)`` (the evaluator's one-episode-per-member pass).

    ``stacked_variables`` has a leading P axis on every leaf.  ``dtype``
    = jnp.bfloat16 halves the activation bandwidth (the ``rollout_bank_bf16``
    deviation); accumulation stays f32.
    """
    import jax

    folded = fold_bn(stacked_variables)
    params = stacked_variables["params"]
    P = folded[_CONV_LAYERS[0]][0].shape[0]
    n = obs.shape[-1]

    # working activation layout: (Bp, H, W, P, C) — groups adjacent in the
    # channel dim once flattened, matching the rhs (P-major) layout below
    if paired:
        x = obs.astype(dtype).reshape(1, P, n, n).transpose(0, 2, 3, 1)[..., None]
    else:
        B = obs.shape[0]
        x = jnp.broadcast_to(
            obs.astype(dtype)[:, None, :, :], (B, P, n, n)
        ).transpose(0, 2, 3, 1)[..., None]  # (B, H, W, P, 1)
    Bp = x.shape[0]

    for name in _CONV_LAYERS:
        kernel, bias = folded[name]  # (P, 3, 3, Cin, Cout), (P, Cout)
        cin, cout = kernel.shape[-2], kernel.shape[-1]
        lhs = x.reshape(Bp, n, n, P * cin)
        # HWIO rhs for grouped conv: I = per-group cin, O = (P, cout) with
        # group p's filters contiguous — so P must sit LEFT of cout
        rhs = (
            kernel.transpose(1, 2, 3, 0, 4)
            .reshape(3, 3, cin, P * cout)
            .astype(dtype)
        )
        y = jax.lax.conv_general_dilated(
            lhs, rhs,
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=P,
            preferred_element_type=jnp.float32,
        )  # (Bp, n, n, P*Cout), channel layout (P, Cout)
        y = y.reshape(Bp, n, n, P, cout) + bias[None, None, None]
        x = jnp.maximum(y, 0.0).astype(dtype)  # (Bp, n, n, P, Cout)

    # (Bp, n, n, P, C) -> (P, Bp, n*n*C) feature order matching flatten
    feats_in = x.transpose(3, 0, 1, 2, 4).reshape(P, Bp, -1).astype(jnp.float32)

    def dense(name, h):
        W = params[name]["kernel"].astype(jnp.float32)  # (P, K, M)
        b = params[name]["bias"].astype(jnp.float32)  # (P, M)
        return jnp.einsum("pbk,pkm->pbm", h, W) + b[:, None]

    h = jnp.maximum(dense("features", feats_in), 0.0)
    pi = h
    for i in range(len(model.pi_layers)):
        pi = jnp.maximum(dense(f"pi_{i}", pi), 0.0)
    logits = dense("action_head", pi)  # (P, Bp, A)
    return logits[:, 0] if paired else logits

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


def gathered_bank_logits(
    model: CnnPolicy,
    stacked_variables,
    best_variables,
    use_best,
    opp_idx,
    obs,
    dtype=jnp.float32,
):
    """Member-assigned logits ``(B, A)``, computing ONLY each env's opponent.

    The dense bank pass (``bank_logits``) runs every member on every board:
    P x B conv FLOPs per opponent ply — at 9x9/pool-31 ~0.93 GFLOP per
    transition, the measured ceiling of the CNN family at 44-46k
    transitions/s (RESULTS.md r4).  The rollout only needs each env's
    *assigned* opponent (``use_best``/``opp_idx``, the reference's
    per-episode ``setup_opponents`` draw), so here:

    1. BatchNorm is folded once and the conv stack is GATHERED per env
       (B x ~735 KB of filters — bandwidth-cheap vs the P x conv FLOPs it
       replaces); ``use_best`` rows take the best snapshot's folded stack;
    2. each conv layer runs as ONE feature-grouped conv with
       ``feature_group_count=B`` — every env is a group carrying its own
       member's filters (same lowering shape as the evaluator's paired
       pass, with weights per env instead of per member);
    3. the dense tower stays weight-DENSE: all P members' towers run on
       each env's features as P-batched GEMMs, then row-select.  Tower
       FLOPs are ~5% of the conv stack's, while gathering its (5184, 128)
       kernels per env would cost more HBM traffic than the dense compute;
       ``use_best`` rows select a separately-computed best tower.

    Numerics: the selected rows equal the dense pass's selection up to f32
    reassociation (different grouped-conv lowering), asserted to tolerance
    in ``tests/test_models.py``.
    """
    import jax

    folded = fold_bn(stacked_variables)
    folded_best = fold_bn(best_variables)
    params = stacked_variables["params"]
    bparams = best_variables["params"]
    B, n = obs.shape[0], obs.shape[-1]
    ub_k = use_best[:, None, None, None, None]

    # (1, H, W, B, 1): each env is a channel group
    x = obs.astype(dtype).reshape(1, B, n, n).transpose(0, 2, 3, 1)[..., None]
    for name in _CONV_LAYERS:
        k_st, b_st = folded[name]  # (P, 3, 3, Cin, Cout), (P, Cout)
        k_bb, b_bb = folded_best[name]
        kg = jnp.where(ub_k, k_bb[None], k_st[opp_idx])  # (B, 3, 3, Cin, Cout)
        bg = jnp.where(use_best[:, None], b_bb[None], b_st[opp_idx])  # (B, Cout)
        cin, cout = kg.shape[-2], kg.shape[-1]
        lhs = x.reshape(1, n, n, B * cin)
        # HWIO rhs, group b's filters contiguous: B left of cout
        rhs = kg.transpose(1, 2, 3, 0, 4).reshape(3, 3, cin, B * cout).astype(dtype)
        y = jax.lax.conv_general_dilated(
            lhs, rhs,
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=B,
            preferred_element_type=jnp.float32,
        )  # (1, n, n, B*Cout)
        y = y.reshape(1, n, n, B, cout) + bg[None, None, None]
        x = jnp.maximum(y, 0.0).astype(dtype)

    # (1, n, n, B, C) -> (B, n*n*C), feature order matching flatten
    feats = x.transpose(3, 0, 1, 2, 4).reshape(B, -1).astype(jnp.float32)

    def dense_all(name, h):  # h (B, P, K) or (B, K) feats broadcast
        W = params[name]["kernel"].astype(jnp.float32)  # (P, K, M)
        b = params[name]["bias"].astype(jnp.float32)  # (P, M)
        eq = "bk,pkm->bpm" if h.ndim == 2 else "bpk,pkm->bpm"
        return jnp.einsum(eq, h, W) + b[None]

    h = jnp.maximum(dense_all("features", feats), 0.0)
    for i in range(len(model.pi_layers)):
        h = jnp.maximum(dense_all(f"pi_{i}", h), 0.0)
    logits_all = dense_all("action_head", h)  # (B, P, A)
    sel = jnp.take_along_axis(
        logits_all, opp_idx[:, None, None], axis=1
    )[:, 0]  # (B, A)

    def dense_best(name, h):
        W = bparams[name]["kernel"].astype(jnp.float32)
        b = bparams[name]["bias"].astype(jnp.float32)
        return h @ W + b

    hb = jnp.maximum(dense_best("features", feats), 0.0)
    for i in range(len(model.pi_layers)):
        hb = jnp.maximum(dense_best(f"pi_{i}", hb), 0.0)
    best_logits = dense_best("action_head", hb)  # (B, A)

    return jnp.where(use_best[:, None], best_logits, sel)

"""Masked categorical distribution over actions.

Semantics match sb3_contrib's ``MaskableCategorical`` (the distribution the
reference trains with via ``MaskablePPO`` + ``ActionMasker``,
``scripts/selfplay_new.py:45,56``): illegal logits are replaced by the most
negative finite float32, probabilities/log-probs come from a softmax over the
masked logits, and the entropy sum treats masked terms as exactly zero.

Functions are elementwise over leading batch axes and safe inside jit/scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

MASKED_LOGIT = jnp.finfo(jnp.float32).min


def mask_logits(logits: jnp.ndarray, legal: jnp.ndarray) -> jnp.ndarray:
    """Replace illegal entries with the float32 minimum."""
    return jnp.where(legal, logits, MASKED_LOGIT)


def sample(key: jax.Array, logits: jnp.ndarray, legal: jnp.ndarray) -> jnp.ndarray:
    """Stochastic draw over legal actions ((B,) int32)."""
    return jax.random.categorical(key, mask_logits(logits, legal), axis=-1).astype(
        jnp.int32
    )


def mode(logits: jnp.ndarray, legal: jnp.ndarray) -> jnp.ndarray:
    """Deterministic (argmax) action, as SB3's ``predict(deterministic=True)``."""
    return jnp.argmax(mask_logits(logits, legal), axis=-1).astype(jnp.int32)


def log_prob(logits: jnp.ndarray, legal: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
    """log pi(a | s) under the masked distribution ((B,) float32)."""
    logp = jax.nn.log_softmax(mask_logits(logits, legal), axis=-1)
    return jnp.take_along_axis(logp, actions[..., None], axis=-1)[..., 0]


def entropy(logits: jnp.ndarray, legal: jnp.ndarray) -> jnp.ndarray:
    """Entropy with masked terms contributing exactly zero ((B,) float32)."""
    logp = jax.nn.log_softmax(mask_logits(logits, legal), axis=-1)
    p = jnp.exp(logp)
    p_log_p = jnp.where(legal, p * logp, 0.0)
    return -jnp.sum(p_log_p, axis=-1)


def probs(logits: jnp.ndarray, legal: jnp.ndarray) -> jnp.ndarray:
    """Action probabilities (used by the GUI overlay parity path,
    ``minihex/SelfplayWrapper.py:201-206``)."""
    return jax.nn.softmax(mask_logits(logits, legal), axis=-1)


class DistInfo(NamedTuple):
    """Bundle returned by :func:`sample_with_info` for rollout buffers."""

    action: jnp.ndarray
    log_prob: jnp.ndarray


def sample_with_info(key: jax.Array, logits: jnp.ndarray, legal: jnp.ndarray) -> DistInfo:
    masked = mask_logits(logits, legal)
    action = jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(masked, axis=-1)
    lp = jnp.take_along_axis(logp, action[..., None], axis=-1)[..., 0]
    return DistInfo(action=action, log_prob=lp)

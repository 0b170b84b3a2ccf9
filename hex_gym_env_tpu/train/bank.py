"""On-device opponent snapshot bank.

The reference keeps a Python list/array of SB3 model wrappers plus scores
(``minihex/SelfplayWrapper.py:39-67``) and mutates it from the eval callback
(``set_opponent_model``, ``:125-137``).  Here the bank is a pytree of
*stacked* parameter snapshots (leading axis = pool slot) resident in device
memory, plus a scores vector and the designated best snapshot — all updated
by pure functions so the whole selfplay protocol stays inside jit.

A zero-initialized parameter snapshot plays exactly the reference's
``BaseRandomPolicy`` (``SelfplayWrapper.py:16-24``): zero weights produce
constant logits, and the masked categorical over constant logits is uniform
over legal moves.  So a fresh bank of zeros *is* the reference's initial
pool of random policies.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class OpponentBank:
    """Pool of ``size`` opponent snapshots + scores + best snapshot.

    Attributes:
      params: pytree with leading axis P on every leaf (stacked snapshots).
      scores: (P,) float32 — the pool scores (``opponent_scores``).
      best_params: pytree — the designated best snapshot (``best_model``).
      best_score: () float32 (``best_score``, init max(scores)).
    """

    params: Any
    scores: jnp.ndarray
    best_params: Any
    best_score: jnp.ndarray

    @property
    def size(self) -> int:
        return self.scores.shape[0]


def init_bank(template_params: Any, size: int) -> OpponentBank:
    """Fresh bank of `size` random policies (zero params), zero scores."""
    zeros = jax.tree.map(jnp.zeros_like, template_params)
    stacked = jax.tree.map(
        lambda z: jnp.broadcast_to(z[None], (size,) + z.shape).copy(), zeros
    )
    return OpponentBank(
        params=stacked,
        scores=jnp.zeros((size,), jnp.float32),
        best_params=zeros,
        best_score=jnp.zeros((), jnp.float32),
    )


def sample_opponents(key: jax.Array, bank_size: int, batch: int, best_prob: float):
    """Per-episode opponent draw: P(best) = best_prob, else uniform pool slot.

    Mirrors ``setup_opponents`` (``SelfplayWrapper.py:97-104``).  Returns
    ``(use_best (B,) bool, idx (B,) int32)``.
    """
    k1, k2 = jax.random.split(key)
    use_best = jax.random.uniform(k1, (batch,)) < best_prob
    idx = jax.random.randint(k2, (batch,), 0, bank_size, dtype=jnp.int32)
    return use_best, idx


def replace_member(
    bank: OpponentBank,
    key: jax.Array,
    new_params: Any,
    score: jnp.ndarray,
    do_replace: jnp.ndarray,
) -> OpponentBank:
    """Conditionally replace a random minimum-score member with ``new_params``.

    Mirrors the eval callback + ``set_opponent_model``
    (``EvaluationCallback.py:36-48``, ``SelfplayWrapper.py:125-137``):
    pick uniformly among the argmin-score slots, overwrite params and score,
    and promote to best when the score strictly beats ``best_score``.
    ``do_replace`` gates the whole mutation (so this stays jittable).
    """
    scores = bank.scores
    is_min = scores == jnp.min(scores)
    # uniform draw among argmin slots
    logits = jnp.where(is_min, 0.0, -jnp.inf)
    slot = jax.random.categorical(key, logits)

    def write(stacked, new):
        updated = stacked.at[slot].set(new)
        return jnp.where(
            jnp.reshape(do_replace, (1,) * stacked.ndim), updated, stacked
        )

    new_stack = jax.tree.map(write, bank.params, new_params)
    new_scores = jnp.where(
        do_replace, scores.at[slot].set(score.astype(jnp.float32)), scores
    )

    promote = do_replace & (score > bank.best_score)

    def pick_best(cur, new):
        return jnp.where(jnp.reshape(promote, (1,) * cur.ndim), new, cur)

    new_best = jax.tree.map(pick_best, bank.best_params, new_params)
    new_best_score = jnp.where(promote, score.astype(jnp.float32), bank.best_score)

    return OpponentBank(
        params=new_stack,
        scores=new_scores,
        best_params=new_best,
        best_score=new_best_score,
    )

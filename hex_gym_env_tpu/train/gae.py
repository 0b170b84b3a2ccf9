"""Generalized Advantage Estimation, matching SB3's recurrence.

SB3's ``RolloutBuffer.compute_returns_and_advantage`` walks time backwards
with ``next_non_terminal = 1 - episode_start[t+1]`` and bootstraps the final
step from the value of the post-rollout observation.  Here ``dones[t]`` marks
a transition that *ended* an episode (so ``episode_start[t+1] == dones[t]``
under in-scan auto-reset), which gives the identical recurrence expressed
over ``(T, B)`` arrays in one ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(
    rewards: jnp.ndarray,  # (T, B) float32
    values: jnp.ndarray,  # (T, B) float32 — V(obs_t)
    dones: jnp.ndarray,  # (T, B) bool — transition t ended its episode
    last_values: jnp.ndarray,  # (B,) float32 — V(obs_T) after auto-reset
    gamma: float,
    gae_lambda: float,
):
    """Returns (advantages, returns), both (T, B) float32.

    ``returns = advantages + values`` (SB3's TD(lambda) target).
    """
    nonterminal = 1.0 - dones.astype(jnp.float32)

    def body(carry, xs):
        next_adv, next_value = carry
        r, v, nt = xs
        delta = r + gamma * next_value * nt - v
        adv = delta + gamma * gae_lambda * nt * next_adv
        return (adv, v), adv

    (_, _), advantages = jax.lax.scan(
        body,
        (jnp.zeros_like(last_values), last_values),
        (rewards, values, nonterminal),
        reverse=True,
    )
    return advantages, advantages + values

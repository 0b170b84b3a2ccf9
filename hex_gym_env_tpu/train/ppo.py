"""On-device maskable PPO learner.

Faithful to SB3 PPO semantics (the reference trains with stock
``MaskablePPO``, hyperparameters decoded in BASELINE.md): clipped surrogate
objective over the masked categorical, per-minibatch advantage
normalization, unclipped value MSE (``clip_range_vf=None`` default), entropy
bonus (coef 0 by default), Adam(eps=1e-5) with global-norm grad clipping —
but the whole epochs x minibatches sweep is one jitted scan instead of a
Python dataloader loop.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from hex_gym_env_tpu.ops import masked
from hex_gym_env_tpu.utils.config import PPOConfig


class PPOBatch(NamedTuple):
    """Flattened rollout data, leading axis = T*B.

    Invariant: ``legal == (obs.reshape(n, A) == 0)`` — in Hex every empty
    mover-frame cell is a legal move and vice versa.  The rollout producer
    guarantees this, and the fused Pallas sweep kernels RELY on it: they
    re-derive the mask in-kernel as ``obs == 0`` and never read ``legal``
    (``ops/pallas_ppo.py``).  A producer whose ``legal`` deviated from
    ``obs == 0`` would silently diverge from the lax sweep; the pallas==lax
    parity tests assert the invariant on their inputs.
    """

    obs: jnp.ndarray  # (n, N, N) int8
    legal: jnp.ndarray  # (n, A) bool — MUST equal (obs == 0) flattened
    action: jnp.ndarray  # (n,) int32
    log_prob_old: jnp.ndarray  # (n,)
    value_old: jnp.ndarray  # (n,)
    advantage: jnp.ndarray  # (n,)
    ret: jnp.ndarray  # (n,)


class PPOStats(NamedTuple):
    policy_loss: jnp.ndarray
    value_loss: jnp.ndarray
    entropy: jnp.ndarray
    approx_kl: jnp.ndarray
    clip_frac: jnp.ndarray


def make_optimizer(cfg: PPOConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.learning_rate, eps=cfg.adam_eps),
    )


def make_loss_fn(model, cfg: PPOConfig):
    """The PPO minibatch loss, exported for numeric parity testing
    (``tests/test_sb3_parity.py`` diffs its gradients against an independent
    torch restatement of ``MaskablePPO.train``)."""

    def loss_fn(params, extra, mb: PPOBatch):
        variables = {"params": params, **extra}
        if extra:  # e.g. BatchNorm: batch statistics + running-average update
            (logits, values), new_extra = model.apply(
                variables, mb.obs.astype(jnp.float32), train=True,
                mutable=list(extra.keys()),
            )
        else:
            logits, values = model.apply(variables, mb.obs.astype(jnp.float32))
            new_extra = extra
        log_prob = masked.log_prob(logits, mb.legal, mb.action)
        entropy = masked.entropy(logits, mb.legal)

        adv = mb.advantage
        # SB3 normalizes per-minibatch with torch.Tensor.std(), which applies
        # Bessel's correction (ddof=1) — at minibatch 64 the biased std would
        # be a systematic 0.8% off (caught by tests/test_sb3_parity.py).
        adv = (adv - adv.mean()) / (adv.std(ddof=1) + 1e-8)

        ratio = jnp.exp(log_prob - mb.log_prob_old)
        unclipped = adv * ratio
        clipped = adv * jnp.clip(ratio, 1.0 - cfg.clip_range, 1.0 + cfg.clip_range)
        policy_loss = -jnp.mean(jnp.minimum(unclipped, clipped))

        value_loss = jnp.mean((mb.ret - values) ** 2)
        entropy_loss = -jnp.mean(entropy)

        loss = policy_loss + cfg.ent_coef * entropy_loss + cfg.vf_coef * value_loss

        log_ratio = log_prob - mb.log_prob_old
        approx_kl = jnp.mean(jnp.exp(log_ratio) - 1.0 - log_ratio)
        clip_frac = jnp.mean((jnp.abs(ratio - 1.0) > cfg.clip_range).astype(jnp.float32))
        return loss, (PPOStats(policy_loss, value_loss, -entropy_loss, approx_kl, clip_frac), new_extra)

    return loss_fn


def epoch_permutations(key: jax.Array, n: int, n_epochs: int) -> jnp.ndarray:
    """``(n_epochs, n)`` int32 — one uniform permutation of ``range(n)`` per
    epoch, generated with ONE batched sort.

    This is the permutation stream shared by every epoch-sweep backend (the
    lax scan and both fused Pallas sweeps derive their minibatch indices
    from this function with the same key), which is what the pallas==lax
    parity tests pin.  SB3's own stream is numpy's and was never
    reproducible here; the behavioral contract is "fresh uniform full
    reshuffle per epoch" (SB3 ``MaskablePPO.train``), which this satisfies.

    Implementation note: ``jax.random.permutation`` runs a 3-round
    sort-based shuffle, so 10 epochs cost 30 sequential n-element sorts —
    measured ~30 ms of the exact-path PPO iteration at the headline shape
    (VERDICT r3 weakness 3).  Here each element draws a 64-bit random key
    (two uint32 words, lexicographic 2-key sort) and all epochs sort in one
    batched op.  Conditional on distinct keys the permutation is exactly
    uniform; the per-epoch collision probability is < n^2 / 2^65 (~6e-11 at
    n=65536), and a collision only makes the tied pair's order
    implementation-defined rather than random.
    """
    epoch_keys = jax.random.split(key, n_epochs)
    bits = jax.vmap(lambda k: jax.random.bits(k, (2, n), jnp.uint32))(epoch_keys)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (n_epochs, n))
    _, _, perm = jax.lax.sort(
        (bits[:, 0], bits[:, 1], iota), dimension=-1, num_keys=2
    )
    return perm


def make_update_fn(
    model,
    cfg: PPOConfig,
    optimizer: optax.GradientTransformation,
    grad_reduce=None,
):
    """Build ``update(params, opt_state, batch, key) -> (params', opt_state',
    stats)`` running ``n_epochs`` shuffled sweeps of minibatch SGD.

    ``grad_reduce`` (optional) is applied to the gradient pytree before the
    optimizer — the data-parallel hook: inside ``shard_map`` pass
    ``lambda g: jax.lax.pmean(g, "data")`` so every replica applies the
    mesh-averaged gradient and parameters stay bitwise replicated.
    """
    loss_fn = make_loss_fn(model, cfg)
    grad_fn = jax.grad(loss_fn, has_aux=True)

    def update(variables: Any, opt_state, batch: PPOBatch, key: jax.Array):
        """``variables`` is the full flax dict; only ``params`` is trained,
        other collections (batch_stats) are carried through the sweep."""
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
        n = batch.action.shape[0]
        n_minibatches = n // cfg.minibatch_size

        def epoch_body(carry, perm):
            params, extra, opt_state = carry
            mb_indices = perm[: n_minibatches * cfg.minibatch_size].reshape(
                n_minibatches, cfg.minibatch_size
            )

            def mb_body(carry, idx):
                params, extra, opt_state = carry
                mb = jax.tree.map(lambda x: x[idx], batch)
                grads, (stats, extra) = grad_fn(params, extra, mb)
                if grad_reduce is not None:
                    grads = grad_reduce(grads)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, extra, opt_state), stats

            (params, extra, opt_state), stats = jax.lax.scan(
                mb_body, (params, extra, opt_state), mb_indices
            )
            return (params, extra, opt_state), stats

        (params, extra, opt_state), stats = jax.lax.scan(
            epoch_body,
            (params, extra, opt_state),
            epoch_permutations(key, n, cfg.n_epochs),
        )
        mean_stats = jax.tree.map(jnp.mean, stats)
        return {"params": params, **extra}, opt_state, mean_stats

    return update

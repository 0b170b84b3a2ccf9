"""GAE as ONE Pallas kernel.

The lax implementation (``train/gae.py``) is a reverse ``lax.scan`` whose
128 iterations each do ~6 elementwise ops on (B,) vectors — per-iteration
launch overhead dwarfs the arithmetic (~2.7 ms of the 6x6/512 training
iteration).  Here the whole (T, B) problem sits in VMEM (T*B*4 bytes per
array — 256KB at the headline shape) and the backward recurrence unrolls
into straight-line vector code: identical operation order to the lax scan
(SB3's ``compute_returns_and_advantage`` recurrence, same floating-point
sequencing), ~tens of microseconds on a v5e.

Used automatically by ``SelfplayPPO`` on TPU when ``n_steps`` is small
enough to unroll (the throughput shapes); the lax path remains for long
rollouts (e.g. the strict n_steps=2048 presets, where per-iteration
latency is already amortized by tiny batch width) and non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# largest n_steps the kernel fully unrolls (6 vector ops per step; past
# this the straight-line code stops paying for its compile time)
MAX_UNROLL_STEPS = 256


def _gae_kernel(T, gamma, lam, rew_ref, val_ref, done_ref, lastv_ref, o_adv, o_ret):
    adv = jnp.zeros_like(lastv_ref[:])  # (1, B)
    next_v = lastv_ref[:]
    g = jnp.float32(gamma)
    gl = jnp.float32(gamma * lam)
    for t in reversed(range(T)):
        r = rew_ref[t : t + 1, :]
        v = val_ref[t : t + 1, :]
        nt = 1.0 - done_ref[t : t + 1, :].astype(jnp.float32)
        delta = r + g * next_v * nt - v
        adv = delta + gl * nt * adv
        o_adv[t : t + 1, :] = adv
        o_ret[t : t + 1, :] = adv + v
        next_v = v


def compute_gae(
    rewards: jnp.ndarray,  # (T, B) float32
    values: jnp.ndarray,  # (T, B) float32
    dones: jnp.ndarray,  # (T, B) bool
    last_values: jnp.ndarray,  # (B,) float32
    gamma: float,
    gae_lambda: float,
    interpret: bool = False,
):
    """Drop-in replacement for ``train.gae.compute_gae`` (same recurrence,
    same operation order; equality pinned by ``tests/test_pallas_gae.py``)."""
    T, B = rewards.shape
    if T > MAX_UNROLL_STEPS:
        raise ValueError(f"n_steps {T} exceeds unroll cap {MAX_UNROLL_STEPS}")

    def const_spec(x):
        return pl.BlockSpec(x.shape, lambda: (0,) * x.ndim, memory_space=pltpu.VMEM)

    inputs = [
        rewards,
        values,
        dones.astype(jnp.int32),
        last_values.reshape(1, B),
    ]
    out_shape = (
        jax.ShapeDtypeStruct((T, B), jnp.float32),
        jax.ShapeDtypeStruct((T, B), jnp.float32),
    )
    adv, ret = pl.pallas_call(
        functools.partial(_gae_kernel, T, gamma, gae_lambda),
        in_specs=[const_spec(x) for x in inputs],
        out_specs=tuple(const_spec(jnp.zeros((T, B), jnp.float32)) for _ in range(2)),
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    return adv, ret

"""Pallas GAE kernel == the lax reverse-scan recurrence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hex_gym_env_tpu.ops import pallas_gae
from hex_gym_env_tpu.train import gae


@pytest.mark.parametrize("T,B", [(16, 8), (128, 32)])
def test_pallas_gae_matches_lax(T, B):
    k = jax.random.split(jax.random.key(0), 4)
    rewards = jnp.where(
        jax.random.uniform(k[0], (T, B)) < 0.1,
        jnp.sign(jax.random.normal(k[1], (T, B))), 0.0,
    )
    values = jax.random.normal(k[1], (T, B)) * 0.5
    dones = jax.random.uniform(k[2], (T, B)) < 0.15
    last_values = jax.random.normal(k[3], (B,)) * 0.5

    adv_l, ret_l = jax.jit(
        lambda *a: gae.compute_gae(*a, 0.99, 0.95)
    )(rewards, values, dones, last_values)
    adv_p, ret_p = jax.jit(
        lambda *a: pallas_gae.compute_gae(*a, 0.99, 0.95, interpret=True)
    )(rewards, values, dones, last_values)

    np.testing.assert_allclose(np.asarray(adv_p), np.asarray(adv_l), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ret_p), np.asarray(ret_l), rtol=1e-6, atol=1e-6)


def test_unroll_cap():
    with pytest.raises(ValueError):
        pallas_gae.compute_gae(
            jnp.zeros((512, 4)), jnp.zeros((512, 4)),
            jnp.zeros((512, 4), bool), jnp.zeros((4,)), 0.99, 0.95,
            interpret=True,
        )

"""Batched random mid-game start positions (the reference's ``sample_board``).

Distributionally mirrors ``HexEnv.random_board`` (``minihex/HexSingleGame.py:
300-331``): pick a random m x l submatrix (m, l ~ U{n//4, ..., n-2}) at a
random offset, fill an even total of stones (between ~50% and 100% of the
submatrix, rounded down to even) half -1 / half +1 uniformly shuffled, leave
the rest empty.  An even stone count keeps seat 0 ("black") to move.

The reference draws from the *global* unseeded numpy RNG; this framework's
PRNG contract is explicit ``jax.random`` keys (documented in
``tests/test_parity.py``), so samples here are reproducible but not
bit-identical to any particular numpy run — there is nothing to be
bit-identical to, since the reference never seeds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hex_gym_env_tpu.core.topology import HexTopology


def sample_boards(key: jax.Array, topo: HexTopology, batch: int) -> jnp.ndarray:
    """Sample (B, N, N) int8 world-frame boards, seat 0 to move."""
    n = topo.n

    def one(k):
        k_m, k_l, k_r, k_c, k_u, k_perm = jax.random.split(k, 6)
        lo = n // 4
        hi = max(n - 1, lo + 1)  # numpy randint(lo, n-1) upper-exclusive
        m = jax.random.randint(k_m, (), lo, hi)
        l = jax.random.randint(k_l, (), lo, hi)
        sr = jax.random.randint(k_r, (), 0, n - m + 1)
        sc = jax.random.randint(k_c, (), 0, n - l + 1)

        ys = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        member = (ys >= sr) & (ys < sr + m) & (xs >= sc) & (xs < sc + l)
        member = member.reshape(n * n)

        u = jax.random.uniform(k_u, ())
        total = (m * l).astype(jnp.float32)
        nonzero = (jnp.floor(total * (0.5 + 0.5 * u) / 2.0) * 2.0).astype(jnp.int32)
        n_black = nonzero // 2  # == nonzero - n_black: equal halves

        # Uniformly assign ranks 0..(m*l-1) to submatrix cells; rank < n_black
        # becomes -1, rank < nonzero becomes +1, the rest stay empty.  This is
        # exactly a uniform shuffle of the reference's value multiset.
        scores = jax.random.uniform(k_perm, (n * n,))
        scores = jnp.where(member, scores, jnp.inf)
        order = jnp.argsort(scores)
        ranks = jnp.zeros((n * n,), jnp.int32).at[order].set(jnp.arange(n * n))
        vals = jnp.where(
            member & (ranks < n_black),
            jnp.int8(-1),
            jnp.where(member & (ranks < nonzero), jnp.int8(1), jnp.int8(0)),
        )
        return vals.reshape(n, n)

    return jax.vmap(one)(jax.random.split(key, batch))

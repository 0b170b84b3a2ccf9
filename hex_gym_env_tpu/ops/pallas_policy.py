"""Fused policy-pass kernels for the selfplay rollout.

The rollout scan body (``train/rollout.py``) is latency-bound: the agent
forward + masked sample, and the opponent-bank forward + select + sample,
each compile to ~20 small XLA kernels whose fixed per-kernel cost dwarfs the
microseconds of actual GEMM work at reference scales (B<=1024, ~12.5k-param
MLPs).  These two kernels collapse each policy pass into ONE Pallas launch.

Agent kernel — packed-tower MLP forward (the ``[W_pi | W_vf]`` 128-lane
packing of ``ops/pallas_ppo``), masked logits, Gumbel-max sample, log-prob
of the sampled action, and the value — one launch per scan step.

Opponent-bank kernel — the TPU-native replacement for the per-member vmap
pass (``rollout.py`` "dense forward over the whole batch").  All P pool
members + the designated best are stacked side-by-side along the lane axis:

  layer 1:  h1_all = x @ [W1_0 | W1_1 | ... | W1_P]      one (B, F)x(F, P1*H)
  select :  zero every 64-lane window except env's member  (one vector mask)
  layer l:  tile h (B, H) across the P1 windows, re-mask, and multiply the
            vertically stacked [W_l_0; ...; W_l_P] (P1*H, H) — the zeroed
            windows contribute nothing, so one full-width MXU matmul computes
            a *different* member's GEMM for every row of the batch.
  head   :  same trick into (P1*H, A); per-member biases via a one-hot GEMM.

Sampling uses the TPU hardware PRNG (``pltpu.prng_random_bits``) with the
classic Gumbel-max construction — the same masked-categorical distribution
as ``ops/masked.sample`` (sb3_contrib ``MaskableCategorical``), on an
independent stream.  On CPU (tests) the kernels run in interpreter mode with
the random bits fed as an input, making every draw reproducible and directly
comparable against the lax reference (``tests/test_pallas_policy.py``).

Reference behavior being reproduced: agent move + opponent reply through the
wrapped env (``minihex/SelfplayWrapper.py:174-199``), opponent stochastic
with action masks (``SelfplayWrapper.py:30-32``).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hex_gym_env_tpu.ops.masked import MASKED_LOGIT
from hex_gym_env_tpu.ops.pallas_ppo import _pack_params

# largest stacked-bank lane width the kernels will pack: (P+1)*H <= MAX_LANES.
# VMEM check at the cap (H=64, A<=121, f32): stacked tensors ~5.3MB (the
# (LW, H) / (LW, A) stacks lane-pad to 128) + a (256, LW) activation slab
# ~4.4MB — comfortably inside the 16MB budget for the standalone bank kernel;
# the whole-rollout kernel (ops/pallas_rollout.py) additionally row-chunks
# its activation slabs to 128 rows.  Notably this admits the reference's
# buffer_size=64 experiments ((64+1)*64 = 4160).
MAX_LANES = 4224


def _seed_scalar(key: jax.Array) -> jnp.ndarray:
    """Expose a typed PRNG key as a (2,) int32 hardware-PRNG seed.

    Both key words are passed through so kernels can seed with the full
    64 bits (``pltpu.prng_seed(w0, w1, ...)`` mixes all arguments); folding
    to 32 bits risked birthday collisions across the tens of millions of
    launches in a long run, and block seeds derived as small additive
    offsets could overlap between adjacent launches.  Kernels additionally
    mix ``program_id`` via a multiplicative hash (see ``_block_seed``)."""
    data = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    w0 = jax.lax.bitcast_convert_type(data[0], jnp.int32)
    w1 = jax.lax.bitcast_convert_type(data[-1], jnp.int32)
    return jnp.stack([w0, w1])


def _block_seed(stream: int) -> jnp.ndarray:
    """Per-block seed contribution: multiplicative hash of the grid position
    (+ a per-kernel stream constant) so adjacent blocks / adjacent launches
    never land on overlapping hardware-PRNG streams.  XORed into seed word 0
    (Mosaic caps ``prng_seed`` at two values)."""
    return (pl.program_id(0) + jnp.int32(stream)) * jnp.int32(-1640531527)  # 2654435769 = golden-ratio hash


def _pick_block(B: int, block: int) -> int:
    """Largest divisor of ``B`` that is <= the requested block size and a
    multiple of 8 (fp32 sublane); falls back to ``B`` itself only when no
    such divisor exists.  Grabbing the whole batch as one block (the old
    fallback) could blow the VMEM budget for large odd-sized batches."""
    if B % block == 0:
        return block
    for b in range(min(block, B), 7, -1):
        if B % b == 0 and b % 8 == 0:
            return b
    return B


def _gumbel(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 bits -> standard Gumbel noise, Mosaic-safe.

    uint32->f32 casts don't lower on TPU; shift to the non-negative top-24-bit
    range, bitcast to int32, then scale into the open interval (0, 1).
    """
    ub = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32).astype(jnp.float32)
    u = ub * jnp.float32(2.0**-24) + jnp.float32(2.0**-25)
    return -jnp.log(-jnp.log(u))


def _sample_row(masked: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Gumbel-max draw per row ((B, A) -> (B, 1) int32).

    Equivalent in distribution to ``jax.random.categorical`` over the masked
    logits: illegal entries sit at float32 min, and max Gumbel noise (~+38)
    cannot lift them above any legal entry.
    """
    return jnp.argmax(masked + g, axis=1, keepdims=True).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Agent kernel: packed forward + sample + log-prob + value
# ---------------------------------------------------------------------------


def _agent_kernel(n_layers, H, A, activation, use_device_prng, *refs):
    if use_device_prng:
        seed_ref, obs_ref, legal_ref = refs[:3]
        rest = refs[3:]
        pltpu.prng_seed(seed_ref[0] ^ _block_seed(stream=1), seed_ref[1])
        bits_ref = None
    else:
        seed_ref, obs_ref, legal_ref, bits_ref = refs[:4]
        rest = refs[4:]
    n_t = 2 * (n_layers + 1)
    P = [r[:] for r in rest[:n_t]]
    o_action, o_logp, o_value, o_logits = rest[n_t : n_t + 4]

    act = jnp.tanh if activation == "tanh" else (lambda x: jnp.maximum(x, 0.0))

    x = obs_ref[:].astype(jnp.float32)  # (B, F)
    legal = legal_ref[:]  # (B, A) int32

    h = x
    for li in range(n_layers):
        h = act(jnp.dot(h, P[2 * li], preferred_element_type=jnp.float32) + P[2 * li + 1])
    head = jnp.dot(h, P[2 * n_layers], preferred_element_type=jnp.float32) + P[2 * n_layers + 1]
    logits = head[:, :A]
    value = head[:, A : A + 1]

    masked = jnp.where(legal > 0, logits, MASKED_LOGIT)
    if use_device_prng:
        bits = pltpu.bitcast(pltpu.prng_random_bits(masked.shape), jnp.uint32)
    else:
        bits = bits_ref[:]
    action = _sample_row(masked, _gumbel(bits))

    zmax = jnp.max(masked, axis=1, keepdims=True)
    z = masked - zmax
    lse = jnp.log(jnp.sum(jnp.exp(z), axis=1, keepdims=True))
    lane = jax.lax.broadcasted_iota(jnp.int32, masked.shape, 1)
    onehot = lane == action
    logp = jnp.sum(jnp.where(onehot, z - lse, 0.0), axis=1, keepdims=True)

    o_action[:] = action
    o_logp[:] = logp
    o_value[:] = value
    o_logits[:] = masked


class AgentActResult(NamedTuple):
    action: jnp.ndarray  # (B,) int32
    log_prob: jnp.ndarray  # (B,) float32
    value: jnp.ndarray  # (B,) float32
    masked_logits: jnp.ndarray  # (B, A) float32 — post-mask (diagnostics/eval)


def agent_forward_sample(
    packed: list,
    n_layers: int,
    H: int,
    A: int,
    activation: str,
    obs_flat: jnp.ndarray,  # (B, F) any int/float dtype
    legal: jnp.ndarray,  # (B, A) bool
    key: jax.Array,
    *,
    block: int = 1024,
    interpret: bool = False,
) -> AgentActResult:
    """One launch: agent MLP forward, masked Gumbel sample, logp, value."""
    B, F = obs_flat.shape
    block = _pick_block(B, block)

    def const_spec(x):
        return pl.BlockSpec(x.shape, lambda i, *_: (0,) * x.ndim, memory_space=pltpu.VMEM)

    def row_spec(w):
        return pl.BlockSpec((block, w), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)

    in_specs = [row_spec(F), row_spec(A)]
    inputs = [obs_flat.astype(jnp.int32), legal.astype(jnp.int32)]
    if interpret:
        bits = jax.random.bits(key, (B, A), jnp.uint32)
        in_specs.append(row_spec(A))
        inputs.append(bits)
    in_specs += [const_spec(x) for x in packed]

    out_specs = (row_spec(1), row_spec(1), row_spec(1), row_spec(A))
    out_shape = (
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, A), jnp.float32),
    )
    kernel = functools.partial(
        _agent_kernel, n_layers, H, A, activation, not interpret
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B // block,), in_specs=in_specs,
        out_specs=out_specs,
    )
    action, logp, value, masked = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret
    )(_seed_scalar(key), *inputs, *packed)
    return AgentActResult(action[:, 0], logp[:, 0], value[:, 0], masked)


# ---------------------------------------------------------------------------
# Opponent-bank kernel: stacked members, per-row member selection
# ---------------------------------------------------------------------------


class StackedBank(NamedTuple):
    """Bank + best packed for the window-mask kernel (index P == best)."""

    tensors: list  # [W1s (F,LW), b1s (1,LW), (Wls (LW,H), bls (P1c,H))..., Whs (LW,A), bhs (P1c,A)]
    n_members: int  # P1 = bank size + 1 (best)
    lanes: int  # LW = P1*H padded up to a multiple of 128


def stack_bank_tensors(bank_and_best: Any, n_layers: int, H: int, A: int) -> StackedBank:
    """Stack a (P1, ...)-leaf params tree (bank members + best appended) into
    the side-by-side / vertically-stacked tensors the kernel consumes."""
    tree = bank_and_best
    P1 = tree["pi_0"]["kernel"].shape[0]
    LW = -(-(P1 * H) // 128) * 128
    P1c = -(-P1 // 8) * 8  # sublane-pad the per-member bias stacks

    def pad_cols(x, w):
        return jnp.pad(x, ((0, 0), (0, w - x.shape[1])))

    def pad_rows(x, h):
        return jnp.pad(x, ((0, h - x.shape[0]), (0, 0)))

    W1 = tree["pi_0"]["kernel"].astype(jnp.float32)  # (P1, F, H)
    F = W1.shape[1]
    tensors = [
        pad_cols(W1.transpose(1, 0, 2).reshape(F, P1 * H), LW),
        pad_cols(tree["pi_0"]["bias"].astype(jnp.float32).reshape(1, P1 * H), LW),
    ]
    for li in range(1, n_layers):
        Wl = tree[f"pi_{li}"]["kernel"].astype(jnp.float32)  # (P1, H, H)
        bl = tree[f"pi_{li}"]["bias"].astype(jnp.float32)  # (P1, H)
        tensors += [pad_rows(Wl.reshape(P1 * H, H), LW), pad_rows(bl, P1c)]
    Wh = tree["action_head"]["kernel"].astype(jnp.float32)  # (P1, H, A)
    bh = tree["action_head"]["bias"].astype(jnp.float32)  # (P1, A)
    tensors += [pad_rows(Wh.reshape(P1 * H, A), LW), pad_rows(bh, P1c)]
    return StackedBank(tensors=tensors, n_members=P1, lanes=LW)


def _bank_kernel(n_layers, H, A, P1, P1c, LW, activation, use_device_prng, *refs):
    if use_device_prng:
        seed_ref, obs_ref, legal_ref, idx_ref = refs[:4]
        rest = refs[4:]
        pltpu.prng_seed(seed_ref[0] ^ _block_seed(stream=2), seed_ref[1])
        bits_ref = None
    else:
        seed_ref, obs_ref, legal_ref, idx_ref, bits_ref = refs[:5]
        rest = refs[5:]
    n_t = 2 * (n_layers + 1)
    T = [r[:] for r in rest[:n_t]]
    o_action, o_logits = rest[n_t : n_t + 2]

    act = jnp.tanh if activation == "tanh" else (lambda x: jnp.maximum(x, 0.0))

    x = obs_ref[:].astype(jnp.float32)  # (B, F)
    legal = legal_ref[:]  # (B, A) int32
    idx = idx_ref[:]  # (B, 1) int32 — member index, P1-1 == best
    B = x.shape[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (B, LW), 1)
    window = (col // H) == idx  # (B, LW): env's member lanes only

    # per-member bias rows, selected with a one-hot GEMM (B, P1c)@(P1c, ·)
    onehot_m = (
        jax.lax.broadcasted_iota(jnp.int32, (B, P1c), 1) == idx
    ).astype(jnp.float32)

    # layer 1: every member's h1 side-by-side, then keep the env's window
    h_all = jnp.dot(x, T[0], preferred_element_type=jnp.float32) + T[1]
    h = act(jnp.where(window, h_all, 0.0))  # (B, LW); act(0)=0 for tanh/relu
    for li in range(1, n_layers):
        Wl, bl = T[2 * li], T[2 * li + 1]
        z = jnp.dot(h, Wl, preferred_element_type=jnp.float32)  # (B, H)
        z = z + jnp.dot(onehot_m, bl, preferred_element_type=jnp.float32)
        hc = act(z)  # (B, H) compact
        tiled = jnp.concatenate(
            [hc] * P1 + ([jnp.zeros((B, LW - P1 * H), jnp.float32)] if LW > P1 * H else []),
            axis=1,
        )
        h = jnp.where(window, tiled, 0.0)
    Wh, bh = T[2 * n_layers], T[2 * n_layers + 1]
    logits = jnp.dot(h, Wh, preferred_element_type=jnp.float32)
    logits = logits + jnp.dot(onehot_m, bh, preferred_element_type=jnp.float32)

    masked = jnp.where(legal > 0, logits, MASKED_LOGIT)
    if use_device_prng:
        bits = pltpu.bitcast(pltpu.prng_random_bits(masked.shape), jnp.uint32)
    else:
        bits = bits_ref[:]
    o_action[:] = _sample_row(masked, _gumbel(bits))
    o_logits[:] = masked


def bank_forward_sample(
    stacked: StackedBank,
    n_layers: int,
    H: int,
    A: int,
    activation: str,
    obs_flat: jnp.ndarray,  # (B, F)
    legal: jnp.ndarray,  # (B, A) bool
    member_idx: jnp.ndarray,  # (B,) int32 — pool slot, or P for the best
    key: jax.Array,
    *,
    block: int = 256,
    interpret: bool = False,
):
    """One launch: selected bank member's forward + masked sample per row.

    Returns ``(action (B,) int32, masked_logits (B, A) float32)``.
    """
    B, F = obs_flat.shape
    block = _pick_block(B, block)
    P1, LW = stacked.n_members, stacked.lanes
    P1c = stacked.tensors[-1].shape[0]

    def const_spec(x):
        return pl.BlockSpec(x.shape, lambda i, *_: (0,) * x.ndim, memory_space=pltpu.VMEM)

    def row_spec(w):
        return pl.BlockSpec((block, w), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)

    in_specs = [row_spec(F), row_spec(A), row_spec(1)]
    inputs = [
        obs_flat.astype(jnp.int32),
        legal.astype(jnp.int32),
        member_idx.astype(jnp.int32)[:, None],
    ]
    if interpret:
        bits = jax.random.bits(key, (B, A), jnp.uint32)
        in_specs.append(row_spec(A))
        inputs.append(bits)
    in_specs += [const_spec(x) for x in stacked.tensors]

    out_specs = (row_spec(1), row_spec(A))
    out_shape = (
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, A), jnp.float32),
    )
    kernel = functools.partial(
        _bank_kernel, n_layers, H, A, P1, P1c, LW, activation, not interpret
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B // block,), in_specs=in_specs,
        out_specs=out_specs,
    )
    action, masked = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret
    )(_seed_scalar(key), *inputs, *stacked.tensors)
    return action[:, 0], masked


# ---------------------------------------------------------------------------
# Runner-facing gate + convenience wrapper
# ---------------------------------------------------------------------------


class PolicyOps:
    """Pre-resolved shapes + packing helpers for one (model, bank-size)."""

    def __init__(self, model, interpret: bool):
        import flax.linen as nn

        self.n_layers = len(model.pi_layers)
        self.H = model.pi_layers[0]
        self.A = model.n_actions
        self.activation = "relu" if model.activation is nn.relu else "tanh"
        self.interpret = interpret

    def pack_agent(self, params: dict) -> list:
        return _pack_params(params, self.n_layers, self.H, self.A)

    def stack_bank(self, bank) -> StackedBank:
        merged = jax.tree.map(
            lambda m, b: jnp.concatenate([m, b[None]], axis=0),
            bank.params,
            bank.best_params,
        )
        if "params" in merged:  # bank members are flax variable dicts
            merged = merged["params"]
        return stack_bank_tensors(merged, self.n_layers, self.H, self.A)

    def agent_act(self, packed, obs, legal, key) -> AgentActResult:
        obs_flat = obs.reshape(obs.shape[0], -1)
        return agent_forward_sample(
            packed, self.n_layers, self.H, self.A, self.activation,
            obs_flat, legal, key, interpret=self.interpret,
        )

    def bank_act(self, stacked, use_best, opp_idx, obs, legal, key):
        obs_flat = obs.reshape(obs.shape[0], -1)
        idx = jnp.where(use_best, stacked.n_members - 1, opp_idx)
        return bank_forward_sample(
            stacked, self.n_layers, self.H, self.A, self.activation,
            obs_flat, legal, idx, key, interpret=self.interpret,
        )


def supported(model, buffer_size: int) -> bool:
    """True when the fused policy pass can drive this model + bank size."""
    from hex_gym_env_tpu.ops import pallas_ppo

    if not pallas_ppo.supported_policy(model):
        return False
    H = model.pi_layers[0]
    return (buffer_size + 1) * H <= MAX_LANES


def resolve_policy_ops(model, cfg) -> PolicyOps | None:
    """Gate for ``SelfplayConfig.policy_impl`` ('auto'|'lax'|'pallas')."""
    impl = getattr(cfg, "policy_impl", "auto")
    if impl not in ("auto", "lax", "pallas"):
        raise ValueError(
            f"policy_impl must be one of 'auto'/'lax'/'pallas', got {impl!r}"
        )
    if impl == "lax":
        return None
    on_tpu = jax.default_backend() == "tpu"
    if impl == "auto" and not on_tpu:
        return None
    if not supported(model, cfg.buffer_size):
        if impl == "pallas":
            raise ValueError(
                "policy_impl='pallas' requires a plain equal-tower MlpPolicy "
                f"and (buffer_size+1)*H <= {MAX_LANES}"
            )
        return None
    return PolicyOps(model, interpret=not on_tpu)

"""SB3 one-update numerical parity (SURVEY.md §7 hard parts; VERDICT r1 #1).

Loads the reference's shipped checkpoint
``/root/reference/models/6x6_buffer_64_10.zip`` into BOTH learners:

- the flax/optax PPO in ``hex_gym_env_tpu.train.ppo``;
- an independent torch restatement of SB3 ``MaskablePPO.train``
  (``tests/sb3_torch.py``) — torch Adam, torch grad clip, torch masking.

Both are fed the identical rollout batch and the identical
minibatch-permutation sequence, and must agree on GAE, normalized
advantages, loss terms, gradients, and the parameters after a full
epochs x minibatches Adam sweep to float32 tolerance.  A subtle
GAE/clip/Adam/normalization mismatch that a strength test could never see
fails loudly here.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hex_gym_env_tpu.models import MlpPolicy
from hex_gym_env_tpu.models.sb3_import import load_sb3_policy_state, sb3_to_mlp_params
from hex_gym_env_tpu.train import gae, ppo
from hex_gym_env_tpu.utils.config import PPOConfig

from tests.sb3_torch import TorchMlpPolicy, sb3_gae, sb3_update

CKPT = "/root/reference/models/6x6_buffer_64_10.zip"
N = 6
A = N * N
T, B = 16, 16  # rollout shape; n = 256 = 4 minibatches of 64

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="reference checkpoint not available"
)


def _torch_policy():
    return TorchMlpPolicy(load_sb3_policy_state(CKPT), A)


def _flax_variables():
    return jax.tree.map(jnp.asarray, sb3_to_mlp_params(CKPT))


def _rollout_batch(seed=0):
    """Synthetic but realistic rollout: random mid-game boards, legal-move
    actions, old log-probs/values from the checkpoint policy itself (as they
    would be at collection time)."""
    import torch

    rng = np.random.default_rng(seed)
    n = T * B
    boards = rng.choice(
        np.array([-1, 0, 1], np.int8), size=(n, N, N), p=[0.35, 0.3, 0.35]
    )
    # every board needs >= 1 empty cell
    flat_idx = rng.integers(0, A, n)
    boards.reshape(n, A)[np.arange(n), flat_idx] = 0
    legal = boards.reshape(n, A) == 0
    # one uniform-random legal action per row
    u = rng.random((n, A))
    actions = np.argmax(np.where(legal, u, -1.0), axis=1).astype(np.int32)

    policy = _torch_policy()
    with torch.no_grad():
        values, log_prob, _ = policy.evaluate_actions(
            torch.as_tensor(boards.astype(np.float32)),
            torch.as_tensor(actions.astype(np.int64)),
            torch.as_tensor(legal),
        )
    dones = rng.random((T, B)) < 0.15
    rewards = np.where(
        dones, rng.choice(np.array([-1.0, 1.0], np.float32), (T, B)), 0.0
    ).astype(np.float32)
    last_values = values.numpy().reshape(T, B)[0]  # any plausible (B,) values
    return {
        "obs": boards.astype(np.float32),
        "masks": legal,
        "actions": actions,
        "old_log_prob": log_prob.numpy(),
        "values": values.numpy().reshape(T, B),
        "rewards": rewards,
        "dones": dones,
        "last_values": last_values,
    }


def _flax_param_view(torch_named: dict) -> dict:
    """Map torch parameter names/layout onto the flax params tree."""
    out = {}
    i = 0
    while f"policy_net.{2 * i}.weight" in torch_named:
        out[f"pi_{i}"] = {
            "kernel": torch_named[f"policy_net.{2 * i}.weight"].T,
            "bias": torch_named[f"policy_net.{2 * i}.bias"],
        }
        out[f"vf_{i}"] = {
            "kernel": torch_named[f"value_net_tower.{2 * i}.weight"].T,
            "bias": torch_named[f"value_net_tower.{2 * i}.bias"],
        }
        i += 1
    out["action_head"] = {
        "kernel": torch_named["action_net.weight"].T,
        "bias": torch_named["action_net.bias"],
    }
    out["value_head"] = {
        "kernel": torch_named["value_net.weight"].T,
        "bias": torch_named["value_net.bias"],
    }
    return out


def test_forward_parity_on_checkpoint():
    import torch

    batch = _rollout_batch()
    model = MlpPolicy(n_actions=A)
    variables = _flax_variables()
    logits_j, values_j = jax.jit(model.apply)(variables, jnp.asarray(batch["obs"]))
    policy = _torch_policy()
    with torch.no_grad():
        logits_t, values_t = policy(torch.as_tensor(batch["obs"]))
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.numpy(), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(values_j), values_t.numpy(), rtol=1e-5, atol=1e-5
    )


def test_gae_parity():
    batch = _rollout_batch()
    cfg = PPOConfig()
    adv_ref, ret_ref = sb3_gae(
        batch["rewards"], batch["values"], batch["dones"], batch["last_values"],
        cfg.gamma, cfg.gae_lambda,
    )
    adv_j, ret_j = jax.jit(
        lambda r, v, d, lv: gae.compute_gae(r, v, d, lv, cfg.gamma, cfg.gae_lambda)
    )(
        jnp.asarray(batch["rewards"]), jnp.asarray(batch["values"]),
        jnp.asarray(batch["dones"]), jnp.asarray(batch["last_values"]),
    )
    np.testing.assert_allclose(np.asarray(adv_j), adv_ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ret_j), ret_ref, rtol=1e-6, atol=1e-6)


def _ppo_batch(batch, adv, ret):
    def flat(x):
        return np.asarray(x).reshape((-1,) + np.asarray(x).shape[2:])

    return ppo.PPOBatch(
        obs=jnp.asarray(batch["obs"]),
        legal=jnp.asarray(batch["masks"]),
        action=jnp.asarray(batch["actions"]),
        log_prob_old=jnp.asarray(batch["old_log_prob"]),
        value_old=jnp.asarray(batch["values"].reshape(-1)),
        advantage=jnp.asarray(flat(adv)),
        ret=jnp.asarray(flat(ret)),
    )


def test_sb3_update_parity():
    """Gradients, loss terms, and the post-sweep parameters agree."""
    cfg = PPOConfig(minibatch_size=64, n_epochs=2)  # 8 sequential Adam steps
    batch = _rollout_batch()
    adv, ret = sb3_gae(
        batch["rewards"], batch["values"], batch["dones"], batch["last_values"],
        cfg.gamma, cfg.gae_lambda,
    )
    n = T * B

    model = MlpPolicy(n_actions=A)
    variables = _flax_variables()
    pbatch = _ppo_batch(batch, adv, ret)

    # --- replicate the exact permutation stream make_update_fn will draw
    # (ppo.epoch_permutations — the shared generator of every sweep backend)
    key = jax.random.key(7)
    n_mb = n // cfg.minibatch_size
    perms = np.asarray(ppo.epoch_permutations(key, n, cfg.n_epochs))
    idx_rows = perms[:, : n_mb * cfg.minibatch_size].reshape(
        cfg.n_epochs * n_mb, cfg.minibatch_size
    )

    # --- first-minibatch loss + gradient parity ---
    loss_fn = ppo.make_loss_fn(model, cfg)
    mb = jax.tree.map(lambda x: x[jnp.asarray(idx_rows[0])], pbatch)
    grads_j, (stats0, _) = jax.jit(
        lambda p, m: jax.grad(loss_fn, has_aux=True)(p, {}, m)
    )(variables["params"], mb)

    policy = _torch_policy()
    torch_batch = dict(batch, advantages=adv.reshape(-1), returns=ret.reshape(-1))
    torch_stats = sb3_update(
        policy, torch_batch, idx_rows,
        learning_rate=cfg.learning_rate, clip_range=cfg.clip_range,
        ent_coef=cfg.ent_coef, vf_coef=cfg.vf_coef,
        max_grad_norm=cfg.max_grad_norm,
    )
    assert abs(float(stats0.policy_loss) - torch_stats[0]["policy_loss"]) < 1e-5
    assert abs(float(stats0.value_loss) - torch_stats[0]["value_loss"]) < 1e-4
    assert abs(float(stats0.entropy) - torch_stats[0]["entropy"]) < 1e-5

    grads_ref = _flax_param_view(torch_stats[0]["grads"])
    flat_j, tree_j = jax.tree_util.tree_flatten_with_path(grads_j)
    for path, leaf in flat_j:
        ref = grads_ref
        for p in path:
            ref = ref[p.key]
        np.testing.assert_allclose(
            np.asarray(leaf), ref, rtol=5e-4, atol=1e-6,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(path)}",
        )

    # --- full-sweep parameter parity (2 epochs x 4 minibatches of Adam) ---
    optimizer = ppo.make_optimizer(cfg)
    update = ppo.make_update_fn(model, cfg, optimizer)
    new_vars, _, _ = jax.jit(update)(
        variables, optimizer.init(variables["params"]), pbatch, key
    )
    params_ref = _flax_param_view(
        {name: p.detach().numpy() for name, p in policy.named_parameters()}
    )
    flat_j, _ = jax.tree_util.tree_flatten_with_path(new_vars["params"])
    for path, leaf in flat_j:
        ref = params_ref
        for p in path:
            ref = ref[p.key]
        np.testing.assert_allclose(
            np.asarray(leaf), ref, rtol=1e-4, atol=5e-6,
            err_msg=f"param mismatch after sweep at {jax.tree_util.keystr(path)}",
        )

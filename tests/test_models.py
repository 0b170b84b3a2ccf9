"""Model-layer tests: SB3 checkpoint forward parity, masked distribution."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hex_gym_env_tpu.models import MlpPolicy, CnnPolicy, make_policy
from hex_gym_env_tpu.models.sb3_import import (
    load_sb3_policy_state,
    sb3_to_mlp_params,
    sb3_num_hidden_layers,
)
from hex_gym_env_tpu.ops import masked

SB3_CKPT = "/root/reference/models/6x6_buffer_64_10.zip"


def numpy_sb3_forward(sd, obs_flat):
    """Independent numpy evaluation of the SB3 MlpPolicy state dict."""
    pi = obs_flat
    vf = obs_flat
    i = 0
    while f"mlp_extractor.policy_net.{2 * i}.weight" in sd:
        pi = np.tanh(pi @ sd[f"mlp_extractor.policy_net.{2 * i}.weight"].T
                     + sd[f"mlp_extractor.policy_net.{2 * i}.bias"])
        vf = np.tanh(vf @ sd[f"mlp_extractor.value_net.{2 * i}.weight"].T
                     + sd[f"mlp_extractor.value_net.{2 * i}.bias"])
        i += 1
    logits = pi @ sd["action_net.weight"].T + sd["action_net.bias"]
    value = vf @ sd["value_net.weight"].T + sd["value_net.bias"]
    return logits, value[:, 0]


def test_sb3_checkpoint_forward_parity():
    sd = load_sb3_policy_state(SB3_CKPT)
    params = sb3_to_mlp_params(SB3_CKPT)
    n_hidden = sb3_num_hidden_layers(SB3_CKPT)
    assert n_hidden == 2

    rng = np.random.default_rng(0)
    obs = rng.choice([-1.0, 0.0, 1.0], size=(32, 6, 6)).astype(np.float32)
    model = MlpPolicy(n_actions=36)
    logits, value = model.apply(params, jnp.asarray(obs))
    exp_logits, exp_value = numpy_sb3_forward(sd, obs.reshape(32, -1))
    np.testing.assert_allclose(np.asarray(logits), exp_logits, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(value), exp_value, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("family,n_params_min", [
    ("MLP-default", 5000),
    ("MLP-deep", 5000),
    ("MLP-wide-deep", 20000),
])
def test_mlp_families_shapes(family, n_params_min):
    model = make_policy(family, n_actions=49)
    params = model.init(jax.random.key(0), jnp.zeros((2, 7, 7)))
    logits, value = model.apply(params, jnp.zeros((8, 7, 7)))
    assert logits.shape == (8, 49)
    assert value.shape == (8,)
    count = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    assert count > n_params_min


def test_mlp_default_param_count_matches_reference():
    """6x6 MlpPolicy ~12.5k params (BASELINE.md, decoded from policy.pth)."""
    model = MlpPolicy(n_actions=36)
    params = model.init(jax.random.key(0), jnp.zeros((1, 6, 6)))
    count = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # two towers: 36*64+64 + 64*64+64 each; heads: 64*36+36 + 64*1+1
    expected = 2 * (36 * 64 + 64 + 64 * 64 + 64) + (64 * 36 + 36) + (64 + 1)
    assert count == expected


def test_cnn_policy_shapes_and_batchnorm_modes():
    model = CnnPolicy(n_actions=81)
    variables = model.init(jax.random.key(0), jnp.zeros((2, 9, 9)), train=False)
    assert "batch_stats" in variables
    logits, value = model.apply(variables, jnp.ones((4, 9, 9)), train=False)
    assert logits.shape == (4, 81) and value.shape == (4,)
    # train mode must update batch_stats via the mutable collection
    (logits2, _), updates = model.apply(
        variables, jnp.ones((4, 9, 9)), train=True, mutable=["batch_stats"]
    )
    changed = jax.tree.map(
        lambda a, b: bool(jnp.any(a != b)),
        variables["batch_stats"],
        updates["batch_stats"],
    )
    assert any(jax.tree.leaves(changed))


def test_masked_distribution_semantics():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(5, 9)).astype(np.float32))
    legal = jnp.asarray(rng.random((5, 9)) < 0.5)
    legal = legal.at[:, 0].set(True)  # at least one legal everywhere

    p = np.asarray(masked.probs(logits, legal))
    assert np.all(p[~np.asarray(legal)] == 0.0)
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-6)

    # log_prob consistent with probs
    actions = jnp.argmax(jnp.asarray(p), axis=-1).astype(jnp.int32)
    lp = np.asarray(masked.log_prob(logits, legal, actions))
    np.testing.assert_allclose(lp, np.log(p.max(-1)), rtol=1e-5)

    # entropy: only legal terms contribute
    ent = np.asarray(masked.entropy(logits, legal))
    expected = -np.where(np.asarray(legal), p * np.log(np.clip(p, 1e-30, None)), 0.0).sum(-1)
    np.testing.assert_allclose(ent, expected, rtol=1e-5, atol=1e-6)

    # sampling never selects illegal actions
    keys = jax.random.split(jax.random.key(0), 200)
    samples = jax.vmap(lambda k: masked.sample(k, logits, legal))(keys)
    samples = np.asarray(samples)
    legal_np = np.asarray(legal)
    for row in range(5):
        assert legal_np[row, samples[:, row]].all()

    # mode picks the highest-probability legal action
    m = np.asarray(masked.mode(logits, legal))
    np.testing.assert_array_equal(m, p.argmax(-1))


def test_single_legal_action_distribution():
    logits = jnp.zeros((1, 4))
    legal = jnp.asarray([[False, False, True, False]])
    assert int(masked.sample(jax.random.key(0), logits, legal)[0]) == 2
    assert float(masked.entropy(logits, legal)[0]) == pytest.approx(0.0, abs=1e-6)
    assert float(masked.log_prob(logits, legal, jnp.array([2]))[0]) == pytest.approx(0.0, abs=1e-6)


def test_cnn_bank_logits_matches_per_member_apply():
    """The grouped-conv stacked bank forward (models/cnn.bank_logits) must
    reproduce vmapped ``model.apply(train=False)`` member-by-member: BN
    folding + feature-grouped convs are a re-association of the same math
    (tolerance: f32 reassociation on ~30-magnitude logits)."""
    from hex_gym_env_tpu.models import cnn as cnn_mod

    n, P, B = 5, 3, 7
    model = CnnPolicy(n_actions=n * n)
    dummy = jnp.zeros((1, n, n), jnp.float32)
    members = [model.init(k, dummy) for k in jax.random.split(jax.random.key(0), P)]

    def perturb(i, m):
        m = jax.tree.map(
            lambda x: x + 0.1 * jax.random.normal(jax.random.key(i), x.shape), m
        )
        return {"params": m["params"],
                "batch_stats": jax.tree.map(jnp.abs, m["batch_stats"])}

    members = [perturb(i, m) for i, m in enumerate(members)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *members)
    obs = jax.random.normal(jax.random.key(9), (B, n, n))

    ref = jnp.stack([model.apply(m, obs)[0] for m in members])
    got = cnn_mod.bank_logits(model, stacked, obs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-4)

    obs_p = jax.random.normal(jax.random.key(10), (P, n, n))
    ref_p = jnp.stack(
        [model.apply(m, obs_p[i : i + 1])[0][0] for i, m in enumerate(members)]
    )
    got_p = cnn_mod.bank_logits(model, stacked, obs_p, paired=True)
    np.testing.assert_allclose(
        np.asarray(got_p), np.asarray(ref_p), rtol=1e-3, atol=1e-4
    )


def test_cnn_gathered_bank_logits_matches_assigned_member_apply():
    """The r5 gathered bank pass (models/cnn.gathered_bank_logits) computes
    only each env's ASSIGNED opponent; its rows must reproduce the assigned
    member's (or the best snapshot's, where use_best) ``model.apply``
    to f32-reassociation tolerance."""
    from hex_gym_env_tpu.models import cnn as cnn_mod

    n, P, B = 5, 3, 8
    model = CnnPolicy(n_actions=n * n)
    dummy = jnp.zeros((1, n, n), jnp.float32)
    keys = jax.random.split(jax.random.key(0), P + 1)
    members = [model.init(k, dummy) for k in keys]

    def perturb(i, m):
        m = jax.tree.map(
            lambda x: x + 0.1 * jax.random.normal(jax.random.key(i), x.shape), m
        )
        return {"params": m["params"],
                "batch_stats": jax.tree.map(jnp.abs, m["batch_stats"])}

    members = [perturb(i, m) for i, m in enumerate(members)]
    best = members[-1]
    members = members[:-1]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *members)
    obs = jax.random.normal(jax.random.key(9), (B, n, n))
    opp_idx = jnp.asarray([0, 1, 2, 2, 1, 0, 2, 1], jnp.int32)
    use_best = jnp.asarray([False, True, False, False, True, False, False, True])

    got = cnn_mod.gathered_bank_logits(
        model, stacked, best, use_best, opp_idx, obs
    )
    ref = jnp.stack([
        model.apply(best if bool(use_best[b]) else members[int(opp_idx[b])],
                    obs[b : b + 1])[0][0]
        for b in range(B)
    ])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-4)

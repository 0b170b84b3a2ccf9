"""Independent torch reimplementation of SB3 MaskablePPO's update math.

The parity oracle for ``tests/test_sb3_parity.py`` (SURVEY.md §7 hard parts:
"importing SB3 weights and comparing one update step numerically before
trusting full-curve comparisons").  This is NOT stable-baselines3 code — it
restates, from the documented semantics, exactly what ``MaskablePPO.train``
computes with the reference's hyperparameters (BASELINE.md, decoded from
``/root/reference/models/6x6_buffer_64_10.zip``):

- MlpPolicy: flatten -> separate pi/vf towers (Tanh) -> linear heads
  (``policy.pth`` tensor layout, see ``models/sb3_import.py``);
- MaskableCategorical: illegal logits replaced by a huge negative constant
  (sb3_contrib uses -1e8), log-probs via log-softmax over the masked logits,
  entropy with masked terms contributing zero;
- per-minibatch advantage normalization with torch's *unbiased* std;
- clipped surrogate + unclipped value MSE + entropy bonus;
- global-norm grad clip 0.5, Adam(lr, eps=1e-5, betas=(0.9, 0.999));
- GAE walked backwards with ``next_non_terminal`` masking and terminal-step
  bootstrap from the post-rollout value
  (``RolloutBuffer.compute_returns_and_advantage``).

Everything is float32 throughout, like SB3 on CPU.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

HUGE_NEG = -1e8  # sb3_contrib MaskableCategorical masking constant


class TorchMlpPolicy(nn.Module):
    """SB3 MlpPolicy twin built from a ``policy.pth`` state dict."""

    def __init__(self, state_dict: dict, n_actions: int):
        super().__init__()

        def linear(prefix: str) -> nn.Linear:
            w = torch.as_tensor(np.asarray(state_dict[f"{prefix}.weight"]))
            b = torch.as_tensor(np.asarray(state_dict[f"{prefix}.bias"]))
            lin = nn.Linear(w.shape[1], w.shape[0])
            with torch.no_grad():
                lin.weight.copy_(w)
                lin.bias.copy_(b)
            return lin

        pi_layers, vf_layers, i = [], [], 0
        while f"mlp_extractor.policy_net.{2 * i}.weight" in state_dict:
            pi_layers += [linear(f"mlp_extractor.policy_net.{2 * i}"), nn.Tanh()]
            vf_layers += [linear(f"mlp_extractor.value_net.{2 * i}"), nn.Tanh()]
            i += 1
        self.policy_net = nn.Sequential(*pi_layers)
        self.value_net_tower = nn.Sequential(*vf_layers)
        self.action_net = linear("action_net")
        self.value_net = linear("value_net")
        assert self.action_net.out_features == n_actions

    def forward(self, obs: torch.Tensor):
        x = obs.reshape(obs.shape[0], -1).float()
        logits = self.action_net(self.policy_net(x))
        values = self.value_net(self.value_net_tower(x))[:, 0]
        return logits, values

    def evaluate_actions(self, obs, actions, masks):
        """(values, log_prob, entropy) like SB3's policy.evaluate_actions."""
        logits, values = self(obs)
        logits = torch.where(masks, logits, torch.tensor(HUGE_NEG))
        logp = torch.log_softmax(logits, dim=-1)
        log_prob = logp.gather(1, actions[:, None].long())[:, 0]
        p = torch.softmax(logits, dim=-1)
        p_log_p = torch.where(masks, p * logp, torch.tensor(0.0))
        entropy = -p_log_p.sum(dim=-1)
        return values, log_prob, entropy


def sb3_gae(rewards, values, dones, last_values, gamma, gae_lambda):
    """NumPy restatement of ``RolloutBuffer.compute_returns_and_advantage``.

    ``dones[t]`` marks a transition that ended its episode (equals
    ``episode_starts[t+1]`` under auto-reset).  Shapes (T, B); returns
    (advantages, returns).
    """
    rewards = np.asarray(rewards, np.float32)
    values = np.asarray(values, np.float32)
    nonterminal = 1.0 - np.asarray(dones, np.float32)
    T = rewards.shape[0]
    adv = np.zeros_like(rewards)
    next_adv = np.zeros_like(last_values, dtype=np.float32)
    next_value = np.asarray(last_values, np.float32)
    for t in reversed(range(T)):
        delta = rewards[t] + gamma * next_value * nonterminal[t] - values[t]
        next_adv = delta + gamma * gae_lambda * nonterminal[t] * next_adv
        adv[t] = next_adv
        next_value = values[t]
    return adv, adv + values


def sb3_update(
    policy: TorchMlpPolicy,
    batch: dict,
    minibatch_indices: np.ndarray,  # (n_grad_steps, minibatch) int — the sweep order
    learning_rate: float = 3e-4,
    clip_range: float = 0.2,
    ent_coef: float = 0.0,
    vf_coef: float = 0.5,
    max_grad_norm: float = 0.5,
):
    """Run the PPO sweep exactly as ``MaskablePPO.train`` does.

    ``batch`` holds numpy arrays: obs (n, N, N), masks (n, A) bool,
    actions (n,), old_log_prob (n,), advantages (n,), returns (n,).
    Returns per-grad-step stats dicts (first step's grads included).
    """
    opt = torch.optim.Adam(policy.parameters(), lr=learning_rate, eps=1e-5)
    obs = torch.as_tensor(np.asarray(batch["obs"], np.float32))
    masks = torch.as_tensor(np.asarray(batch["masks"], bool))
    actions = torch.as_tensor(np.asarray(batch["actions"], np.int64))
    old_log_prob = torch.as_tensor(np.asarray(batch["old_log_prob"], np.float32))
    advantages = torch.as_tensor(np.asarray(batch["advantages"], np.float32))
    returns = torch.as_tensor(np.asarray(batch["returns"], np.float32))

    stats = []
    for step_i, idx in enumerate(minibatch_indices):
        ix = torch.as_tensor(np.asarray(idx, np.int64))
        values, log_prob, entropy = policy.evaluate_actions(
            obs[ix], actions[ix], masks[ix]
        )
        adv = advantages[ix]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)  # torch std: unbiased

        ratio = torch.exp(log_prob - old_log_prob[ix])
        pl1 = adv * ratio
        pl2 = adv * torch.clamp(ratio, 1.0 - clip_range, 1.0 + clip_range)
        policy_loss = -torch.min(pl1, pl2).mean()
        value_loss = torch.nn.functional.mse_loss(returns[ix], values)
        entropy_loss = -entropy.mean()
        loss = policy_loss + ent_coef * entropy_loss + vf_coef * value_loss

        opt.zero_grad()
        loss.backward()
        grads = None
        if step_i == 0:
            grads = {
                name: p.grad.detach().clone().numpy()
                for name, p in policy.named_parameters()
            }
        torch.nn.utils.clip_grad_norm_(policy.parameters(), max_grad_norm)
        opt.step()
        stats.append(
            {
                "policy_loss": float(policy_loss.detach()),
                "value_loss": float(value_loss.detach()),
                "entropy": float(-entropy_loss.detach()),
                "grads": grads,
            }
        )
    return stats

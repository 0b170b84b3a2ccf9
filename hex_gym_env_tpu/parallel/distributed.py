"""Data-parallel selfplay PPO over a device mesh (SPMD via shard_map).

Each device owns ``n_envs / D`` environments: the rollout scan, GAE, and
minibatch sweeps run on purely local data; the only cross-device traffic is
one ``pmean`` of gradients per minibatch (riding ICI) plus scalar metric
reductions.  Parameters, optimizer state, and the opponent bank stay
bitwise-replicated: every replica applies the identical mesh-averaged
update, so no parameter broadcast is ever needed.

Deviation from strict single-stream SB3 semantics (documented): minibatch
shuffling is per-device rather than global, the standard distributed-PPO
trade (a global shuffle would cost an all-to-all per minibatch for zero
statistical benefit at these scales).

Multi-host use: call ``jax.distributed.initialize()`` first; the mesh then
spans all hosts' devices, ``data`` collectives ride ICI within a slice and
DCN across slices, transparently compiled by XLA.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hex_gym_env_tpu.parallel.mesh import DATA_AXIS, batch_sharding, replicate_tree, shard_batch_tree
from hex_gym_env_tpu.train import gae, ppo
from hex_gym_env_tpu.train.selfplay import SelfplayPPO, TrainMetrics, TrainState
from hex_gym_env_tpu.utils.config import TrainConfig


class DistributedSelfplayPPO(SelfplayPPO):
    """SelfplayPPO whose train_step is an SPMD program over ``mesh``."""

    def __init__(self, cfg: TrainConfig, mesh: Mesh):
        n_data = mesh.shape[DATA_AXIS]
        if cfg.selfplay.n_envs % n_data:
            raise ValueError(
                f"n_envs {cfg.selfplay.n_envs} must divide over data axis {n_data}"
            )
        # Local shard sees n_envs / D environments; validate local minibatching.
        local_envs = cfg.selfplay.n_envs // n_data
        if (cfg.ppo.n_steps * local_envs) % cfg.ppo.minibatch_size:
            raise ValueError(
                "per-device rollout size (n_steps x local_envs = "
                f"{cfg.ppo.n_steps} x {local_envs}) must be divisible by "
                f"minibatch_size {cfg.ppo.minibatch_size}"
            )
        # Impl selection must follow the MESH's devices, not
        # jax.default_backend(): a virtual-CPU dryrun on a machine whose
        # default backend is a TPU (e.g. the tunneled axon chip) would
        # otherwise pick Pallas kernels — for the rollout step AND the
        # evaluator AND the update sweep — that cannot lower for CPU.
        import dataclasses

        if next(iter(mesh.devices.flat)).platform == "cpu":
            cfg = dataclasses.replace(
                cfg,
                selfplay=dataclasses.replace(
                    cfg.selfplay, env_step_impl="lax", policy_impl="lax",
                    rollout_impl="scan",
                ),
                ppo=dataclasses.replace(cfg.ppo, update_impl="lax"),
            )
        super().__init__(cfg)
        self.mesh = mesh
        self.n_data = n_data
        # Per-device runner: same config but local env count.
        local_sp = dataclasses.replace(cfg.selfplay, n_envs=local_envs)
        from hex_gym_env_tpu.train.rollout import SelfplayRunner

        self.local_runner = SelfplayRunner(self.topo, self.model, local_sp)
        self.dist_update_fn = ppo.make_update_fn(
            self.model, cfg.ppo, self.optimizer,
            grad_reduce=lambda g: jax.lax.pmean(g, DATA_AXIS),
        )
        self._build_step()
        self._build_eval()

    # -- state placement ---------------------------------------------------

    def shard_state(self, state: TrainState) -> TrainState:
        """Place carry on the data axis, everything else replicated."""
        return TrainState(
            params=replicate_tree(state.params, self.mesh),
            opt_state=replicate_tree(state.opt_state, self.mesh),
            bank=replicate_tree(state.bank, self.mesh),
            carry=shard_batch_tree(state.carry, self.mesh),
            key=replicate_tree(state.key, self.mesh),
            iteration=replicate_tree(state.iteration, self.mesh),
            eval_accum=replicate_tree(state.eval_accum, self.mesh),
        )

    def init_sharded_state(self, key: jax.Array) -> TrainState:
        return self.shard_state(self.init_state(key))

    def state_shardings(self, template: TrainState) -> TrainState:
        """Target layout pytree for checkpoint restore: carry on the data
        axis, everything else replicated (mirrors ``shard_state``), so
        ``CheckpointManager.restore`` can land the state directly in the
        mesh layout instead of pinning it to device 0."""
        from hex_gym_env_tpu.parallel.mesh import batch_sharding, replicated

        rep, bat = replicated(self.mesh), batch_sharding(self.mesh)
        return TrainState(
            params=jax.tree.map(lambda _: rep, template.params),
            opt_state=jax.tree.map(lambda _: rep, template.opt_state),
            bank=jax.tree.map(lambda _: rep, template.bank),
            carry=jax.tree.map(lambda _: bat, template.carry),
            key=rep,
            iteration=rep,
            eval_accum=rep,
        )

    # -- SPMD train step ---------------------------------------------------

    def _build_step(self):
        cfg = self.cfg
        runner = self.local_runner
        update_fn = self.dist_update_fn

        def local_step(params, opt_state, bank, carry, key):
            di = jax.lax.axis_index(DATA_AXIS)
            key, k_roll, k_update = jax.random.split(key, 3)
            k_roll = jax.random.fold_in(k_roll, di)  # decorrelate replicas
            k_update = jax.random.fold_in(k_update, di)

            carry, tr, last_values = runner.run(params, bank, carry, k_roll, cfg.ppo.n_steps)
            advantages, returns = gae.compute_gae(
                tr.reward, tr.value, tr.done, last_values,
                cfg.ppo.gamma, cfg.ppo.gae_lambda,
            )

            def flat(x):
                return x.reshape((-1,) + x.shape[2:])

            batch = ppo.PPOBatch(
                obs=flat(tr.obs), legal=flat(tr.legal), action=flat(tr.action),
                log_prob_old=flat(tr.log_prob), value_old=flat(tr.value),
                advantage=flat(advantages), ret=flat(returns),
            )
            params, opt_state, stats = update_fn(params, opt_state, batch, k_update)

            finished = tr.done.sum()
            reward_sum = jnp.sum(jnp.where(tr.done, tr.reward, 0.0))
            finished = jax.lax.psum(finished, DATA_AXIS)
            reward_sum = jax.lax.psum(reward_sum, DATA_AXIS)
            mean_ep_reward = jnp.where(
                finished > 0, reward_sum / finished.astype(jnp.float32), 0.0
            )
            stats = jax.lax.pmean(stats, DATA_AXIS)
            metrics = TrainMetrics(mean_ep_reward, finished, stats)
            return params, opt_state, carry, key, metrics

        rep = P()
        bat = P(DATA_AXIS)
        sharded = jax.shard_map(
            local_step,
            mesh=self.mesh,
            in_specs=(rep, rep, rep, bat, rep),
            out_specs=(rep, rep, bat, rep, rep),
            check_vma=False,  # keys/psum mixes replicated+varying values
        )

        def step(state: TrainState):
            params, opt_state, carry, key, metrics = sharded(
                state.params, state.opt_state, state.bank, state.carry,
                state.key,
            )
            return (
                TrainState(
                    params=params, opt_state=opt_state, bank=state.bank,
                    carry=carry, key=key,
                    iteration=state.iteration + 1,
                    eval_accum=state.eval_accum + self.per_iter,
                ),
                metrics,
            )

        self._step = step

    def train_step(self, state: TrainState):
        return self._step(state)

    # -- SPMD eval step ----------------------------------------------------

    def _build_eval(self):
        """Shard the eval pass over the data axis (VERDICT r4 item 6).

        The inherited ``eval_step`` would run ALL E eval episodes
        replicated on every device (and read the sharded
        ``carry.agent_seat`` through implicit resharding).  Here each
        device evaluates ceil(E/D) episodes — keyed per GLOBAL episode id
        so the per-episode rewards are bitwise identical at every mesh
        width — then an ``all_gather`` of the (E,) rewards feeds the
        replicated pool-update tail (identical on every device, so the
        bank stays bitwise-replicated with no broadcast).  ``sample_board``
        configs keep the replicated evaluator (no per-episode board keys).
        """
        cfg = self.cfg
        if cfg.selfplay.sample_board:
            # replicated fallback: board sampling has no per-episode key
            # derivation, so the sharded pass cannot reproduce it
            self._eval_sharded = None
            return
        E = cfg.selfplay.eval_episodes
        sym = getattr(cfg.selfplay, "symmetric_eval", False)
        G = 2 * E if sym else E  # global episode grid (both seats under sym)
        El = -(-G // self.n_data)  # ceil: trailing pad episodes are dropped
        evaluator = self.evaluator

        def local_eval(params, bank, seats_local, key):
            di = jax.lax.axis_index(DATA_AXIS)
            eids = di * El + jnp.arange(El, dtype=jnp.int32)
            seats_all = jax.lax.all_gather(seats_local, DATA_AXIS, tiled=True)
            k_play, k_slot = jax.random.split(key)
            rewards_local = evaluator.play_vs_pool_sharded(
                params, bank, k_play, eids, seats_all
            )
            rewards = jax.lax.all_gather(rewards_local, DATA_AXIS, tiled=True)[:G]
            if sym:
                rewards = 0.5 * (rewards[:E] + rewards[E:])
            return evaluator.apply_pool_update(params, bank, rewards, k_slot)

        rep, bat = P(), P(DATA_AXIS)
        self._eval_sharded = jax.shard_map(
            local_eval,
            mesh=self.mesh,
            in_specs=(rep, rep, bat, rep),
            out_specs=(rep, rep),
            check_vma=False,
        )

    def eval_step(self, state: TrainState):
        if self._eval_sharded is None:  # sample_board: replicated fallback
            return super().eval_step(state)
        key, k_eval = jax.random.split(state.key)
        bank, result = self._eval_sharded(
            state.params, state.bank, state.carry.agent_seat, k_eval
        )
        return (
            state.replace(
                bank=bank, key=key, eval_accum=jnp.zeros((), jnp.int32)
            ),
            result,
        )

"""Device mesh construction and state sharding helpers.

The reference has no parallelism whatsoever (single process, ``n_envs=1`` —
SURVEY.md §2.10); this module is the TPU-native "communication backend"
layer it lacks: a named ``jax.sharding.Mesh`` whose ``data`` axis carries
the environment batch, with parameters/optimizer/bank replicated and
gradients reduced by ``pmean`` over ICI.  A unit-sized ``model`` axis is
kept in the mesh shape so tensor-parallel shardings can be introduced
without re-plumbing (not needed at reference model sizes, ~12.5k params).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh of shape (data, model) over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_tree(tree, mesh: Mesh):
    """Place every leaf with its leading axis split over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate_tree(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)

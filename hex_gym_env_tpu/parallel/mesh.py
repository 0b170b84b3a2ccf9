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


def _is_key(x) -> bool:
    return hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)


def _put(x, sh: NamedSharding):
    """Place a host-identical value with ``sh``, multi-process safe.

    ``jax.device_put`` rejects shardings that span non-addressable devices;
    in multi-host runs each process instead contributes its local shards via
    ``make_array_from_callback`` (every process holds the identical full
    value, so slicing by global index yields consistent shards).  Typed PRNG
    keys are routed through their raw uint32 data.
    """
    if isinstance(x, jax.Array) and getattr(x, "sharding", None) == sh:
        return x  # already placed (e.g. shard_state on a mesh-restored state)
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    if _is_key(x):
        data = np.asarray(jax.random.key_data(x))
        raw = jax.make_array_from_callback(data.shape, sh, lambda idx: data[idx])
        return jax.random.wrap_key_data(raw)
    data = np.asarray(x)
    return jax.make_array_from_callback(data.shape, sh, lambda idx: data[idx])


def shard_batch_tree(tree, mesh: Mesh):
    """Place every leaf with its leading axis split over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: _put(x, sh), tree)


def replicate_tree(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: _put(x, rep), tree)

from hex_gym_env_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate_tree,
    replicated,
    shard_batch_tree,
)
from hex_gym_env_tpu.parallel.distributed import DistributedSelfplayPPO

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "batch_sharding", "make_mesh",
    "replicate_tree", "replicated", "shard_batch_tree",
    "DistributedSelfplayPPO",
]

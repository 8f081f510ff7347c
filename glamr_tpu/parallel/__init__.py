"""Device-mesh + sharding helpers (the TPU replacement for the reference's
Lightning DDP/NCCL data parallelism, motion_infiller/train.py:117-119)."""
from .mesh import get_mesh, replicate, shard_batch
from .shard import (
    data_axes, make_mesh_nd, make_sharded_step, param_partition_specs,
    shard_batch_nd, shard_train_state, state_partition_specs,
)

__all__ = [
    "get_mesh", "shard_batch", "replicate",
    "make_mesh_nd", "param_partition_specs", "state_partition_specs",
    "shard_train_state", "shard_batch_nd", "make_sharded_step", "data_axes",
]

"""Device-mesh + sharding helpers (the TPU replacement for the reference's
Lightning DDP/NCCL data parallelism, motion_infiller/train.py:117-119)."""
from .mesh import get_mesh, replicate, shard_batch

__all__ = ["get_mesh", "shard_batch", "replicate"]

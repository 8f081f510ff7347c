"""Mesh construction and sharding placement.

Training is data-parallel over a 1-D ('dp',) mesh (the reference's only
strategy is DDP — SURVEY.md §2.9); parameters are replicated, batches are
sharded on the leading axis, and gradient all-reduce is inserted by XLA
from the sharding annotations (no user-level collectives). Multi-host
extends the same program over DCN via jax.distributed.initialize().
Multi-axis meshes (dp x fsdp x tp) live in parallel/shard.py.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Place each leaf with its leading axis split across the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (parameters / optimizer state)."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

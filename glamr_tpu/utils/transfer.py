"""Packed device->host transfers.

On a remote/tunneled accelerator every `np.asarray(device_array)` pays a
full host round-trip; pulling a result dict leaf-by-leaf costs
(leaves x latency) even when the payload is tiny. `device_get_tree`
ravels all same-dtype leaves into ONE flat device buffer (a cheap
on-device concatenate) and fetches it with a single transfer per dtype,
then splits back on the host. Measured on the tunneled v5e this cuts the
stage-4 result fetch from ~2.3 s (92 transfers) to a few round-trips.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def device_get_tree(tree):
    """Fetch a pytree of jax arrays to host numpy with one transfer per
    dtype. Non-jax leaves pass through unchanged."""
    leaves, treedef = jax.tree.flatten(tree)
    dev_idx = [i for i, l in enumerate(leaves)
               if isinstance(l, jax.Array) and not isinstance(l, jax.core.Tracer)]
    if not dev_idx:
        return tree
    by_dtype: dict = {}
    for i in dev_idx:
        by_dtype.setdefault(jnp.dtype(leaves[i].dtype), []).append(i)
    out = list(leaves)
    for dt, idxs in by_dtype.items():
        if len(idxs) == 1:
            i = idxs[0]
            out[i] = np.asarray(leaves[i])
            continue
        flat = jnp.concatenate([jnp.ravel(leaves[i]) for i in idxs])
        host = np.asarray(flat)  # single transfer
        off = 0
        for i in idxs:
            n = int(np.prod(leaves[i].shape)) if leaves[i].shape else 1
            out[i] = host[off:off + n].reshape(leaves[i].shape)
            off += n
    return jax.tree.unflatten(treedef, out)

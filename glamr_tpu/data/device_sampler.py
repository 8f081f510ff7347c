"""Device-resident AMASS sampling: the TPU-native data path.

The host pipeline (Python or native C sampler) still pays a
host->device transfer per batch — ~30 MB/step at batch 1024, which
dominates when the accelerator is remote and is wasted PCIe traffic even
locally. Instead, upload the concatenated theta tensor ONCE and sample
windows on-device inside jit:

  * sequence choice: categorical over precomputed log-probabilities
  * window start: uniform over the valid range per chosen sequence
  * window gather: vmapped dynamic_slice on the flat frame axis
  * occlusion mask: contiguous drop span from uniform draws (reference
    amass_dataset.py:93-110 semantics)

Short sequences are handled by clamping the window into the sequence and
edge-holding is unnecessary (the start range collapses to 0 and the
gather clamps at the sequence end, matching the C sampler's edge-pad).
The whole sampler composes with the train step under one jit, so an
entire epoch can run as one device program with zero host involvement.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class DeviceSampler:
    """Holds the device-resident dataset + sampling tables."""

    def __init__(self, data: dict, seq_prob: Optional[np.ndarray] = None,
                 device=None, mesh=None):
        seqs = list(data.values())
        theta = np.ascontiguousarray(np.concatenate(seqs, 0), np.float32)
        lengths = np.array([s.shape[0] for s in seqs], np.int64)
        offsets = np.concatenate([[0], np.cumsum(lengths)])
        if seq_prob is None:
            seq_prob = np.full(len(seqs), 1.0 / len(seqs))
        if mesh is not None:
            # replicate the dataset over the mesh so each device's shard of
            # a batch draw gathers from local HBM (no cross-device traffic)
            from jax.sharding import NamedSharding, PartitionSpec
            dev = NamedSharding(mesh, PartitionSpec())
        else:
            dev = device or jax.devices()[0]
        self.theta = jax.device_put(jnp.asarray(theta), dev)       # (N, 85)
        self.offsets = jax.device_put(jnp.asarray(offsets[:-1]), dev)
        self.lengths = jax.device_put(jnp.asarray(lengths), dev)
        self.logp = jax.device_put(
            jnp.log(jnp.asarray(seq_prob, jnp.float32) + 1e-12), dev)

    def sample_batch(self, rng: jax.Array, batch_size: int, seq_len: int,
                     mask_spec: Optional[dict] = None) -> dict:
        """Jit-compatible batch draw -> same keys as AMASSDataset.batch."""
        return _sample_batch(self.theta, self.offsets, self.lengths,
                             self.logp, rng, batch_size, seq_len,
                             _mask_tuple(mask_spec))

    def data_tree(self) -> dict:
        """The device-resident dataset as a pytree, for threading through
        an enclosing jit as an EXPLICIT argument (make_fused_epoch `data`):
        a sampler closure that captures these arrays bakes them into the
        outer program as HLO literals, inflating the serialized compile
        payload by the dataset size (a remote-compile relay then rejects
        large datasets outright — observed HTTP 413 with a ~200 MB pool)."""
        return {"theta": self.theta, "offsets": self.offsets,
                "lengths": self.lengths, "logp": self.logp}

    @staticmethod
    def sample_from(data: dict, rng: jax.Array, batch_size: int,
                    seq_len: int, mask_spec: Optional[dict] = None) -> dict:
        """Pure-function form of sample_batch over a data_tree() pytree."""
        return _sample_batch(data["theta"], data["offsets"],
                             data["lengths"], data["logp"], rng,
                             batch_size, seq_len, _mask_tuple(mask_spec))


def _mask_tuple(mask_spec):
    if not mask_spec:
        return None
    return (int(mask_spec.get("preserve_first_n", 1)),
            int(mask_spec.get("preserve_last_n", 0)),
            int(mask_spec["min_drop_len"]),
            int(mask_spec["max_drop_len"]))


@partial(jax.jit, static_argnums=(5, 6, 7))
def _sample_batch(theta, offsets, lengths, logp, rng, batch_size, seq_len,
                  mask_tuple):
    B, S = batch_size, seq_len
    k_seq, k_start, k_mask = jax.random.split(rng, 3)
    sind = jax.random.categorical(k_seq, logp, shape=(B,))
    L = lengths[sind]                                        # (B,)
    max_start = jnp.maximum(L - S, 0)
    u = jax.random.uniform(k_start, (B,))
    start = (u * (max_start + 1).astype(jnp.float32)).astype(jnp.int32)
    base = offsets[sind].astype(jnp.int32) + start

    eff = jnp.minimum(L, S).astype(jnp.int32)                # (B,)
    t = jnp.arange(S)
    # clamp inside the sequence: frames past the end repeat the last frame
    idx = base[:, None] + jnp.minimum(t[None, :], eff[:, None] - 1)
    win = theta[idx]                                         # (B, S, 85)
    loss_mask = (t[None, :] < eff[:, None]).astype(jnp.float32)

    frame_mask = jnp.ones((B, S), jnp.float32)
    if mask_tuple is not None:
        pf, plast, mn, mx = mask_tuple
        kd, ks = jax.random.split(k_mask)
        drop = mn + (jax.random.uniform(kd, (B,)) * (mx - mn + 1)).astype(jnp.int32)
        smin = pf
        smax = jnp.minimum(S - drop + 1 - plast, eff)
        smax = jnp.maximum(smax, smin + 1)
        ds = smin + (jax.random.uniform(ks, (B,)) *
                     (smax - smin).astype(jnp.float32)).astype(jnp.int32)
        de = jnp.minimum(ds + drop, S)
        frame_mask = jnp.where(
            (t[None, :] >= ds[:, None]) & (t[None, :] < de[:, None]), 0.0, 1.0)

    pose = win[..., 3:75]
    return {
        "trans": win[..., :3],
        "pose": pose,
        "shape": win[..., 75:],
        "gt_body_pose": pose[..., 3:],
        "in_body_pose": pose[..., 3:] * frame_mask[..., None],
        "frame_mask": frame_mask,
        "frame_loss_mask": loss_mask[..., None],
    }

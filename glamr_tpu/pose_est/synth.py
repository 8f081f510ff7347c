"""Training data for the keypoint lifter: procedural motion through
random synthetic cameras.

Each sample is a window of a procedural motion sequence (data/procedural),
viewed by a randomly placed camera (look-at, OpenCV convention: x right,
y down, z forward), projected to normalized 2D keypoints with noise and
synthetic occlusion — the same data-level fault injection the reference
applies to infiller training (amass_dataset.py:93-110) and Dynamic-H36M
(preprocess_h36m_occluded.py).

FK joints and twist angles are precomputed per sequence once (CPU); batch
assembly is pure numpy, so the per-step host cost is a few camera matmuls.
"""
from __future__ import annotations

import numpy as np

from .ik import NUM_TWISTS


def lookat_cam(pos: np.ndarray, target: np.ndarray) -> tuple:
    """World->cam rotation (3,3) and camera position, z-up world, OpenCV
    camera (x right, y down, z forward)."""
    up = np.array([0.0, 0.0, 1.0])
    z = target - pos
    z = z / max(np.linalg.norm(z), 1e-8)
    x = np.cross(z, up)
    n = np.linalg.norm(x)
    if n < 1e-6:  # looking straight up/down
        x = np.array([1.0, 0.0, 0.0])
    else:
        x = x / n
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=0).astype(np.float32), pos.astype(np.float32)


class LifterDataGen:
    """Window sampler with per-window random cameras.

    data: {seq_name: theta (T, 85)} AMASS-format (procedural or real).
    """

    def __init__(self, data: dict, smpl=None, seq_len: int = 32):
        import jax
        import jax.numpy as jnp

        from ..body.lbs import lbs
        from ..body.smpl import get_smpl
        from .ik import twist_angles

        smpl = smpl or get_smpl("body26fk")
        self.seq_len = seq_len
        self.joints_w, self.twist_sc, self.betas = [], [], []
        # FK + twist extraction over ALL sequences as one flat frame batch
        # (per-sequence eager calls dominate prep time for large datasets)
        thetas = list(data.values())
        if thetas:
            flat = np.concatenate(thetas, axis=0)
            from ..utils.cache import host_prep_scope
            with host_prep_scope():
                pose = jnp.asarray(flat[:, 3:75])
                beta = jnp.asarray(flat[:, 75:85])
                _, j = lbs(smpl.model, beta, pose, want_verts=False)
                jw_all = (np.asarray(j) + flat[:, None, :3]).astype(np.float32)
                tw = np.asarray(twist_angles(smpl.model, pose, beta))
            tw_all = np.stack([np.sin(tw), np.cos(tw)], axis=-1).astype(np.float32)
            off = 0
            for theta in thetas:
                t = theta.shape[0]
                self.joints_w.append(jw_all[off: off + t])
                self.twist_sc.append(tw_all[off: off + t])
                self.betas.append(theta[0, 75:85].astype(np.float32))
                off += t
        self.lengths = np.array([j.shape[0] for j in self.joints_w])

    def sample(self, rng: np.random.Generator) -> dict:
        S = self.seq_len
        si = int(rng.integers(len(self.joints_w)))
        L = self.lengths[si]
        start = int(rng.integers(max(L - S, 0) + 1))
        sl = slice(start, start + S)
        jw = self.joints_w[si][sl]
        tw = self.twist_sc[si][sl]
        if jw.shape[0] < S:  # edge-hold short sequences
            pad = np.tile(jw[-1:], (S - jw.shape[0], 1, 1))
            jw = np.concatenate([jw, pad], 0)
            tw = np.concatenate([tw, np.tile(tw[-1:], (S - tw.shape[0], 1, 1))], 0)

        # random camera looking at the window's center of motion
        center = jw[:, 0].mean(axis=0)
        az = rng.uniform(0, 2 * np.pi)
        dist = rng.uniform(2.0, 9.0)  # match the detector's camera range
        height = rng.uniform(0.5, 2.2)
        pos = np.array([center[0] + dist * np.cos(az),
                        center[1] + dist * np.sin(az), height])
        tgt = center + rng.normal(0, 0.1, 3)
        R, c = lookat_cam(pos, tgt)
        jc = np.einsum("ij,tnj->tni", R, jw - c)                    # cam frame

        kp = jc[..., :2] / np.maximum(jc[..., 2:], 1e-3)
        kp = kp + rng.normal(0, rng.uniform(0, 0.008), kp.shape)

        vis = np.ones((S, jw.shape[1]), np.float32)
        if rng.uniform() < 0.7:  # contiguous full-body occlusion span
            dl = int(rng.integers(2, max(S // 2, 3)))
            ds = int(rng.integers(0, S - dl + 1))
            vis[ds: ds + dl] = 0.0
        drop = rng.uniform(0, 0.15)
        vis *= (rng.uniform(size=vis.shape) > drop).astype(np.float32)

        return {
            "kp_2d": (kp * vis[..., None]).astype(np.float32),
            "vis": vis,
            "gt_jpos_rel": (jc - jc[:, :1]).astype(np.float32),
            "gt_root_trans": jc[:, 0].astype(np.float32),
            "gt_twist_sincos": tw,
            "gt_betas": self.betas[si],
            "frame_loss_mask": np.ones(S, np.float32),
        }

    def batch(self, rng: np.random.Generator, batch_size: int) -> dict:
        samples = [self.sample(rng) for _ in range(batch_size)]
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}

"""AMASS windowed sampler with occlusion-mask synthesis.

Reference behaviour: motion_infiller/data/amass_dataset.py — random crop
windows sampled with probability proportional to sequence length, short
sequences padded by repeating the last frame with a frame_loss_mask,
synthetic occlusion via contiguous frame drops, optional gaussian pose
smoothing. Rebuilt with explicit numpy Generators (no global seeds; the
DDP reseeding dance at :36-41 is unnecessary — each host shard derives its
generator from (seed, host_id, epoch)) and a batch API that feeds the
jitted DP train step directly.

Data format (preprocess.amass writes it): amass_{split}.pkl is a dict
{seq_name: (T, 85) float array [trans(3), pose(72), shape(10)]},
amass_{split}_jpos.pkl maps seq_name -> (jpos_shaped (T, 24, 3),
jpos_noshape (T, 24, 3)).
"""
from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np
from scipy.ndimage import gaussian_filter1d


class AMASSDataset:
    def __init__(self, data: dict, data_jpos: Optional[dict] = None,
                 seq_len: int = 64, ntime_per_epoch: int = 10000,
                 seq_sampling_method: str = "uniform",
                 data_mask_methods: Optional[dict] = None,
                 pose_gaussian_smooth: Optional[dict] = None):
        self.data = data
        self.data_jpos = data_jpos or {}
        self.sequences = list(data.keys())
        self.seq_len = seq_len
        self.ntime_per_epoch = int(float(ntime_per_epoch))
        self.mask_methods = data_mask_methods or {}
        self.pose_gaussian_smooth = pose_gaussian_smooth
        self.seq_lengths = np.array([x.shape[0] for x in data.values()])
        self.seq_prob = (
            self.seq_lengths / self.seq_lengths.sum()
            if seq_sampling_method == "length" else None
        )
        self._native_sampler = None

    def _native(self):
        if self._native_sampler is None:
            from .native_sampler import NativeSampler

            ns = NativeSampler(self.data, self.seq_prob)
            self._native_sampler = ns if ns.available else False
        return self._native_sampler or None

    @classmethod
    def from_dir(cls, dataset_dir: str, split: str, **kw) -> "AMASSDataset":
        with open(os.path.join(dataset_dir, f"amass_{split}.pkl"), "rb") as f:
            data = pickle.load(f)
        jpos_file = os.path.join(dataset_dir, f"amass_{split}_jpos.pkl")
        data_jpos = None
        if os.path.isfile(jpos_file):
            with open(jpos_file, "rb") as f:
                data_jpos = pickle.load(f)
        return cls(data, data_jpos, **kw)

    def __len__(self) -> int:
        return self.ntime_per_epoch // self.seq_len

    # ------------------------------------------------------------- sampling

    def sample(self, rng: np.random.Generator) -> dict:
        """One random window (reference random_sample :35-91)."""
        sind = rng.choice(len(self.sequences), p=self.seq_prob)
        seq = self.sequences[sind]
        seq_data = self.data[seq]
        L, S = seq_data.shape[0], self.seq_len

        if S <= L:
            fr_start = int(rng.integers(L - S + 1))
            win = seq_data[fr_start: fr_start + S].astype(np.float32)
            frame_loss_mask = np.ones((S, 1), np.float32)
            eff = S
        else:
            fr_start = 0
            pad = np.tile(seq_data[[-1]], (S - L, 1))
            win = np.vstack([seq_data, pad]).astype(np.float32)
            frame_loss_mask = np.zeros((S, 1), np.float32)
            frame_loss_mask[:L] = 1.0
            eff = L

        data = {
            "trans": win[:, :3],
            "pose": win[:, 3:75],
            "shape": win[:, 75:],
            "seq_name": seq,
            "frame_loss_mask": frame_loss_mask,
            "fr_start": fr_start,
            "eff_seq_len": eff,
        }
        if seq in self.data_jpos:
            jp, jp_ns = self.data_jpos[seq]

            def window(j):
                if S <= L:
                    out = j[fr_start: fr_start + S]
                else:
                    out = np.vstack([j, np.tile(j[[-1]], (S - L, 1, 1))])
                return out[:, 1:, :].reshape(S, -1).astype(np.float32)

            data["joint_pos_shape"] = window(jp)
            data["joint_pos_noshape"] = window(jp_ns)

        self._generate_mask(data, rng)

        # gaussian pose-smoothing augmentation (:82-90)
        in_body_pose = win[:, 6:75].copy()
        if self.pose_gaussian_smooth is not None:
            d = self.pose_gaussian_smooth
            if rng.binomial(1, d["prob"]):
                sigma = rng.uniform(d["sigma_lb"], d["sigma_ub"])
                in_body_pose = gaussian_filter1d(in_body_pose, sigma=sigma,
                                                 axis=0, mode="nearest")
        in_body_pose *= data["pose_mask"][:, 3:]
        data["in_body_pose"] = in_body_pose
        return data

    def _generate_mask(self, data: dict, rng: np.random.Generator):
        """Synthetic occlusion: drop a contiguous frame span (:93-110)."""
        T = data["pose"].shape[0]
        pose_mask = np.ones_like(data["pose"])
        frame_mask = np.ones(T, np.float32)
        for method, specs in self.mask_methods.items():
            if method == "drop_frames":
                first_n = specs.get("preserve_first_n", 1)
                last_n = specs.get("preserve_last_n", 0)
                drop_len = int(rng.integers(specs["min_drop_len"],
                                            specs["max_drop_len"] + 1))
                start_min = first_n
                start_max = min(T - drop_len + 1 - last_n, data["eff_seq_len"])
                start = int(rng.integers(start_min, max(start_max, start_min + 1)))
                end = min(start + drop_len, T)
                pose_mask[start:end] = 0.0
                frame_mask[start:end] = 0.0
                data["num_drop_fr"] = end - start
        data["pose_mask"] = pose_mask
        data["frame_mask"] = frame_mask

    def batch(self, rng: np.random.Generator, batch_size: int,
              native: bool = True) -> dict:
        """Stack batch_size samples into [B, ...] arrays (numeric keys only).

        Uses the C sampler (data.native_sampler) when possible: one call
        fills the whole batch. Falls back to the Python per-sample path
        when the toolchain is absent or augmentations require it
        (gaussian smoothing, per-sample jpos windows)."""
        if native and self.pose_gaussian_smooth is None:
            ns = self._native()
            if ns is not None:
                seed = int(rng.integers(0, 2**63 - 1))
                mask_spec = self.mask_methods.get("drop_frames")
                return ns.batch(seed, batch_size, self.seq_len, mask_spec)
        samples = [self.sample(rng) for _ in range(batch_size)]
        out = {}
        for k, v in samples[0].items():
            if isinstance(v, np.ndarray):
                out[k] = np.stack([s[k] for s in samples])
        out["gt_body_pose"] = out["pose"][..., 3:]
        return out

    def epoch(self, rng: np.random.Generator, batch_size: int):
        for _ in range(max(len(self) // batch_size, 1)):
            yield self.batch(rng, batch_size)


def synthetic_amass_data(num_seqs: int = 8, min_len: int = 80,
                         max_len: int = 300, seed: int = 0) -> tuple[dict, dict]:
    """Deterministic synthetic AMASS-format data (theta (T, 85)) so the
    full training/eval pipeline runs without the licensed dataset.
    Motion is smooth (integrated noise) to resemble mocap."""
    rng = np.random.default_rng(seed)
    data, data_jpos = {}, {}
    for i in range(num_seqs):
        T = int(rng.integers(min_len, max_len + 1))
        trans = np.cumsum(rng.normal(0, 0.01, (T, 3)), axis=0)
        trans[:, 2] += 0.9
        pose = np.cumsum(rng.normal(0, 0.01, (T, 72)), axis=0) * 0.5
        pose[:, :3] += np.array([1.2092, 1.2092, 1.2092])
        shape = np.tile(rng.normal(0, 0.5, (1, 10)), (T, 1))
        data[f"synthetic_{i}"] = np.concatenate(
            [trans, pose, shape], axis=-1
        ).astype(np.float32)
        jp = rng.normal(0, 0.3, (T, 24, 3)).astype(np.float32)
        data_jpos[f"synthetic_{i}"] = (jp, jp.copy())
    return data, data_jpos

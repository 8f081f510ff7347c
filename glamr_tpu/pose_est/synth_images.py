"""Synthetic rendered images for detector training.

Renders procedurally-generated SMPL bodies (data/procedural.py) through
random cameras with the software rasterizer — random backgrounds, colors,
multi-person layouts — and emits CenterNet-style training targets for
pose_est/detector.py. This mirrors the reference's data-level synthesis
strategy (synthetic occlusion masks amass_dataset.py:93-110, synthetic
dynamic cameras preprocess_h36m_occluded.py): no licensed image dataset
is required to train the in-framework stage-1 detector.
"""
from __future__ import annotations

import cv2
import numpy as np

from .detector import DetectorConfig, splat_gaussian
from .synth import lookat_cam


def render_mesh_image(verts_list, faces, cam_R, cam_c, K, size,
                      rng: np.random.Generator):
    """Z-buffer render of one or more meshes over a random background
    (shared fragment rasterizer, vis/renderer.py mesh_fragments — one
    code path with the product visualizer, pixel-exact depth between
    persons). At detector scale (128 px) this costs about the same as
    the old per-triangle painter loop; training throughput comes from
    build_detector_pool + device-resident fused epochs, not from the
    renderer. verts_list: list of (V, 3) world-frame vertex arrays.
    Returns (size, size, 3) float32 in [0, 1].
    """
    from ..vis.renderer import mesh_fragments, resolve_fragments

    # random background: solid color + optional gradient + noise
    base = rng.uniform(0.1, 0.9, 3)
    img = np.tile(base.astype(np.float32), (size, size, 1))
    if rng.uniform() < 0.5:  # vertical gradient
        g = np.linspace(-0.2, 0.2, size, dtype=np.float32)[:, None, None]
        img = np.clip(img + g * rng.choice([-1.0, 1.0]), 0, 1)
    img += rng.normal(0, rng.uniform(0.005, 0.05), img.shape).astype(np.float32)
    img = np.clip(img, 0, 1)

    frags = []
    for verts in verts_list:
        color = rng.uniform(0.15, 0.95, 3)
        vc = verts @ cam_R.T + (-cam_R @ cam_c)
        z = vc[:, 2]
        uv = ((vc / np.maximum(z[:, None], 1e-6)) @ K.T)[:, :2]
        f = mesh_fragments(uv, z, verts, faces, color * 255,
                           size, size, cam_R[2])
        if f is not None:
            frags.append(f)
    img8 = (img * 255).astype(np.uint8)
    if frags:
        col, zbuf = resolve_fragments(
            tuple(np.concatenate(x) for x in zip(*frags)), size, size)
        cover = np.isfinite(zbuf)
        img8[cover] = col[cover]
    return img8.astype(np.float32) / 255.0


class DetectorDataGen:
    """Multi-person rendered-image sampler with CenterNet targets.

    data: {seq_name: theta (T, 85)} AMASS-format motion (procedural or
    real). Each sample draws 1..max_people persons at random frames,
    places them near a shared look-at target, renders, and projects the
    24 SMPL joints for targets.
    """

    def __init__(self, data: dict, smpl=None, cfg: DetectorConfig = None):
        import jax

        from ..body.smpl import get_smpl

        self.smpl = smpl or get_smpl("body26fk")
        self.cfg = cfg or DetectorConfig()
        self.thetas = list(data.values())
        self._lbs_fn = None
        self._jax = jax

    def _verts_joints(self, pose72, beta):
        """(N, 72), (N, 10) -> world verts (N, V, 3), joints (N, 24, 3)
        (model frame; caller adds placement)."""
        import jax
        import jax.numpy as jnp

        from ..body.lbs import lbs

        if self._lbs_fn is None:
            from ..utils.cache import host_cpu_device

            model = self.smpl.model

            def f(pose, beta):
                return lbs(model, beta, pose)

            # pin via committed inputs when a CPU backend is registered
            # (tiny batched host-prep op; jit(backend=...) is deprecated
            # on jax 0.9 — input placement decides the backend instead)
            self._lbs_dev = host_cpu_device()
            self._lbs_fn = jax.jit(f)
        args = (jnp.asarray(pose72), jnp.asarray(beta))
        if self._lbs_dev is not None:
            args = jax.device_put(args, self._lbs_dev)
        v, j = self._lbs_fn(*args)
        return np.asarray(v), np.asarray(j)

    def sample(self, rng: np.random.Generator) -> dict:
        c = self.cfg
        size, hm, s = c.img_size, c.hm_size, c.out_stride
        K = c.num_kp
        NP = int(rng.integers(1, c.max_people))  # 1..max_people-1 persons

        # draw NP random frames (padded LBS batch keeps one compiled shape)
        pose = np.zeros((c.max_people, 72), np.float32)
        beta = np.zeros((c.max_people, 10), np.float32)
        for i in range(NP):
            th = self.thetas[int(rng.integers(len(self.thetas)))]
            fr = th[int(rng.integers(th.shape[0]))]
            pose[i] = fr[3:75]
            beta[i] = fr[75:85]
        verts, joints = self._verts_joints(pose, beta)

        # world placement: persons spread around the origin
        offsets = np.zeros((NP, 3), np.float32)
        offsets[:, :2] = rng.uniform(-1.2, 1.2, (NP, 2))
        verts = verts[:NP] + offsets[:, None]
        joints = joints[:NP] + offsets[:, None]

        # camera looking at the group center
        center = joints[:, 0].mean(axis=0)
        az = rng.uniform(0, 2 * np.pi)
        dist = rng.uniform(3.0, 6.5)
        height = rng.uniform(0.6, 2.2)
        pos = np.array([center[0] + dist * np.cos(az),
                        center[1] + dist * np.sin(az), height])
        R, cpos = lookat_cam(pos, center + rng.normal(0, 0.15, 3))
        f = size * rng.uniform(0.9, 1.4)
        Kmat = np.array([[f, 0, size / 2], [0, f, size / 2], [0, 0, 1]],
                        np.float32)

        img = render_mesh_image(list(verts), self.smpl.faces, R, cpos, Kmat,
                                size, rng)

        # project joints -> pixel keypoints + targets
        jc = np.einsum("ij,pnj->pni", R, joints - cpos)
        kp = np.einsum("ij,pnj->pni", Kmat, jc / np.maximum(jc[..., 2:], 1e-6)
                       )[..., :2]                               # (NP, 24, 2)
        vis = ((jc[..., 2] > 0.05) & (kp[..., 0] >= 0) & (kp[..., 0] < size)
               & (kp[..., 1] >= 0) & (kp[..., 1] < size)).astype(np.float32)

        M = c.max_people
        gt_center_idx = np.zeros((M, 2), np.int32)
        gt_kp_offset = np.zeros((M, K, 2), np.float32)
        gt_kp_vis = np.zeros((M, K), np.float32)
        gt_person_mask = np.zeros(M, np.float32)
        centers_cell = []
        kp_cells_all, kp_vis_all = [], []
        for p in range(NP):
            cc = kp[p, 0] / s                       # pelvis cell (x, y)
            if not (0 <= cc[0] < hm and 0 <= cc[1] < hm):
                continue
            cy, cx = int(cc[1]), int(cc[0])
            gt_center_idx[p] = (cy, cx)
            gt_person_mask[p] = 1.0
            gt_kp_vis[p] = vis[p]
            gt_kp_offset[p] = kp[p] / s - np.array([cx, cy], np.float32)
            # peak at the floored cell — must coincide with gt_center_idx
            # (offsets carry the sub-cell residual, CenterNet convention)
            centers_cell.append((cy, cx))
            kp_cells_all.append(kp[p] / s)
            kp_vis_all.append(vis[p])

        sigma = max(hm / 24.0, 1.0)
        gt_center_hm = splat_gaussian(hm, centers_cell, sigma)
        gt_kp_hm = np.zeros((hm, hm, K), np.float32)
        if kp_cells_all:
            # vectorized multi-person gaussian splat: (Pv, K, h, w) -> max
            kc = np.round(np.stack(kp_cells_all))          # (Pv, K, 2) x,y
            vm = np.stack(kp_vis_all)                      # (Pv, K)
            yy, xx = np.mgrid[0:hm, 0:hm].astype(np.float32)
            d2 = (yy[None, None] - kc[..., 1, None, None]) ** 2 \
                + (xx[None, None] - kc[..., 0, None, None]) ** 2
            g = np.exp(-d2 / (2 * sigma ** 2)) * vm[..., None, None]
            gt_kp_hm = g.max(axis=0).transpose(1, 2, 0).astype(np.float32)

        return {
            "images": img,
            "gt_center_hm": gt_center_hm,
            "gt_kp_hm": gt_kp_hm,
            "gt_center_idx": gt_center_idx,
            "gt_kp_offset": gt_kp_offset,
            "gt_kp_vis": gt_kp_vis,
            "gt_person_mask": gt_person_mask,
            "gt_kp_2d": (kp * vis[..., None]).astype(np.float32)
            if NP == M else np.concatenate(
                [kp * vis[..., None],
                 np.zeros((M - NP, K, 2), np.float32)]).astype(np.float32),
            "cam_K": Kmat,
        }

    def batch(self, rng: np.random.Generator, batch_size: int) -> dict:
        samples = [self.sample(rng) for _ in range(batch_size)]
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def build_detector_pool(gen: DetectorDataGen, rng: np.random.Generator,
                        num_images: int, workers: int = None) -> dict:
    """Pre-render a fixed detector training pool for device-resident
    fused-epoch training (the detector analog of data/device_sampler.py:
    rendering is host-bound at ~25 ms/image, so per-step fresh renders
    cap training at ~1 step/s regardless of device speed; a pooled
    dataset renders once, lives in HBM, and epochs run at device speed
    with on-device photometric augmentation re-diversifying each draw).

    Images and heatmaps are quantized to uint8 (4x HBM saving; they are
    [0, 1] by construction) and dequantized on-device per batch.
    """
    import concurrent.futures as cf
    import os as _os

    workers = workers or min(8, _os.cpu_count() or 1)
    seeds = rng.integers(0, 2 ** 31 - 1, num_images)
    gen.sample(np.random.default_rng(0))  # warm the jitted LBS once

    def one(seed):
        return gen.sample(np.random.default_rng(int(seed)))

    if workers > 1:
        with cf.ThreadPoolExecutor(workers) as ex:
            samples = list(ex.map(one, seeds))
    else:
        samples = [one(s) for s in seeds]
    pool = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    for k in ("images", "gt_center_hm", "gt_kp_hm"):
        pool[k] = np.round(pool[k] * 255).astype(np.uint8)
    return pool

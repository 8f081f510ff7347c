"""In-framework 2D person + keypoint detection (single-shot, conv net).

The reference's stage 1 delegates detection to external torch models —
FasterRCNN for single-person and YOLOv3 + a multi-person tracker for
multi-person videos (hybrik_demo/demo.py:238-265, :114-142). This module
is the TPU-native replacement: one CenterNet-style convolutional network
predicts, per frame,

    * a person-center heatmap (pelvis projection),
    * per-center keypoint offsets (2K channels, center-relative), and
    * per-keypoint heatmaps (K channels, used as confidence),

so a single MXU-friendly forward pass yields every person and their full
2D keypoint set — no region proposals, no per-person crops, no dynamic
shapes. Decoding (peak NMS via 3x3 max-pool equality + top-k) is jittable
with a static max_people, and the greedy track association lives in
pose_est/tracker.py. Together with the keypoint lifter (pose_est/
lifter.py) and analytic IK (pose_est/ik.py) this completes a fully
in-framework video -> pose.pkl stage 1.

Trained on synthetically rendered SMPL meshes (pose_est/synth_images.py),
the same procedural-data strategy the lifter uses.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class DetectorConfig:
    num_kp: int = 24
    img_size: int = 128          # square input, multiple of out_stride
    out_stride: int = 4          # heatmap resolution = img_size / out_stride
    base_ch: int = 32            # stem width; doubles per downsample
    num_blocks: int = 2          # residual blocks per resolution level
    max_people: int = 4          # static top-k for decoding
    dtype: str = "float32"       # compute dtype ("bfloat16" for MXU speed)
    # GT keypoint-heatmap splat sigma in CELLS (training-time only).
    # 0.0 = legacy v3 recipe (cell-rounded peaks, sigma hm/24 ~1.33 —
    # what the SHIPPED release trained with). >0 = continuous sub-cell
    # peaks at this sigma, for decode-time snapping evidence. Two
    # sharper recipes were measured at 128 px/200 ep and MADE THINGS
    # WORSE (RESULTS.md keypoint-shrinkage finding): sigma 0.75
    # collapses the focal loss (peaks ~0.001 trained); sigma 1.25 +
    # kp_hm weight 2.0 trains peaks (0.92) but the stronger heatmap
    # gradient drags the shared trunk and the offset-head spread
    # shrinkage WORSENS (0.86 -> 0.66). The precision lever at this
    # capacity is input resolution, not splat sharpness (ROADMAP
    # round-6 queue).
    kp_sigma_cells: float = 0.0
    # Decode-time keypoint snapping (see _snap_to_kp_heatmap). Per-model
    # because it is an empirical property of the trained heads: at
    # 128 px the kp heatmaps are no sharper than the regression (snap
    # measured worse); at 256 px snapping cuts lifter root error 24%
    # and zeroes the depth-anchor bias (RESULTS.md).
    snap_kp: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "DetectorConfig":
        keys = {f.name for f in cls.__dataclass_fields__.values()}
        return cls(**{k: v for k, v in d.items() if k in keys})

    @property
    def hm_size(self) -> int:
        return self.img_size // self.out_stride


class ResBlock(nn.Module):
    """Pre-activation residual block, NHWC 3x3 convs."""

    ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="gn1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="gn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class PersonKeypointDetector(nn.Module):
    """images (B, H, W, 3) in [0, 1] -> dict of dense heads at stride
    out_stride:
      center_hm (B, h, w)        sigmoid person-center heatmap
      kp_offset (B, h, w, K, 2)  center-relative keypoint offsets, in
                                 heatmap-pixel units
      kp_hm     (B, h, w, K)     sigmoid per-keypoint heatmaps
    Compute in cfg.dtype (bf16-capable); heads cast back to f32.
    """

    cfg: DetectorConfig

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        x = images.astype(dt)

        # stem: stride-2 conv -> base_ch at 1/2 resolution
        x = nn.Conv(c.base_ch, (7, 7), strides=(2, 2), dtype=dt, name="stem")(x)
        # encoder: downsample to 1/4, 1/8, 1/16 with doubling channels
        feats = []
        ch = c.base_ch
        for lvl in range(3):
            ch *= 2
            x = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=dt,
                        name=f"down{lvl}")(x)
            for b in range(c.num_blocks):
                x = ResBlock(ch, dtype=dt, name=f"enc{lvl}_block{b}")(x)
            feats.append(x)

        # decoder: upsample back to out_stride with skip connections
        # (resolution levels: feats[0]=1/4, feats[1]=1/8, feats[2]=1/16)
        lvls = {4: 0, 8: 1, 16: 2}
        target_lvl = lvls[c.out_stride]
        for lvl in range(2, target_lvl, -1):
            B, h, w, _ = x.shape
            x = jax.image.resize(x, (B, h * 2, w * 2, x.shape[-1]), "nearest")
            x = nn.Conv(feats[lvl - 1].shape[-1], (3, 3), dtype=dt,
                        name=f"up{lvl}")(x)
            x = x + feats[lvl - 1]
            x = ResBlock(x.shape[-1], dtype=dt, name=f"dec{lvl}_block")(x)

        K = c.num_kp
        center = nn.Conv(1, (1, 1), dtype=jnp.float32,
                         bias_init=nn.initializers.constant(-2.19),
                         name="center_head")(x.astype(jnp.float32))
        kp_off = nn.Conv(2 * K, (1, 1), dtype=jnp.float32,
                         name="offset_head")(x.astype(jnp.float32))
        kp_hm = nn.Conv(K, (1, 1), dtype=jnp.float32,
                        bias_init=nn.initializers.constant(-2.19),
                        name="kp_head")(x.astype(jnp.float32))
        Bh, h, w = center.shape[:3]
        return {
            "center_hm": nn.sigmoid(center[..., 0]),
            "kp_offset": kp_off.reshape(Bh, h, w, K, 2),
            "kp_hm": nn.sigmoid(kp_hm),
        }


# ---------------------------------------------------------------------------
# losses (CenterNet-style)
# ---------------------------------------------------------------------------

def focal_heatmap_loss(pred, gt, alpha=2.0, beta=4.0, eps=1e-6):
    """Penalty-reduced pixelwise focal loss (CornerNet/CenterNet). gt is a
    gaussian-splatted heatmap in [0, 1] with exact 1 at object centers."""
    pred = jnp.clip(pred, eps, 1.0 - eps)
    pos = (gt >= 1.0 - 1e-4).astype(pred.dtype)
    neg_w = jnp.power(1.0 - gt, beta)
    pos_loss = -jnp.log(pred) * jnp.power(1.0 - pred, alpha) * pos
    neg_loss = -jnp.log(1.0 - pred) * jnp.power(pred, alpha) * neg_w * (1.0 - pos)
    num_pos = jnp.maximum(pos.sum(), 1.0)
    return (pos_loss.sum() + neg_loss.sum()) / num_pos


def loss_center(data, specs):
    return focal_heatmap_loss(data["center_hm"], data["gt_center_hm"])


def loss_kp_hm(data, specs):
    return focal_heatmap_loss(data["kp_hm"], data["gt_kp_hm"])


def loss_offset(data, specs):
    """L1 on keypoint offsets, gathered at GT center cells only.
    gt_center_idx (B, N, 2) int cell coords (y, x); gt_kp_offset
    (B, N, K, 2); gt_person_mask (B, N); gt_kp_vis (B, N, K)."""
    idx = data["gt_center_idx"]                    # (B, N, 2)
    off = data["kp_offset"]                        # (B, h, w, K, 2)
    B, N = idx.shape[:2]
    bi = jnp.arange(B)[:, None]
    pred = off[bi, idx[..., 0], idx[..., 1]]       # (B, N, K, 2)
    err = jnp.abs(pred - data["gt_kp_offset"])
    w = (data["gt_person_mask"][..., None] * data["gt_kp_vis"])[..., None]
    return (err * w).sum() / jnp.maximum(w.sum(), 1.0)


detector_loss_dict = {
    "center": loss_center,
    "kp_hm": loss_kp_hm,
    "offset": loss_offset,
}

DEFAULT_DETECTOR_LOSS_CFG = {
    "center": {"weight": 1.0},
    "kp_hm": {"weight": 1.0},
    "offset": {"weight": 1.0},
}


# ---------------------------------------------------------------------------
# target building + decoding
# ---------------------------------------------------------------------------

def splat_gaussian(hm_size: int, centers, sigma: float):
    """(N, 2) float cell coords (y, x) -> (h, w) heatmap: max over per-
    center gaussians. NaN/out-of-range centers contribute nothing."""
    import numpy as np

    h = w = hm_size
    yy, xx = np.mgrid[0:h, 0:w]
    hm = np.zeros((h, w), np.float32)
    for cy, cx in np.asarray(centers, np.float32):
        if not (0 <= cy < h and 0 <= cx < w):
            continue
        g = np.exp(-((yy - round(cy)) ** 2 + (xx - round(cx)) ** 2)
                   / (2 * sigma ** 2))
        hm = np.maximum(hm, g)
    return hm


def _snap_to_kp_heatmap(kp_cell, kp_hm, radius: int = 2,
                        min_peak: float = 0.1):
    """Refine center-regressed keypoints against the per-keypoint
    heatmaps (jittable).

    The offset head regresses all K keypoints from ONE center cell, so
    its precision is bounded by that cell's receptive field — measured
    on rendered held-out scenes it shrinks the keypoint spread to
    0.82-0.86 of GT (L1 regression toward the mean), which the lifter's
    depth anchor converts into a systematic +11% depth overestimate
    (RESULTS.md stage-1 decomposition). CenterNet-pose resolves this the
    same way: the regression only GROUPS keypoints to a person; the
    coordinate is refined by snapping to the nearest local evidence in
    the keypoint heatmap. Here: take the (2r+1)^2 window of channel k
    around the regressed cell, find its argmax, then a 3x3 weighted
    centroid around that argmax for sub-cell precision; keep the
    regressed coordinate when the window's best evidence is weak
    (< min_peak — occluded or out-of-window joints).

    kp_cell (B, M, K, 2) float cell coords (x, y); kp_hm (B, h, w, K).
    Returns refined (B, M, K, 2) cell coords.
    """
    B, h, w, K = kp_hm.shape
    M = kp_cell.shape[1]
    r = radius
    W = 2 * r + 1
    # pad so dynamic_slice windows never clip (pad with 0 evidence)
    hmp = jnp.pad(jnp.moveaxis(kp_hm, -1, 1), ((0, 0), (0, 0),
                                               (r + 1, r + 1), (r + 1, r + 1)))
    cx = jnp.clip(jnp.round(kp_cell[..., 0]), 0, w - 1).astype(jnp.int32)
    cy = jnp.clip(jnp.round(kp_cell[..., 1]), 0, h - 1).astype(jnp.int32)

    def win(b, k, y, x):
        return jax.lax.dynamic_slice(hmp[b, k], (y, x), (W, W))

    bi = jnp.broadcast_to(jnp.arange(B)[:, None, None], (B, M, K))
    ki = jnp.broadcast_to(jnp.arange(K)[None, None, :], (B, M, K))
    wins = jax.vmap(win)(bi.reshape(-1), ki.reshape(-1),
                         (cy + 1).reshape(-1), (cx + 1).reshape(-1))
    # windows are centered: index (r, r) == the regressed cell. (+1 in the
    # slice start cancels the extra pad so a 3x3 centroid around any
    # in-window argmax stays in bounds.)
    flatw = wins.reshape(-1, W * W)
    pk = jnp.argmax(flatw, axis=-1)
    pky, pkx = pk // W, pk % W
    peak_val = jnp.take_along_axis(flatw, pk[:, None], axis=-1)[:, 0]

    # 3x3 weighted centroid around the argmax (sub-cell refinement)
    def cent(wn, y, x):
        patch = jax.lax.dynamic_slice(
            jnp.pad(wn, ((1, 1), (1, 1))), (y, x), (3, 3))
        tot = patch.sum() + 1e-8
        dy = (patch * jnp.array([[-1.], [0.], [1.]])).sum() / tot
        dx = (patch * jnp.array([[-1., 0., 1.]])).sum() / tot
        return jnp.stack([x.astype(jnp.float32) + dx,
                          y.astype(jnp.float32) + dy])

    ref = jax.vmap(cent)(wins, pky, pkx)            # (N, 2) (x, y) in-window
    ref = ref.reshape(B, M, K, 2)
    snapped = jnp.stack([cx.astype(jnp.float32), cy.astype(jnp.float32)],
                        -1) + ref - r
    use = (peak_val.reshape(B, M, K) >= min_peak)[..., None]
    return jnp.where(use, snapped, kp_cell)


def decode_detections(out: dict, cfg: DetectorConfig,
                      score_thresh: float = 0.3,
                      snap_kp: bool | None = None):
    """Dense heads -> top-max_people detections per image (jittable).

    Returns dict:
      centers (B, M, 2) pixel coords (x, y) in input-image scale
      scores  (B, M)
      kp_2d   (B, M, K, 2) pixel coords
      kp_conf (B, M, K)  keypoint-heatmap confidence at each keypoint
      valid   (B, M)     score > score_thresh

    snap_kp: refine the center-regressed keypoints against the
    per-keypoint heatmaps (_snap_to_kp_heatmap), CenterNet-pose style.
    None (default) defers to cfg.snap_kp — a per-model property: at
    128 px the kp heatmaps are no sharper than the regression (snap
    measured worse, keypoint px error 10.0 -> 13.3); the 256-px model
    ships with it ON (root error -24%, depth bias zeroed; RESULTS.md).
    """
    if snap_kp is None:
        snap_kp = getattr(cfg, "snap_kp", False)
    hm = out["center_hm"]                               # (B, h, w)
    B, h, w = hm.shape
    M, K, s = cfg.max_people, cfg.num_kp, cfg.out_stride

    # 3x3 max-pool NMS: keep only local maxima
    pooled = jax.lax.reduce_window(
        hm, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1),
        [(0, 0), (1, 1), (1, 1)])
    peaks = jnp.where(hm >= pooled, hm, 0.0)

    flat = peaks.reshape(B, -1)
    scores, idx = jax.lax.top_k(flat, M)                # (B, M)
    cy, cx = idx // w, idx % w

    bi = jnp.arange(B)[:, None]
    off = out["kp_offset"][bi, cy, cx]                  # (B, M, K, 2)
    kp_cell = jnp.stack([cx, cy], -1)[:, :, None, :].astype(jnp.float32) + off
    if snap_kp:
        kp_cell = _snap_to_kp_heatmap(kp_cell, out["kp_hm"])
    kp_px = kp_cell * s + s / 2.0

    # confidence: kp heatmap sampled at the (clamped) keypoint cell
    ky = jnp.clip(jnp.round(kp_cell[..., 1]), 0, h - 1).astype(jnp.int32)
    kx = jnp.clip(jnp.round(kp_cell[..., 0]), 0, w - 1).astype(jnp.int32)
    ki = jnp.arange(K)[None, None, :]
    kp_conf = out["kp_hm"][bi[..., None], ky, kx, ki]   # (B, M, K)

    centers = (jnp.stack([cx, cy], -1).astype(jnp.float32) * s + s / 2.0)
    return {
        "centers": centers,
        "scores": scores,
        "kp_2d": kp_px,
        "kp_conf": kp_conf,
        "valid": scores > score_thresh,
    }


def init_detector(model: PersonKeypointDetector, tx, rng):
    from ..train.trainer import TrainState

    c = model.cfg
    img = jnp.zeros((1, c.img_size, c.img_size, 3), jnp.float32)
    params = model.init(rng, img)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))

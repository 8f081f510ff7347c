"""In-framework per-frame pose estimation: 2D keypoint tracks -> SMPL.

The reference's stage 1 is HybrIK — an external torch/CUDA submodule run
as a subprocess in its own conda env (SURVEY C16/C17). Its image backbone
cannot be reproduced without licensed weights, but its *regression core*
(3D joints + twists -> SMPL pose via analytic IK) can, TPU-natively. This
module provides the missing front half as a temporal keypoint lifter:

    kp_2d (normalized) + visibility --transformer--> 3D joints (cam frame)
                                               + root translation
                                               + twist angles (sin/cos)
                                               + shape betas
    --pose_est.ik.hybrik--> SMPL pose

Combined with any 2D keypoint source (the reference likewise depends on an
external detector), this replaces the HybrIK subprocess with an
in-framework, jit-compiled estimator emitting the same pose.pkl schema
(pose_est/bridge.py). Trained on procedural gait data (data/procedural.py)
rendered through random synthetic cameras (pose_est/synth.py).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.nn import PositionalEncoding, TransformerEncoder
from .ik import NUM_TWISTS


@dataclass(frozen=True)
class LifterConfig:
    num_kp: int = 24
    d_model: int = 256
    nhead: int = 8
    ff_dim: int = 512
    nlayer: int = 3
    dropout: float = 0.1
    num_twist: int = NUM_TWISTS
    # structural depth prior from keypoint spread (the reference anchors
    # monocular depth the same way: fixed focal + bbox-scale cue,
    # pose_est/hybrik_demo/demo.py:175-199). False keeps the legacy free
    # depth head (and checkpoint param structure).
    depth_prior: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "LifterConfig":
        keys = {f.name for f in cls.__dataclass_fields__.values()}
        return cls(**{k: v for k, v in d.items() if k in keys})


class KeypointLifter(nn.Module):
    """Temporal transformer lifting normalized 2D keypoints to SMPL-space
    targets. Inputs:
      kp_2d (B, T, K, 2) — keypoints in normalized camera coords
        ((u - cx)/fx, (v - cy)/fy); occluded entries zeroed.
      vis   (B, T, K)    — per-keypoint visibility in [0, 1].
    Returns dict:
      jpos_rel (B, T, 24, 3) root-relative joints in the camera frame
      root_trans (B, T, 3)   root position in the camera frame
      twist (B, T, NUM_TWISTS, 2) unit (sin, cos) per twist joint
      betas (B, 10)          sequence-level shape
    """

    cfg: LifterConfig

    @nn.compact
    def __call__(self, kp_2d, vis, deterministic: bool = True):
        c = self.cfg
        B, T = kp_2d.shape[:2]
        x = jnp.concatenate(
            [ (kp_2d * vis[..., None]).reshape(B, T, -1), vis ], axis=-1)
        x = nn.Dense(c.d_model, name="in_fc")(x)
        x = PositionalEncoding(c.d_model, enc_type="original", name="pe")(x)
        x = TransformerEncoder(c.d_model, c.nhead, c.ff_dim, c.nlayer,
                               c.dropout, name="encoder")(
            x, deterministic=deterministic)

        jpos = nn.Dense(c.num_kp * 3, name="jpos_head")(x)
        jpos = jpos.reshape(B, T, c.num_kp, 3)
        # root-relative by construction
        jpos = jpos - jpos[:, :, :1]

        # root translation: direction carried by the (predicted) root uv,
        # scale by a positive depth head.
        root_uv = nn.Dense(2, name="root_uv_head")(x)
        if c.depth_prior:
            # geometric depth anchor: in normalized camera coords the
            # visible-keypoint spread of a person scales as
            # (body size)/depth, so log(depth) = -log(spread) + const.
            # Regressing a residual about that anchor (instead of free
            # depth) pins the absolute scale to the same bbox-size cue
            # the reference uses (hybrik_demo/demo.py:175-199) and stops
            # per-frame depth drift from accumulating.
            w = vis[..., None]
            denom = jnp.maximum(w.sum(axis=2, keepdims=True), 1.0)
            mu = (kp_2d * w).sum(axis=2, keepdims=True) / denom
            var = (w * jnp.square(kp_2d - mu)).sum(axis=(2, 3)) \
                / denom[..., 0, 0]
            spread = jnp.sqrt(var + 1e-6)                      # (B, T)
            log_zgeo = -jnp.log(jnp.clip(spread, 1e-3, 10.0))
            # frames with (almost) no visible keypoints have a meaningless
            # spread — anchor them to the window's mean over valid frames
            # (the residual head sees `vis` and handles the rest)
            valid = (vis.sum(axis=2) > 2.0).astype(jnp.float32)  # (B, T)
            wmean = (log_zgeo * valid).sum(axis=1, keepdims=True) \
                / jnp.maximum(valid.sum(axis=1, keepdims=True), 1.0)
            log_zgeo = (valid * log_zgeo
                        + (1.0 - valid) * wmean)[..., None]
            # learnable scale: joints of a standing person spread ~0.45 m
            # about their centroid, so depth ~ 0.45 * z_geo at init
            bias = self.param("depth_prior_bias",
                              nn.initializers.constant(-0.8), (1,))
            log_depth = nn.Dense(1, name="depth_head")(x) + log_zgeo + bias
            depth = jnp.exp(jnp.clip(log_depth,
                                     jnp.log(0.3), jnp.log(50.0)))
        else:
            # legacy free depth head: softplus + 1 keeps the person in
            # front of the camera
            depth = nn.softplus(nn.Dense(1, name="depth_head")(x)) + 1.0
        root_trans = jnp.concatenate(
            [root_uv * depth, depth], axis=-1)

        twist = nn.Dense(c.num_twist * 2, name="twist_head")(x)
        twist = twist.reshape(B, T, c.num_twist, 2)
        twist = twist / jnp.maximum(
            jnp.linalg.norm(twist, axis=-1, keepdims=True), 1e-6)

        pooled = x.mean(axis=1)
        betas = nn.Dense(10, name="betas_head")(pooled)
        return {"jpos_rel": jpos, "root_trans": root_trans,
                "twist": twist, "betas": betas}


# ---------------------------------------------------------------------------
# losses (registry-dispatched like the CVAE losses, models/loss_func.py)
# ---------------------------------------------------------------------------

def _mse(pred, gt, mask=None):
    e = jnp.square(pred - gt)
    if mask is None:
        return e.mean()
    w = jnp.broadcast_to(mask.reshape(mask.shape + (1,) * (e.ndim - mask.ndim)),
                         e.shape)
    return (e * w).sum() / jnp.maximum(w.sum(), 1.0)


def loss_jpos(data, specs):
    return _mse(data["jpos_rel"], data["gt_jpos_rel"], data.get("frame_loss_mask"))


def loss_root(data, specs):
    return _mse(data["root_trans"], data["gt_root_trans"],
                data.get("frame_loss_mask"))


def loss_twist(data, specs):
    return _mse(data["twist"], data["gt_twist_sincos"],
                data.get("frame_loss_mask"))


def loss_betas(data, specs):
    return _mse(data["betas"], data["gt_betas"])


lifter_loss_dict = {
    "jpos": loss_jpos,
    "root": loss_root,
    "twist": loss_twist,
    "betas": loss_betas,
}

DEFAULT_LIFTER_LOSS_CFG = {
    "jpos": {"weight": 1.0},
    "root": {"weight": 0.1},
    "twist": {"weight": 0.5},
    "betas": {"weight": 0.05},
}


def init_lifter(model: KeypointLifter, tx, rng, seq_len: int = 32):
    """Fresh TrainState for the lifter."""
    from ..train.trainer import TrainState

    c = model.cfg
    kp = jnp.zeros((1, seq_len, c.num_kp, 2), jnp.float32)
    vis = jnp.ones((1, seq_len, c.num_kp), jnp.float32)
    params = model.init({"params": rng, "dropout": rng}, kp, vis)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))

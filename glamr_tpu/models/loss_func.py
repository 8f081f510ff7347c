"""Training loss registries for the two CVAEs.

Replicates the reference registries (motion_infiller/models/loss_func.py:155-172
and traj_pred/models/loss_func.py:64-71) as pure jnp functions over the
model-output dict. Batch-first layout; all reductions are full means, so
values match the reference's time-major code exactly.

Each fn has signature (data, specs) -> scalar where data holds model
outputs + batch targets:
  out_body_pose (B,T,69), q_z_dist/p_z_dist (Normal),
  gt_body_pose (B,T,69), frame_mask (B,T),
  out_trans/out_orient_q/out_local_traj, trans/orient_q (targets).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..transforms import (
    angle_axis_to_rot6d,
    quat_angle_diff,
    rot6d_to_quat,
    get_heading,
    vec_to_heading,
)
from .dist import Normal


# --------------------------------------------------------------- infiller

def compute_mse(data, specs):
    """(reference loss_func.py:10-20) — body-pose MSE over the decoded
    past+cur region; vis_only restricts to masked(invisible) frames."""
    out = data["out_body_pose"]
    T = out.shape[1]
    diff = out - data["gt_body_pose"][:, :T]
    dist = (diff**2).sum(-1)                      # (B, T)
    if specs.get("vis_only", False):
        dist = dist * (1.0 - data["frame_mask"][:, :T])
    return dist.mean()


def compute_rot6d_mse(data, specs):
    out6 = angle_axis_to_rot6d(data["out_body_pose"].reshape(*data["out_body_pose"].shape[:2], -1, 3))
    T = out6.shape[1]
    gt6 = angle_axis_to_rot6d(data["gt_body_pose"][:, :T].reshape(*out6.shape[:2], -1, 3))
    return ((out6 - gt6) ** 2).sum((-1, -2)).mean()


def compute_jpos_gt_loss(data, specs):
    out = data["out_joint_pos"]
    T = out.shape[1]
    diff = out - data["gt_joint_pos"][:, :T]
    return (diff**2).sum(-1).mean()


def compute_jvel_gt_loss(data, specs):
    out = data["out_joint_pos"]
    T = out.shape[1]
    ov = out[:, 1:] - out[:, :-1]
    gv = data["gt_joint_pos"][:, 1:T] - data["gt_joint_pos"][:, : T - 1]
    return ((ov - gv) ** 2).sum(-1).mean()


def compute_nll(data, specs):
    return data["nll"].mean()


def compute_jpos_frompose_gt_loss(data, specs):
    """Joints FK'd from the decoded pose vs GT joints (:46-50); callers
    precompute data['out_joint_pos_frompose'] via SMPL.joint_pos_from_body_pose."""
    diff = data["out_joint_pos_frompose"] - data["gt_joint_pos"]
    return (diff**2).sum(-1).mean()


def compute_jpos_consist_loss(data, specs):
    """Consistency between directly-decoded joints and FK-from-pose (:53-57)."""
    diff = data["out_joint_pos_frompose"] - data["out_joint_pos"]
    return (diff**2).sum(-1).mean()


def compute_vae_z_kld(data, specs):
    """KL(q‖p) with min-clip (reference :60-71)."""
    kld = data["q_z_dist"].kl(data["p_z_dist"]).sum(-1)
    if specs.get("clamp_before_mean", True):
        return jnp.maximum(kld, specs.get("min_clip", 0.0)).mean()
    return jnp.maximum(kld.mean(), specs.get("min_clip", 0.0))


def compute_vae_z_kld_bidir(data, specs):
    """Bidirectional KLD variant (:74-79)."""
    kf = data["q_z_dist_forward"].kl(data["p_z_dist_forward"]).sum(-1)
    kb = data["q_z_dist_backward"].kl(data["p_z_dist_backward"]).sum(-1)
    kld = (kf + kb) * 0.5
    return jnp.maximum(kld, specs.get("min_clip", 0.0)).mean()


def _seq_kld_smoothness(dist):
    d1 = Normal(mu=dist.mu[1:], logvar=dist.logvar[1:])
    d2 = Normal(mu=dist.mu[:-1], logvar=dist.logvar[:-1])
    return d1.kl(d2).sum(-1).mean()


def compute_vae_z_prior_smoothness(data, specs):
    return _seq_kld_smoothness(data["p_z_dist"])


def compute_vae_z_posterior_smoothness(data, specs):
    return _seq_kld_smoothness(data["q_z_dist"])


# --------------------------------------------------------------- traj pred

def compute_trans_mse(data, specs):
    diff = data["out_trans"] - data["trans"]
    if specs.get("use_frame_loss_mask", False):
        diff = diff * data["frame_loss_mask"][..., None]
    return (diff**2).sum(-1).mean()


def compute_orient_angle_loss(data, specs):
    angle = quat_angle_diff(data["out_orient_q"], data["orient_q"])
    if specs.get("use_frame_loss_mask", False):
        angle = angle * data["frame_loss_mask"]
    return (angle**2).mean()


def compute_orient_6d_loss(data, specs):
    out6 = data["out_local_traj"][..., 3:9]
    gt6 = data["gt_local_traj"][..., 3:9]
    diff = out6 - gt6
    if specs.get("use_frame_loss_mask", False):
        diff = diff * data["frame_loss_mask"][..., None]
    return (diff**2).sum(-1).mean()


def compute_local_orient_heading(data, specs):
    """Penalize residual heading inside the deheaded local orientation
    (traj_pred loss_func.py:46-53)."""
    local_orient = data["out_local_traj"][..., 3:-2]
    if local_orient.shape[-1] == 6:
        local_orient = rot6d_to_quat(local_orient)
    heading = get_heading(local_orient)
    return (heading**2).mean()


def compute_dheading(data, specs):
    heading = vec_to_heading(data["out_local_traj"][..., -2:])
    return (heading**2).mean()


def compute_dheading_smoothness(data, specs):
    """Infiller variant: skip frame 0's absolute heading (:147-152)."""
    heading = vec_to_heading(data["out_local_traj"][:, 1:, -2:])
    return (heading**2).mean()


infiller_loss_dict = {
    "nll": compute_nll,
    "mse": compute_mse,
    "rot6d_mse": compute_rot6d_mse,
    "jpos_gt": compute_jpos_gt_loss,
    "jvel_gt": compute_jvel_gt_loss,
    "jpos_frompose": compute_jpos_frompose_gt_loss,
    "jpos_consist": compute_jpos_consist_loss,
    "vae_z_kld": compute_vae_z_kld,
    "vae_z_kld_bidir": compute_vae_z_kld_bidir,
    "vae_p_z_sm": compute_vae_z_prior_smoothness,
    "vae_q_z_sm": compute_vae_z_posterior_smoothness,
}

traj_pred_loss_dict = {
    "trans_mse": compute_trans_mse,
    "orient_angle": compute_orient_angle_loss,
    "orient_6d": compute_orient_6d_loss,
    "vae_z_kld": compute_vae_z_kld,
    "local_orient_heading": compute_local_orient_heading,
    "dheading": compute_dheading,
    "dheading_sm": compute_dheading_smoothness,
}


def weighted_total(data: dict, loss_cfg: dict, registry: dict):
    total = jnp.asarray(0.0, jnp.float32)
    uw = {}
    for name, specs in loss_cfg.items():
        val = registry[name](data, specs)
        uw[name] = val
        total = total + specs["weight"] * val
    return total, uw

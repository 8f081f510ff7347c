"""Stage-4 loss registry — pure jnp functions over the forward output.

Each loss is `fn(data, specs) -> scalar`, where `data` is the merged
{const + params + derived} dict and `specs` the per-loss config block.
Formulas and normalizations replicate the reference registry
(global_recon/models/loss_func.py:314-340) exactly, re-expressed over
padded [P, T, ...] arrays with masks:

* "visible frames" selections become multiplications by vis_mask,
* "first visible frame" / "first 10 visible frames" weighting uses the
  precomputed per-person visibility rank (const['vis_rank']),
* per-person denominators (exist_len, exist_len-1, num visible) are
  precomputed counts in const, so values match the reference's ragged
  per-person sums divided by the same counts.

All of it is fused by XLA into the optimization step — no loss is a
separate kernel launch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..transforms import (
    angle_axis_to_quaternion,
    angle_axis_to_rot6d,
    heading_to_vec,
    inverse_transform,
    quat_angle_diff,
)

FPS = 30.0  # the reference hard-codes 30 fps in every smoothness term


def gmof(x: jax.Array, sigma: float) -> jax.Array:
    """Geman-McClure robust error (loss_func.py:6-12)."""
    x2 = x * x
    s2 = sigma * sigma
    return (s2 * x2) / (s2 + x2)


# ---------------------------------------------------------------------------
# keypoint losses
# ---------------------------------------------------------------------------

def _kp_diff_channels(data):
    """(du, dv) channels (K, P, T) of predicted minus observed keypoints.

    kp_2d_pred_ch is the per-iteration (params-derived) tensor; the
    ground-truth transpose is a pure function of const, so XLA hoists it
    out of the optimization scan — the channel layout costs nothing per
    iteration while the (P,T,K,2) AoS form pays ~40x lane padding."""
    pred = data["kp_2d_pred_ch"]                         # (2, K, P, T)
    gt = jnp.transpose(data["kp_2d"], (3, 2, 0, 1))      # (2, K, P, T)
    return pred[0] - gt[0], pred[1] - gt[1]


def keypoint_2d_loss(data, specs):
    """(loss_func.py:15-36)"""
    min_conf = specs.get("min_conf", 0.05)
    ffo = specs.get("first_frame_only", False)
    ffw = specs.get("first_frame_weight", 1.0)

    score = data["kp_2d_score"]
    score = jnp.where(score < min_conf, 0.0, score)
    rank = data["vis_rank"]                              # (P, T), -1 invisible
    num_pose = jnp.maximum(data["n_vis"].sum(), 1.0)

    if ffo:
        # reference :27-33 with first_frame_only: `loss = loss[[0]]` keeps
        # the (1, K, 2) first-VISIBLE-frame row but the subsequent
        # `(loss.sum(-1) * score**2).sum()` broadcasts it against the
        # (n_vis, K) score array — the first frame's per-keypoint robust
        # error is weighted by the SUM over visible frames of score^2
        # (differentially pinned in tests/test_ref_stage4_parity.py)
        first = (rank == 0).astype(score.dtype)          # (P, T)
        s2 = ((score**2) * data["vis_mask"][..., None]).sum(1)   # (P, K)
        if "kp_2d_pred_ch" in data:
            du, dv = _kp_diff_channels(data)
            lk = ((gmof(du, 100.0) + gmof(dv, 100.0))
                  * first[None]).sum(-1)                 # (K, P, T) -> (K, P)
            return ffw * (lk * s2.T).sum() / num_pose
        diff = data["kp_2d_pred"] - data["kp_2d"]        # (P, T, K, 2)
        lk = (gmof(diff, 100.0).sum(-1) * first[..., None]).sum(1)  # (P, K)
        return ffw * (lk * s2).sum() / num_pose

    if "kp_2d_pred_ch" in data:
        du, dv = _kp_diff_channels(data)
        score_ch = jnp.transpose(score, (2, 0, 1))       # (K, P, T) hoisted
        loss = (gmof(du, 100.0) + gmof(dv, 100.0)) * score_ch**2
        loss_pt = loss.sum(0)                            # (P, T)
    else:
        diff = data["kp_2d_pred"] - data["kp_2d"]        # (P, T, K, 2)
        loss = gmof(diff, 100.0).sum(-1) * score**2      # (P, T, K)
        loss_pt = loss.sum(-1)

    w = data["vis_mask"]
    w = w * jnp.where((rank >= 0) & (rank < 10), ffw, 1.0)
    return (loss_pt * w).sum() / num_pose


def keypoint_2d_dist(data, specs):
    """Monitor-only mean pixel distance (loss_func.py:39-57)."""
    min_conf = specs.get("min_conf", 0.05)
    ffo = specs.get("first_frame_only", False)
    sel = data["kp_2d_score"] > min_conf                 # (P, T, K)
    if ffo:
        t_mask = jnp.zeros(sel.shape[1], bool).at[0].set(True)
        sel = sel & t_mask[None, :, None]
    if "kp_2d_pred_ch" in data:
        du, dv = _kp_diff_channels(data)
        sel_ch = jnp.transpose(sel, (2, 0, 1))           # (K, P, T) hoisted
        dist = jnp.sqrt(jnp.maximum(du**2 + dv**2, 1e-12))
        return (dist * sel_ch).sum() / jnp.maximum(sel_ch.sum(), 1)
    diff = data["kp_2d_pred"] - data["kp_2d"]
    dist = jnp.sqrt(jnp.maximum((diff**2).sum(-1), 1e-12))
    return (dist * sel).sum() / jnp.maximum(sel.sum(), 1)


# ---------------------------------------------------------------------------
# camera smoothness / regularizers (operate on full T, unmasked — the
# reference does the same: loss_func.py:60-114)
# ---------------------------------------------------------------------------

def _n_cam_m1(data, T):
    # real frame count (minus 1) — differs from the array length when the
    # sequence is bucket-padded (run_dataset --pad_to)
    return data.get("n_cam_m1", T - 1)


def _vel_sq_mean(data, x):
    vel = (x[1:] - x[:-1]) * FPS
    return (vel**2).sum(-1).sum() / _n_cam_m1(data, x.shape[0])


def cam_rot_smoothness_loss(data, specs):
    return _vel_sq_mean(data, data["cam_rot_6d"])


def cam_trans_smoothness_loss(data, specs):
    return _vel_sq_mean(data, data["cam_trans"])


def cam_inv_rot_smoothness_loss(data, specs):
    r = data["cam_pose_inv"][:, :3, :2]
    vel = (r[1:] - r[:-1]) * FPS
    return (vel**2).sum((-1, -2)).sum() / _n_cam_m1(data, r.shape[0])


def cam_origin_smoothness_loss(data, specs):
    return _vel_sq_mean(data, data["cam_pose_inv"][:, :3, 3])


def cam_depth_smoothness_loss(data, specs):
    cpi = data["cam_pose_inv"]
    orig = cpi[:, :3, 3]
    cam_z = cpi[1:, :3, 2]
    delta_z = ((orig[:-1] - orig[1:]) * cam_z).sum(-1) * FPS
    return (delta_z**2).sum() / _n_cam_m1(data, cpi.shape[0])


def cam_up_reg(data, specs):
    """Penalize the camera up axis tilting off world-z (loss_func.py:106-114)."""
    ffw = specs.get("first_frame_weight", 1.0)
    ffo = specs.get("first_frame_only", False)
    up_dot = data["cam_pose_inv"][:, 2, 1]
    if ffo:
        return up_dot[0] * ffw
    w = jnp.ones_like(up_dot).at[:10].set(ffw)
    if "real_frame_mask" in data:
        w = w * data["real_frame_mask"]
    n = data.get("n_cam", up_dot.shape[0])
    return (up_dot * w).sum() / n


# ---------------------------------------------------------------------------
# trajectory smoothness / consistency
# ---------------------------------------------------------------------------

def traj_rot_smoothness_loss(data, specs):
    rot_type = specs.get("rot_type", "6d")
    if rot_type == "6d":
        r = angle_axis_to_rot6d(data["smpl_orient_world"])     # (P, T, 6)
        diff = r[:, 1:] - r[:, :-1]
        sq = (diff * FPS) ** 2
        total = sq.sum()
    else:
        q = angle_axis_to_quaternion(data["smpl_orient_world"])
        diff = quat_angle_diff(q[:, 1:], q[:, :-1])
        total = ((diff * FPS) ** 2).sum()
    P, T = data["smpl_orient_world"].shape[:2]
    return total / data.get("n_traj_smooth", P * (T - 1))


def traj_trans_smoothness_loss(data, specs):
    t = data["root_trans_world"]
    diff = (t[:, 1:] - t[:, :-1]) * FPS
    P, T = t.shape[:2]
    return (diff**2).sum() / data.get("n_traj_smooth", P * (T - 1))


def cam_traj_rot_loss(data, specs):
    """World-pose-through-camera vs original camera-frame pose (:147-172)."""
    rot_type = specs.get("rot_type", "6d")
    ffw = specs.get("first_frame_weight", 1.0)
    ffo = specs.get("first_frame_only", False)
    if rot_type == "6d":
        r1 = angle_axis_to_rot6d(data["smpl_orient_cam_in_world"])
        r2 = angle_axis_to_rot6d(data["smpl_orient_cam"])
        sq = ((r2 - r1) ** 2).sum(-1)                         # (P, T)
    else:
        q1 = angle_axis_to_quaternion(data["smpl_orient_cam_in_world"])
        q2 = angle_axis_to_quaternion(data["smpl_orient_cam"])
        sq = quat_angle_diff(q2, q1) ** 2
    rank = data["vis_rank"]
    if ffo:
        w = (rank == 0).astype(sq.dtype)
        num = data["n_vis"].shape[0]  # one per person
    else:
        w = data["vis_mask"] * jnp.where(rank == 0, ffw**2, 1.0)
        num = data["n_vis"].sum()
    return (sq * w).sum() / jnp.maximum(num, 1.0)


def cam_traj_trans_loss(data, specs):
    ffw = specs.get("first_frame_weight", 1.0)
    diff = data["root_trans_cam_in_world"] - data["root_trans_cam"]
    sq = (diff**2).sum(-1)
    w = data["vis_mask"] * jnp.where(data["vis_rank"] == 0, ffw**2, 1.0)
    return (sq * w).sum() / jnp.maximum(data["n_vis"].sum(), 1.0)


# ---------------------------------------------------------------------------
# residual regularizers (loss_func.py:189-245). The reference scales every
# residual by 30 before squaring and divides by the per-person length of
# the ragged residual array; padded entries are exactly zero so the masked
# sums match.
# ---------------------------------------------------------------------------

def _reg(data, key, denom_key):
    # reference reg_loss: total sum over persons / total count (:189-196)
    x = data[key]
    sq = (x * FPS) ** 2
    return sq.sum() / jnp.maximum(data[denom_key].sum(), 1.0)


def traj_rot_res_loss(data, specs):
    return _reg(data, "smpl_orient_world_res", "n_frames_p")


def traj_trans_res_loss(data, specs):
    return _reg(data, "root_trans_world_res", "n_frames_p")


def local_traj_dxy_reg(data, specs):
    return _reg(data, "traj_local_dxy", "n_exist_m1")


def local_traj_dheading_reg(data, specs):
    return _reg(data, "traj_local_dheading", "n_exist_m1")


def local_traj_dheading_reg_new(data, specs):
    """Penalize heading-delta vectors away from (1, 0) == zero turn (:220-230)."""
    vec = heading_to_vec(data["traj_local_dheading"])      # (P, T, 2)
    diff = vec - jnp.array([1.0, 0.0], vec.dtype)
    # padded entries have dheading 0 -> vec (1,0) -> zero contribution
    sq = ((diff * FPS) ** 2).sum(-1)
    return sq.sum() / jnp.maximum(data["n_exist_m1"].sum(), 1.0)


def local_traj_rot_reg(data, specs):
    return _reg(data, "traj_local_rot", "n_exist")


def local_traj_z_reg(data, specs):
    return _reg(data, "traj_local_z", "n_exist")


def cam_inv_trans_residual_reg(data, specs):
    x = data["cam_inv_trans_residual"]
    return ((x * FPS) ** 2).sum() / jnp.maximum(data["n_cam_trans_res"], 1.0)


def person2cam_res_trans_reg(data, specs):
    """Latent reference bug, resolved here: the reference registers this
    as reg_loss_global(data, 'person2cam_res_trans') (loss_func.py:244)
    but the residual only ever exists per-person in pose_dict
    (global_recon_model.py:175), so the reference loss KeyErrors if
    enabled — no shipped config uses it. Implemented with reg_loss-style
    per-row normalization (total sum / total rows)."""
    x = data["person2cam_res_trans"]                       # (P, T, 3)
    return ((x * FPS) ** 2).sum() / (x.shape[0] * x.shape[1])


def motion_latent_reg_loss(data, specs):
    # reference divides by the total latent-row count over persons (:293-300)
    x = data["motion_latent"]
    denom = data.get("n_motion_latents", x.shape[0] * x.shape[1])
    return (x**2).sum() / jnp.maximum(denom, 1)


def traj_latent_reg_loss(data, specs):
    x = data["traj_latent"]
    denom = data.get("n_traj_latents", x.shape[0])
    return (x**2).sum() / jnp.maximum(denom, 1)


# ---------------------------------------------------------------------------
# multi-person relative transform (loss_func.py:248-271)
# ---------------------------------------------------------------------------

def rel_transform_loss(data, specs):
    P = data["person_transform_world"].shape[0]
    if P < 2:
        return jnp.asarray(0.0, data["person_transform_world"].dtype)
    trans_weight = specs.get("trans_weight", 1.0)
    ffw = specs.get("first_frame_weight", 10)
    ffto = specs.get("first_frame_trans_only", False)

    tf = data["person_transform_world"]                       # (P, T, 4, 4)
    rel_world = jnp.einsum(
        "ptij,qtjk->pqtik", inverse_transform(tf), tf
    )
    rel_cam = data["rel_transform_cam"]                       # (P, P, T, 4, 4)
    pair_vis = data["pair_vis"]                               # (P, P, T) off-diag
    first = data["pair_first_vis"]                            # (P, P, T) one-hot
    wr = pair_vis * jnp.where(first > 0, ffw**2, 1.0)
    wt = wr
    if ffto:
        wt = pair_vis * first * ffw**2

    dr = ((rel_cam[..., :3, :2] - rel_world[..., :3, :2]) ** 2).sum((-1, -2))
    dt = ((rel_cam[..., :3, 3] - rel_world[..., :3, 3]) ** 2).sum(-1)
    T = tf.shape[1]
    num_pose = data.get("n_rel", P * (P - 1) * T)
    return ((dr * wr).sum() + (dt * wt).sum() * trans_weight) / num_pose


# ---------------------------------------------------------------------------
# penetration (TPU-native replacement for the reference's optional CUDA
# `sdf` package, loss_func.py:274-290): sphere-proxy inter-person
# penetration over the skinned joint set. Off by default, as upstream.
# ---------------------------------------------------------------------------

def penetration_loss(data, specs):
    """Pairwise soft sphere penetration between persons' joints.

    The reference's SDFLoss voxelizes each mesh on GPU; on TPU we bound
    each body by per-joint spheres (radius `joint_radius`) and penalize
    overlap between different persons' spheres on co-visible frames —
    a fully vectorized [P, P, T, K, K] computation for small P.
    """
    radius = specs.get("joint_radius", 0.1)
    j = data["joints_world"]                                  # (P, T, K, 3)
    P = j.shape[0]
    if P < 2:
        return jnp.asarray(0.0, j.dtype)
    d = jnp.linalg.norm(
        j[:, None, :, :, None, :] - j[None, :, :, None, :, :] + 1e-9, axis=-1
    )                                                         # (P, P, T, K, K)
    pen = jnp.maximum(2 * radius - d, 0.0) ** 2
    mask = data["pair_vis"][..., None, None]
    eye = jnp.eye(P, dtype=bool)[:, :, None, None, None]
    pen = jnp.where(eye, 0.0, pen * mask)
    return pen.sum() / jnp.maximum(data["pair_vis"].sum(), 1.0)


loss_func_dict = {
    "kp_2d": keypoint_2d_loss,
    "kp_2d_dist": keypoint_2d_dist,
    "cam_rot_smoothness": cam_rot_smoothness_loss,
    "cam_trans_smoothness": cam_trans_smoothness_loss,
    "cam_inv_rot_smoothness": cam_inv_rot_smoothness_loss,
    "cam_origin_smoothness": cam_origin_smoothness_loss,
    "cam_depth_smoothness": cam_depth_smoothness_loss,
    "traj_rot_smoothness": traj_rot_smoothness_loss,
    "traj_trans_smoothness": traj_trans_smoothness_loss,
    "cam_up_reg": cam_up_reg,
    "cam_traj_rot": cam_traj_rot_loss,
    "cam_traj_trans": cam_traj_trans_loss,
    "traj_rot_res": traj_rot_res_loss,
    "traj_trans_res": traj_trans_res_loss,
    "local_traj_dxy_reg": local_traj_dxy_reg,
    "local_traj_dheading_reg": local_traj_dheading_reg,
    "local_traj_dheading_reg_new": local_traj_dheading_reg_new,
    "local_traj_rot_reg": local_traj_rot_reg,
    "local_traj_z_reg": local_traj_z_reg,
    "cam_inv_trans_residual_reg": cam_inv_trans_residual_reg,
    "person2cam_res_trans_reg": person2cam_res_trans_reg,
    "rel_transform": rel_transform_loss,
    "motion_latent_reg": motion_latent_reg_loss,
    "traj_latent_reg": traj_latent_reg_loss,
    "penetration": penetration_loss,
}


def compute_losses(data: dict, loss_cfg: dict):
    """Weighted sum + per-loss dict (reference compute_loss :533-545)."""
    total = jnp.asarray(0.0, jnp.float32)
    loss_uw = {}
    for name, specs in loss_cfg.items():
        val = loss_func_dict[name](data, specs)
        loss_uw[name] = val
        if not specs.get("monitor_only", False):
            total = total + val * specs["weight"]
    return total, loss_uw

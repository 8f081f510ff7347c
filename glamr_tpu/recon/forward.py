"""Stage-4 differentiable forward graph, TPU-native.

The reference mutates ragged per-person dicts inside a torch Adam closure
(global_recon/models/global_recon_model.py:394-531). Here the whole graph is
ONE pure function

    recon_forward(params, const, flags, cam_mode) -> derived

over fixed-shape [P persons, T frames, ...] arrays, so each optimization
stage compiles to a single XLA program with the Adam loop as a lax.scan.

Layout conventions
------------------
* `const`  — dict of non-optimized arrays + masks + normalization counts,
  built once on the host by recon.data_init / optimizer.prepare_const.
* `params` — dict of optimizable residual leaves. EVERY leaf always exists
  (zero / identity initialised); applying a zero residual is the identity,
  so "which variables does this stage optimize" is purely an optax mask,
  never a change to the graph (the reference instead branches on
  `opt_variables` at :452-469 — same semantics for the shipped configs,
  where unoptimized residuals are always zero).
* Ragged per-person spans [fr_start, fr_end) are padded to T with
  identity local-traj frames (see transforms.traj.IDENTITY_LOCAL_TRAJ);
  after integration, frames outside the span are clamped to the span edge
  (`span_clamp_idx`) so smoothness terms see constant motion there.

Camera modes (static per optimization stage):
  'hold'   — camera frozen at const['cam_pose_init'] (also the init stage)
  'param'  — camera from cam_rot_6d/cam_trans params ('cam' in
             opt_variables; reference :474-480). flags.fixed_cam uses the
             single-frame *_fix params broadcast over T.
  'person' — camera derived per-frame from visible persons' world pose +
             person2cam, forward-filled over person-free frames, with
             rot/trans residuals (reference :481-508).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..transforms import (
    angle_axis_to_quaternion,
    heading_to_vec,
    inverse_transform,
    make_transform,
    quat_mul,
    quaternion_to_angle_axis,
    rot6d_to_rotmat,
    rotmat_to_rot6d,
    traj_local2global_heading,
    transform_rot,
    transform_trans,
    vec_to_heading,
)
from ..transforms.camera import perspective_projection


@dataclass(frozen=True)
class ReconFlags:
    """Static behaviour flags (hashable; part of the jit cache key).

    Mirrors grecon_model_specs (reference global_recon_model.py:37-60).
    """

    pred_traj: bool = True
    opt_traj: bool = True
    opt_cam: bool = True
    fixed_cam: bool = False
    opt_vis_local_rot: bool = False
    opt_person2cam_rot: bool = False
    opt_person2cam_trans: bool = False
    cam_inv_trans_res_all: bool = True
    heading_type: str = "scalar"
    absolute_heading: bool = False
    use_pen_loss: bool = False
    opt_motion_latent: bool = False
    opt_traj_latent: bool = False
    infill_motion: bool = True
    # When False, the motion infiller still completes occluded pose (and
    # its latents stay optimizable) but the trajectory BASE remains the
    # estimate-derived one instead of the traj-CVAE decode — the measured
    # hybrid operating point for procedurally-trained priors (see
    # RESULTS.md CVAE ablation: the prior wins PA/ACCEL but its open-loop
    # heading drift loses G-MPJPE until AMASS-grade training data exists).
    use_traj_prior: bool = True


def cvae_pred(params: dict, const: dict, joint_model) -> tuple:
    """Differentiable CVAE re-inference inside the optimization step
    (reference forward :434-445 re-runs infer_motion_traj when latents are
    optimized). Runs over span-rolled, edge-held (P, T) arrays so all
    persons batch into one infill scan + one trajectory decode:

      * const['in_pose_rolled']   (P, T, 69) smpl_pose_nofill gathered so
        each person's exist span starts at t=0 (pad = edge-hold)
      * const['mask_rolled']      (P, T) visibility, pad frames = 1
      * const['unroll_idx']       (P, T) int32, global t -> rolled index

    Returns (smpl_pose (P,T,69), traj_local_pred (P,T,11)) in global time,
    identity-padded outside the span, differentiable w.r.t.
    params['motion_latent'] (P, L, nz) and params['traj_latent'] (P, nz).
    """
    from ..models.motion_infiller import infill_multi_step

    jm = joint_model
    in_pose = const["in_pose_rolled"]
    mask = const["mask_rolled"]
    # (P, L, nz) -> (L, P, nz) window-major latent layout
    motion_eps = jnp.swapaxes(params["motion_latent"], 0, 1)
    body_pose = infill_multi_step(jm.mfiller, jm.mfiller_params, in_pose,
                                  mask, motion_eps)
    joint_pos = jm.smpl.joint_pos_from_body_pose(body_pose)
    # per-person true span lengths: the trajectory decode's bi-LSTMs and
    # prior pooling see only each person's valid frames (exactly the
    # reference's per-person inference at its own length)
    traj = jm.trajpred.apply(
        jm.trajpred_params, joint_pos, params["traj_latent"],
        method=type(jm.trajpred).decode, lengths=const.get("span_len"),
    )
    local_traj = traj["out_local_traj"]  # (P, T, 11) rolled

    unroll = const["unroll_idx"]
    body_pose_g = jnp.take_along_axis(body_pose, unroll[..., None], axis=1)
    local_g = jnp.take_along_axis(local_traj, unroll[..., None], axis=1)
    exist = const["exist_mask"][..., None]
    smpl_pose = jnp.where(exist > 0, body_pose_g, const["smpl_pose"])
    from ..transforms.traj import IDENTITY_LOCAL_TRAJ

    ident = jnp.asarray(IDENTITY_LOCAL_TRAJ, local_g.dtype)
    traj_local_pred = jnp.where(exist > 0, local_g, ident)
    return smpl_pose, traj_local_pred


# ---------------------------------------------------------------------------
# trajectory composition
# ---------------------------------------------------------------------------

def compose_local_traj(params: dict, const: dict, flags: ReconFlags,
                       traj_local_pred=None) -> jax.Array:
    """traj_local_pred + residuals -> (P, T, 11) (reference :394-419)."""
    tl = const["traj_local_pred"] if traj_local_pred is None else traj_local_pred
    first = const["first_mask"]            # (P, T) 1.0 at fr_start
    rest = const["rest_mask"]              # (P, T) exist & not first
    exist = const["exist_mask"]            # (P, T)
    dh_mask = rest * const["dheading_mask"]  # cam_fix_frames zeroing (:400-402)

    xy = tl[..., 0:2] + first[..., None] * params["traj_local_xy"][:, None, :] \
        + rest[..., None] * params["traj_local_dxy"]
    z = tl[..., 2:3] + (exist * params["traj_local_z"])[..., None]

    rot_mask = const["vis_mask"] if flags.opt_vis_local_rot else exist
    rot = tl[..., 3:9] + rot_mask[..., None] * params["traj_local_rot"]

    hv = tl[..., 9:11]
    if flags.heading_type == "vec":
        # vec mode: residuals add directly to the heading vectors (:403-405);
        # params are (P, 2) / (P, T, 2) in this mode (see init_params)
        hv = hv + first[..., None] * params["traj_local_heading"][:, None, :] \
            + dh_mask[..., None] * params["traj_local_dheading"]
    else:
        h = vec_to_heading(hv)
        h = h + first * params["traj_local_heading"][:, None] \
            + dh_mask * params["traj_local_dheading"]
        hv = heading_to_vec(h)

    return jnp.concatenate([xy, z, rot, hv], axis=-1)


def world_pose_from_traj(params: dict, const: dict, flags: ReconFlags,
                         traj_local_pred=None):
    """Integrate the composed local traj and apply world-level residuals.

    Returns (smpl_orient_world (P,T,3) aa, root_trans_world (P,T,3),
    traj_local (P,T,11)).
    """
    if flags.pred_traj:
        traj_local = compose_local_traj(params, const, flags, traj_local_pred)
        trans, orient_q = traj_local2global_heading(
            traj_local, local_heading=not flags.absolute_heading
        )
        # hold the span edges constant outside [fr_start, fr_end)
        clamp = const["span_clamp_idx"]  # (P, T) int32
        trans = jnp.take_along_axis(trans, clamp[..., None], axis=1)
        orient_q = jnp.take_along_axis(orient_q, clamp[..., None], axis=1)
        orient_aa = quaternion_to_angle_axis(orient_q)
    else:
        traj_local = const["traj_local_pred"]
        orient_aa = const["smpl_orient_world_base"]
        trans = const["root_trans_world_base"]

    if flags.opt_traj:
        orient_aa = orient_aa + params["smpl_orient_world_res"]
        trans = trans + params["root_trans_world_res"]
        # world_dheading: extra yaw applied on top (reference :459-465)
        dh = params["world_dheading"]  # (P, T, 1)
        dh_aa = jnp.concatenate([jnp.zeros_like(dh), jnp.zeros_like(dh), dh], axis=-1)
        orient_q = quat_mul(
            angle_axis_to_quaternion(dh_aa), angle_axis_to_quaternion(orient_aa)
        )
        orient_aa = quaternion_to_angle_axis(orient_q)
        trans = trans.at[..., :2].add(params["world_dxy"])
    return orient_aa, trans, traj_local


# ---------------------------------------------------------------------------
# camera composition
# ---------------------------------------------------------------------------

def _forward_fill_cam(cpi: jax.Array, valid: jax.Array, first_valid: jax.Array):
    """Fill invalid frames of (T,4,4) with the last valid camera; frames
    before the first valid frame take the first valid camera
    (reference :493-498 and :304-311). Vectorized: last-valid index via a
    running max instead of a sequential scan."""
    T = cpi.shape[0]
    t = jnp.arange(T)
    idx = jax.lax.cummax(jnp.where(valid, t, -1))
    idx = jnp.where(idx < 0, first_valid, idx)
    return cpi[idx]


def camera_from_person_pose(params, const, flags, person_transform_world):
    """Derive per-frame camera from visible persons (reference :481-508)."""
    p2c = const["person2cam"]  # (P, T, 4, 4)
    if flags.opt_person2cam_rot or flags.opt_person2cam_trans:
        res = make_transform(
            params["person2cam_res_rot"], params["person2cam_res_trans"], rot_type="6d"
        )
        p2c = jnp.einsum("ptij,ptjk->ptik", p2c, res)
    cpi_per = jnp.einsum("ptij,ptjk->ptik", person_transform_world, p2c)
    vis = const["vis_mask"]  # (P, T)
    num = const["fr_num_persons"]  # (T,)
    cpi = jnp.sum(cpi_per * vis[..., None, None], axis=0) / jnp.maximum(num, 1.0)[
        :, None, None
    ]
    cpi = _forward_fill_cam(cpi, num > 0, const["first_any_vis_idx"])

    rot6 = rotmat_to_rot6d(cpi[:, :3, :3])
    empty = (num == 0)[:, None]
    rot6 = rot6 + jnp.where(empty, params["cam_inv_rot_residual"], 0.0)
    trans = cpi[:, :3, 3]
    if flags.cam_inv_trans_res_all:
        trans = trans + params["cam_inv_trans_residual"]
    else:
        trans = trans + jnp.where(empty, params["cam_inv_trans_residual"], 0.0)
    cam_pose_inv = make_transform(rot6d_to_rotmat(rot6), trans)
    return inverse_transform(cam_pose_inv), cam_pose_inv


def compose_camera(params, const, flags: ReconFlags, cam_mode: str,
                   person_transform_world):
    if cam_mode == "param" and flags.opt_cam:
        T = const["cam_pose_init"].shape[0]
        if flags.fixed_cam:
            rot6 = jnp.broadcast_to(params["cam_rot_6d_fix"], (T, 6))
            trans = jnp.broadcast_to(params["cam_trans_fix"], (T, 3))
        else:
            rot6 = params["cam_rot_6d"]
            trans = params["cam_trans"]
        cam_pose = make_transform(rot6, trans, rot_type="6d")
        return cam_pose, inverse_transform(cam_pose), rot6, trans
    if cam_mode == "person" and flags.opt_cam:
        cam_pose, cam_pose_inv = camera_from_person_pose(
            params, const, flags, person_transform_world
        )
        return cam_pose, cam_pose_inv, None, None
    cam_pose = const["cam_pose_init"]
    return cam_pose, inverse_transform(cam_pose), None, None


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------

def recon_forward(params: dict, const: dict, smpl, flags: ReconFlags,
                  cam_mode: str, joint_model=None,
                  use_latents: bool = False, channels: bool = False) -> dict:
    """The complete differentiable graph: residuals -> world traj -> camera
    -> SMPL joints -> 2D keypoints (reference forward :428-531). With
    use_latents, the CVAEs re-decode from the optimizable latent params
    inside the step (see cvae_pred).

    channels=True: the SMPL-joints -> camera -> projection tail runs in
    channel-leading (SoA) layout and `derived` carries
    `kp_2d_pred_ch (2, K, P, T)` INSTEAD of the array-of-structs
    `kp_2d_pred`/`joints_world` — the per-iteration loss path (the
    keypoint losses dispatch on the _ch key). The (P,T,K,3)/(P,T,K,2)
    tensors are the largest per-iteration intermediates and pay ~40x
    lane padding in AoS form (see body/lbs_soa). Only valid at
    lane-scale P*T under jit with use_pen_loss off; the once-per-stage
    final forward uses channels=False for the output schema.

    Matmul precision is pinned to float32: on TPU the MXU defaults to
    bfloat16, which is fine for the CVAE transformers but loses ~1e-2 on
    chained 3x3 rotation compositions and the pinhole projection —
    enough to corrupt keypoint residuals by >100 px at f=1000. The
    matmuls here are tiny (3x3/4x4 chains + subset skinning), so full
    precision costs almost nothing.
    """
    with jax.default_matmul_precision("float32"):
        return _recon_forward(params, const, smpl, flags, cam_mode,
                              joint_model, use_latents, channels)


def _project_channels(joints_ch, cam_pose, cam_K, eps: float = 1e-9):
    """Camera transform + pinhole projection in channel form.

    joints_ch (K, 3, P, T) world joints; cam_pose (T, 4, 4);
    cam_K (P, T, 3, 3). Returns (2, K, P, T) pixel channels — the same
    arithmetic as transform_trans + perspective_projection (camera.py),
    with the channel slices of cam_pose/cam_K broadcasting over K and P.
    """
    X, Y, Z = joints_ch[:, 0], joints_ch[:, 1], joints_ch[:, 2]  # (K,P,T)
    r = cam_pose
    xc = r[:, 0, 0] * X + r[:, 0, 1] * Y + r[:, 0, 2] * Z + r[:, 0, 3]
    yc = r[:, 1, 0] * X + r[:, 1, 1] * Y + r[:, 1, 2] * Z + r[:, 1, 3]
    zc = r[:, 2, 0] * X + r[:, 2, 1] * Y + r[:, 2, 2] * Z + r[:, 2, 3]
    z_safe = jnp.where(jnp.abs(zc) < eps,
                       jnp.where(zc < 0, -eps, eps), zc)
    px, py, pz = xc / z_safe, yc / z_safe, zc / z_safe
    K = cam_K
    u = K[:, :, 0, 0] * px + K[:, :, 0, 1] * py + K[:, :, 0, 2] * pz
    v = K[:, :, 1, 0] * px + K[:, :, 1, 1] * py + K[:, :, 1, 2] * pz
    return jnp.stack([u, v])                                     # (2,K,P,T)


def _recon_forward(params: dict, const: dict, smpl, flags: ReconFlags,
                   cam_mode: str, joint_model=None,
                   use_latents: bool = False, channels: bool = False) -> dict:
    smpl_pose = const["smpl_pose"]
    traj_local_pred = None
    if use_latents and joint_model is not None:
        cvae_pose, traj_local_pred = cvae_pred(params, const, joint_model)
        if flags.infill_motion:
            smpl_pose = cvae_pose
        if not flags.pred_traj or not flags.use_traj_prior:
            # hybrid mode: keep the infilled pose, drop the traj decode —
            # compose_local_traj falls back to const['traj_local_pred']
            # (the est-derived base); XLA dead-code-eliminates the decode
            traj_local_pred = None
    orient_w, trans_w, traj_local = world_pose_from_traj(
        params, const, flags, traj_local_pred)
    person_tf_world = make_transform(orient_w, trans_w, rot_type="axis_angle")

    cam_pose, cam_pose_inv, cam_rot_6d, cam_trans = compose_camera(
        params, const, flags, cam_mode, person_tf_world
    )

    # per-person pose expressed back in the (possibly moving) camera frame
    orient_ciw = transform_rot(cam_pose[None], orient_w)
    trans_ciw = transform_trans(cam_pose[None], trans_w)

    # SMPL joints (subset skinning) + projection, batched over P*T
    P, T = orient_w.shape[:2]
    derived = {
        "traj_local": traj_local,
        "smpl_pose_used": smpl_pose,
        "smpl_orient_world": orient_w,
        "root_trans_world": trans_w,
        "person_transform_world": person_tf_world,
        "cam_pose": cam_pose,
        "cam_pose_inv": cam_pose_inv,
        "smpl_orient_cam_in_world": orient_ciw,
        "root_trans_cam_in_world": trans_ciw,
    }
    if channels and not flags.use_pen_loss:
        from ..body.lbs_soa import joints_fast_soa

        joints_ch = joints_fast_soa(
            smpl,
            orient_w.reshape(P * T, 3),
            smpl_pose.reshape(P * T, -1),
            const["smpl_beta"].reshape(P * T, -1),
            root_trans=trans_w.reshape(P * T, 3),
            channels_out=True,
        )                                                # (K, 3, P*T)
        joints_ch = joints_ch.reshape(joints_ch.shape[0], 3, P, T)
        derived["kp_2d_pred_ch"] = _project_channels(
            joints_ch, cam_pose, const["cam_K"])
    else:
        joints = smpl.joints_fast(
            orient_w.reshape(P * T, 3),
            smpl_pose.reshape(P * T, -1),
            const["smpl_beta"].reshape(P * T, -1),
            root_trans=trans_w.reshape(P * T, 3),
        ).reshape(P, T, -1, 3)
        joints_cam = transform_trans(cam_pose[None], joints)
        kp_2d_pred = perspective_projection(joints_cam, const["cam_K"])
        derived["joints_world"] = joints
        derived["kp_2d_pred"] = kp_2d_pred
    if cam_rot_6d is not None:
        derived["cam_rot_6d"] = cam_rot_6d
        derived["cam_trans"] = cam_trans
    if flags.use_pen_loss:
        verts = smpl.forward(
            orient_w.reshape(P * T, 3),
            smpl_pose.reshape(P * T, -1),
            const["smpl_beta"].reshape(P * T, -1),
            root_trans=trans_w.reshape(P * T, 3),
        ).vertices
        derived["smpl_verts"] = verts.reshape(P, T, -1, 3)
    return derived

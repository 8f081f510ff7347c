"""Shared machinery for differential tests against /root/reference.

Three pieces:

* ensure_ref(): make the reference package importable with
  pytorch_lightning / smplx stubbed (neither is installed; none of the
  differentially-tested code touches them).
* TorchSMPL: a torch port of the repo's subset-skinning joints path
  (glamr_tpu/body/smpl.py joints_fast_aos + lbs.py rigid_transform),
  built from the SAME SMPLModel arrays as the jax side, exposing the
  reference SMPL.forward(...) call surface (lib/models/smpl.py:289-316).
  licensed smplx model files are absent from this image, so the
  reference's smplx LBS is replaced by this shared-math body model on
  BOTH sides — the differential tests therefore compare everything
  EXCEPT the body model (traj composition, camera composition,
  projection, losses, Adam), which is exactly the stage-4 logic.
* make_ref_optimizer(): a reference GlobalReconOptimizer assembled from
  the REAL unbound methods of the reference class
  (global_recon/models/global_recon_model.py) bound to a lightweight
  self carrying the same flags the reference __init__ reads (:34-62) —
  no reference code is modified; only __init__ (which builds smplx SMPL
  and loads CVAE checkpoints we don't have) is bypassed.
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np

REF = "/root/reference"


def ensure_ref():
    """Idempotently make /root/reference importable (pl/smplx stubbed)."""
    import torch

    if not os.path.isdir(REF):
        return False
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        pl.LightningModule = torch.nn.Module
        pl.__version__ = "0.0-stub"
        sys.modules["pytorch_lightning"] = pl
    if "smplx" not in sys.modules:
        smplx = types.ModuleType("smplx")

        class _SMPL(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        smplx.SMPL = _SMPL
        lbs = types.ModuleType("smplx.lbs")
        for name in ["vertices2joints", "blend_shapes",
                     "batch_rigid_transform", "batch_rodrigues"]:
            setattr(lbs, name, lambda *a, **k: None)
        smplx.lbs = lbs
        sys.modules["smplx"] = smplx
        sys.modules["smplx.lbs"] = lbs
    if REF not in sys.path:
        sys.path.insert(0, REF)
    return True


class TorchSMPL:
    """Reference-surface body model over the repo's SMPLModel arrays.

    forward(...) matches the call made by the reference optimizer
    (global_recon_model.py:517-524) and returns an object with .joints
    equal (to fp tolerance) to the jax side's smpl.joints_fast — the
    math is a line-for-line torch expression of glamr_tpu/body/lbs.py
    rigid_transform + smpl.py joints_fast_aos, with axis-angle ->
    rotmat via the REFERENCE's own conversion (lib/utils/
    konia_transform.py) so the torch graph stays reference-native and
    autograd-differentiable.
    """

    def __init__(self, jax_smpl):
        import torch

        t = lambda x: torch.from_numpy(np.array(x, np.float32))
        self.parents = np.asarray(jax_smpl.model.parents)
        self.joint_template = t(jax_smpl._joint_template)       # (24, 3)
        self.joint_shapedirs = t(jax_smpl._joint_shapedirs)     # (24, 3, 10)
        self.sub_v_template = t(jax_smpl._sub_v_template)
        self.sub_shapedirs = t(jax_smpl._sub_shapedirs)
        self.sub_posedirs = t(jax_smpl._sub_posedirs)
        self.sub_lbs_weights = t(jax_smpl._sub_lbs_weights)
        self.sub_jreg_extra = t(jax_smpl._sub_jreg_extra)
        self.sub_landmark_pos = np.array(jax_smpl._sub_landmark_pos)
        self.joint_map = np.array(jax_smpl.joint_map)
        self.faces = None

    def _rigid_transform(self, rot_mats, rest_joints):
        """lbs.py:33-74 in torch. rot_mats (B,24,3,3), rest (B,24,3)."""
        import torch

        parents = self.parents
        B, J = rest_joints.shape[:2]
        rel = rest_joints.clone()
        rel[:, 1:] = rel[:, 1:] - rest_joints[:, parents[1:]]
        tf = torch.zeros(B, J, 4, 4, dtype=rot_mats.dtype)
        tf[..., :3, :3] = rot_mats
        tf[..., :3, 3] = rel
        tf[..., 3, 3] = 1.0
        chains = [tf[:, 0]]
        for j in range(1, J):
            chains.append(torch.matmul(chains[parents[j]], tf[:, j]))
        global_tf = torch.stack(chains, dim=1)
        posed_joints = global_tf[..., :3, 3]
        corr = torch.einsum("bjik,bjk->bji", global_tf[..., :3, :3], rest_joints)
        rel_tf = global_tf.clone()
        rel_tf[..., :3, 3] = rel_tf[..., :3, 3] - corr
        return posed_joints, rel_tf

    def __call__(self, *a, **k):
        return self.forward(*a, **k)

    def forward(self, global_orient=None, body_pose=None, betas=None,
                root_trans=None, root_scale=None, return_full_pose=False):
        import torch

        from lib.utils.konia_transform import angle_axis_to_rotation_matrix

        B = body_pose.shape[0]
        pose = torch.cat([global_orient, body_pose], dim=-1).float()
        rot_mats = angle_axis_to_rotation_matrix(pose.reshape(B * 24, 3)) \
            .reshape(B, 24, 3, 3)
        rest_joints = self.joint_template + torch.einsum(
            "jcs,bs->bjc", self.joint_shapedirs, betas.float())
        joints24, rel_tf = self._rigid_transform(rot_mats, rest_joints)

        v_shaped = self.sub_v_template + torch.einsum(
            "vcs,bs->bvc", self.sub_shapedirs, betas.float())
        eye = torch.eye(3, dtype=rot_mats.dtype)
        pose_feature = (rot_mats[:, 1:] - eye).reshape(B, -1)
        v_posed = v_shaped + torch.einsum(
            "vcp,bp->bvc", self.sub_posedirs, pose_feature)
        vert_tf = torch.einsum("vj,bjrc->bvrc", self.sub_lbs_weights, rel_tf)
        verts = (torch.einsum("bvij,bvj->bvi", vert_tf[..., :3, :3], v_posed)
                 + vert_tf[..., :3, 3])

        landmarks = verts[:, self.sub_landmark_pos]
        extra = torch.einsum("jv,bvc->bjc", self.sub_jreg_extra, verts)
        joints54 = torch.cat([joints24, landmarks, extra], dim=1)
        joints = joints54[:, self.joint_map]
        if root_trans is not None:
            cur_root = joints[:, :1, :]
            if root_scale is None:
                joints = joints - cur_root + root_trans.float()[:, None, :]
            else:
                joints = (joints - cur_root) * root_scale[:, None, None] \
                    + root_trans.float()[:, None, :]
        return types.SimpleNamespace(joints=joints, vertices=None)


# flag defaults exactly as the reference __init__ reads them (:34-60)
_REF_FLAG_DEFAULTS = {
    "use_gt": False,
    "est_type": "hybrik",
    "flag_infer_motion_traj": False,
    "flag_infill_motion": True,
    "flag_pred_traj": True,
    "flag_opt_traj": True,
    "flag_opt_cam": True,
    "flag_fixed_cam": False,
    "flag_opt_motion_latent": False,
    "flag_opt_traj_latent": False,
    "flag_opt_vis_local_rot": False,
    "flag_opt_person2cam_rot": False,
    "flag_opt_person2cam_trans": False,
    "flag_cam_inv_trans_res_all": True,
    "flag_filter_pose": True,
    "flag_make_invis_with_keypoint": False,
    "make_invis_keypoint_min_score": 0.6,
    "make_invis_keypoint_min_num": 15,
    "flag_opt_cam_from_person_pose": False,
    "flag_init_cam_all_frames": False,
    "flag_traj_from_cam": False,
    "traj_interp_method": "linear_interp",
    "flag_use_pen_loss": False,
    "heading_type": "scalar",
    "absolute_heading": False,
    "cam_fix_frames": [[0, None]],
}


def make_ref_optimizer(specs: dict, opt_stage_specs, torch_smpl,
                       est_traj_init: bool = False):
    """Reference GlobalReconOptimizer from its real unbound methods.

    specs: grecon_model_specs dict (same YAML block both frameworks read).
    est_traj_init: emulate the repo's no-CVAE fallback on the reference
    side — infer_motion_traj is replaced by a function that derives
    traj_local_pred + world bases from the camera-frame estimates under
    the identity world camera (the repo's GlobalReconOptimizer does this
    when no joint model is given), so both sides share the same base
    trajectory and every downstream computation is the genuine reference
    code vs the genuine repo code.
    """
    import torch

    ensure_ref()
    from global_recon.models.global_recon_model import (
        GlobalReconOptimizer as RefOpt,
    )

    self = types.SimpleNamespace()
    self.cfg = types.SimpleNamespace(id="diff-test")
    self.specs = specs
    self.device = torch.device("cpu")
    self.log = None
    self.cur_iter = 0
    # replicate the __init__ attribute reads (:34-60)
    g = specs.get
    for k, dflt in _REF_FLAG_DEFAULTS.items():
        setattr(self, k, g(k, dflt))
    self.smpl = torch_smpl
    self.mt_cfg = types.SimpleNamespace(yml_dict={})
    self.mt_model = None
    self.opt_stage_specs = opt_stage_specs
    self.sdf_loss = None

    for name in ["init_data", "filter_pose", "init_traj_heading_from_cam",
                 "init_cam_pose", "init_default_traj", "get_traj_from_cam",
                 "infer_motion_traj", "get_pred_trajectory_base", "forward",
                 "compute_loss", "optimize_main", "optimize",
                 "get_parameter", "init_opt", "write_logs"]:
        setattr(self, name, types.MethodType(getattr(RefOpt, name), self))

    if est_traj_init:
        from traj_pred.utils.traj_utils import traj_global2local_heading
        from lib.utils.torch_transform import angle_axis_to_quaternion

        def infer_from_est(pose_dict):
            exist_fr = pose_dict["exist_frames"]
            # identity world camera at init => world pose == cam estimate
            orient = pose_dict["smpl_orient_cam"][exist_fr].float()
            trans = pose_dict["root_trans_cam"][exist_fr].float()
            q = angle_axis_to_quaternion(orient)
            pose_dict["traj_local_pred"] = traj_global2local_heading(trans, q)
            pose_dict["traj_predicted"] = True

        self.infer_motion_traj = infer_from_est
    return self

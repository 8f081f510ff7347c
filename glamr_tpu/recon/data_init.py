"""Stage-4 data initialization: pose-estimate dicts -> padded device arrays.

The reference holds ragged per-person dicts of tensors and mutates them
in-place (global_recon/models/global_recon_model.py:76-248). The TPU-native
design converts everything ONCE, on the host, into fixed-shape
[P persons, T frames, ...] arrays + boolean masks, so the whole
optimization compiles to static-shape XLA programs:

  * visibility spans, pose filtering, interpolation/extrapolation of
    invisible frames: host numpy (runs once, data-dependent control flow)
  * all subsequent computation: pure jnp over the padded arrays

Input schema matches the reference's HybrIK pose.pkl (pose_est/hybrik_demo/
demo.py:200-234): per-person dicts with smpl_pose_quat_wroot (rotmats),
smpl_beta, root_trans, kp_2d, cam_K, bboxes_dict{exist}.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
from scipy.spatial.transform import Rotation as _R

from ..body.constants import smpl_to_body26fk_map
from ..transforms import interp_linear_extrap

NUM_KP = 26  # body26fk keypoint count


def _rotmats_to_aa(rotmats: np.ndarray) -> np.ndarray:
    """(N, 24, 3, 3) -> (N, 24, 3) axis-angle.

    Uses the framework's jitted conversion (CPU backend under init) —
    scipy's from_matrix orthogonalizes via SVD, which costs ~60 ms per
    person at T=900 and is unnecessary for detector/HybrIK rotmats (the
    reference feeds them through scipy Rotation at
    global_recon_model.py:104-108; proper rotations either way)."""
    import jax.numpy as jnp

    from ..transforms import rotation_matrix_to_angle_axis

    n = rotmats.shape[0]
    aa = np.asarray(rotation_matrix_to_angle_axis(
        jnp.asarray(rotmats.reshape(-1, 3, 3), jnp.float32)))
    return aa.reshape(n, -1, 3)


def _quat_angle_diff_np(q1: np.ndarray, q2: np.ndarray) -> np.ndarray:
    """Angle between wxyz quaternions (host numpy)."""
    w = np.abs(np.sum(q1 * q2, axis=-1)).clip(-1 + 1e-6, 1 - 1e-6)
    return 2.0 * np.arccos(w)


def _aa_to_quat_np(aa: np.ndarray) -> np.ndarray:
    r = _R.from_rotvec(aa.reshape(-1, 3)).as_quat().reshape(aa.shape[:-1] + (4,))
    return np.roll(r, 1, axis=-1)  # xyzw -> wxyz


@dataclass
class PersonData:
    """Host-side per-person record, all arrays padded to video length T."""

    visible: np.ndarray          # (T,) float 1/0, after pose filtering
    visible_orig: np.ndarray     # (T,) as detected
    exist_frames: np.ndarray     # (T,) bool, [fr_start, fr_end)
    fr_start: int
    fr_end: int
    smpl_pose: np.ndarray        # (T, 69) interp-filled body pose
    smpl_pose_nofill: np.ndarray # (T, 69) zero outside exist span
    smpl_beta: np.ndarray        # (T, 10)
    smpl_orient_cam: np.ndarray  # (T, 3)
    root_trans_cam: np.ndarray   # (T, 3)
    kp_2d: np.ndarray            # (T, 26, 2)
    kp_2d_score: np.ndarray      # (T, 26)
    cam_K: np.ndarray            # (T, 3, 3)

    @property
    def vis_frames(self) -> np.ndarray:
        return self.visible == 1

    @property
    def invis_frames(self) -> np.ndarray:
        return self.visible == 0

    @property
    def exist_len(self) -> int:
        return self.fr_end - self.fr_start


def filter_pose(
    visible: np.ndarray,
    smpl_orient_cam: np.ndarray,
    kp_2d_score: np.ndarray,
    make_invis_with_keypoint: bool = False,
    keypoint_min_score: float = 0.6,
    keypoint_min_num: int = 15,
    angle_threshold: float = np.pi / 3,
) -> np.ndarray:
    """Mark frames with implausible inter-frame root-orientation jumps (and
    optionally too-few confident keypoints) as invisible. Sequential edits,
    host-side (reference: global_recon_model.py:250-271)."""
    visible = visible.astype(np.float32).copy()
    quat = _aa_to_quat_np(smpl_orient_cam)
    d_angle = _quat_angle_diff_np(quat[1:], quat[:-1])
    ind = np.where((d_angle > angle_threshold) & (visible[1:] > 0))[0] + 1
    ind_set = set(ind.tolist())
    for i in ind:
        if visible[i - 1]:
            if i + 1 < quat.shape[0] and visible[i + 1] and (i + 1) not in ind_set:
                visible[i - 1] = 0
            else:
                visible[i] = 0
    if make_invis_with_keypoint:
        vis_ind = np.where(visible == 1.0)[0]
        scores = kp_2d_score[vis_ind]
        num_valid = (scores > keypoint_min_score).sum(axis=1)
        visible[vis_ind[num_valid < keypoint_min_num]] = 0.0
    return visible


def init_person(
    pose_dict: dict,
    num_fr: int,
    flag_filter_pose: bool = True,
    make_invis_with_keypoint: bool = False,
    keypoint_min_score: float = 0.6,
    keypoint_min_num: int = 15,
) -> PersonData:
    """One HybrIK person dict -> PersonData (reference init_data :87-148)."""
    visible = np.asarray(pose_dict["bboxes_dict"]["exist"]).astype(np.float32)
    if visible.shape[0] < num_fr:
        # bucket-padded frame axis: extra frames are invisible
        visible = np.concatenate(
            [visible, np.zeros(num_fr - visible.shape[0], np.float32)])
    visible_orig = visible.copy()
    vis_idx = np.where(visible)[0]
    fr_start, fr_end = int(vis_idx[0]), int(vis_idx[-1]) + 1
    exist_frames = np.zeros(num_fr, bool)
    exist_frames[fr_start:fr_end] = True
    vis_frames = visible == 1

    rotmats = np.asarray(pose_dict["smpl_pose_quat_wroot"], np.float32)
    pose_wroot = _rotmats_to_aa(rotmats)              # (T_vis, 24, 3)
    smpl_pose = pose_wroot[:, 1:].reshape(-1, 69)
    smpl_orient_cam = pose_wroot[:, 0]
    smpl_beta = np.asarray(pose_dict["smpl_beta"], np.float32)
    root_trans_cam = np.asarray(pose_dict["root_trans"], np.float32)

    # remap 24 SMPL kp to body26fk slots with unit confidence
    kp_in = np.asarray(pose_dict["kp_2d"], np.float32)[:, :24]
    m = smpl_to_body26fk_map()
    kp26 = np.zeros((kp_in.shape[0], NUM_KP, 2), np.float32)
    score26 = np.zeros((kp_in.shape[0], NUM_KP), np.float32)
    kp26[:, m[:, 0]] = kp_in[:, m[:, 1]]
    score26[:, m[:, 0]] = 1.0
    cam_K = np.asarray(pose_dict["cam_K"], np.float32)

    # pad to video length: zeros for kp/score/K, linear interp/extrap for
    # pose/beta/trans/orient (reference :127-136)
    def scatter(x):
        out = np.zeros((num_fr,) + x.shape[1:], x.dtype)
        out[vis_frames] = x
        return out

    if not np.all(visible):
        kp26_p, score26_p, cam_K_p = scatter(kp26), scatter(score26), scatter(cam_K)
        smpl_pose = interp_linear_extrap(vis_idx, smpl_pose, num_fr)
        smpl_beta = interp_linear_extrap(vis_idx, smpl_beta, num_fr)
        root_trans_cam = interp_linear_extrap(vis_idx, root_trans_cam, num_fr)
        smpl_orient_cam = interp_linear_extrap(vis_idx, smpl_orient_cam, num_fr)
    else:
        kp26_p, score26_p, cam_K_p = kp26, score26, cam_K

    if flag_filter_pose:
        visible = filter_pose(
            visible, smpl_orient_cam, score26_p,
            make_invis_with_keypoint, keypoint_min_score, keypoint_min_num,
        )

    smpl_pose_nofill = smpl_pose.copy()
    smpl_pose_nofill[~exist_frames] = 0.0

    return PersonData(
        visible=visible.astype(np.float32),
        visible_orig=visible_orig.astype(np.float32),
        exist_frames=exist_frames,
        fr_start=fr_start,
        fr_end=fr_end,
        smpl_pose=smpl_pose.astype(np.float32),
        smpl_pose_nofill=smpl_pose_nofill.astype(np.float32),
        smpl_beta=smpl_beta.astype(np.float32),
        smpl_orient_cam=smpl_orient_cam.astype(np.float32),
        root_trans_cam=root_trans_cam.astype(np.float32),
        kp_2d=kp26_p,
        kp_2d_score=score26_p,
        cam_K=cam_K_p,
    )


@dataclass
class BatchedPersons:
    """All persons stacked to (P, T, ...) numpy arrays. T may exceed the
    true video length when bucket-padded (num_fr_real)."""

    num_persons: int
    num_fr: int
    num_fr_real: int
    person_ids: list
    visible: np.ndarray          # (P, T)
    visible_orig: np.ndarray     # (P, T)
    exist_frames: np.ndarray     # (P, T) bool
    fr_start: np.ndarray         # (P,)
    fr_end: np.ndarray           # (P,)
    smpl_pose: np.ndarray        # (P, T, 69)
    smpl_pose_nofill: np.ndarray
    smpl_beta: np.ndarray        # (P, T, 10)
    smpl_orient_cam: np.ndarray  # (P, T, 3)
    root_trans_cam: np.ndarray   # (P, T, 3)
    kp_2d: np.ndarray            # (P, T, 26, 2)
    kp_2d_score: np.ndarray      # (P, T, 26)
    cam_K: np.ndarray            # (P, T, 3, 3)

    @property
    def vis_frames(self) -> np.ndarray:
        return self.visible == 1

    @property
    def fr_num_persons(self) -> np.ndarray:
        """(T,) number of visible persons per frame (reference :207)."""
        return self.vis_frames.sum(axis=0)


def batch_persons(persons: dict[Any, PersonData], num_fr: int) -> BatchedPersons:
    ids = list(persons.keys())
    stack = lambda k: np.stack([getattr(persons[i], k) for i in ids])
    return BatchedPersons(
        num_persons=len(ids),
        num_fr=num_fr,
        num_fr_real=num_fr,
        person_ids=ids,
        visible=stack("visible"),
        visible_orig=stack("visible_orig"),
        exist_frames=stack("exist_frames"),
        fr_start=np.array([persons[i].fr_start for i in ids], np.int32),
        fr_end=np.array([persons[i].fr_end for i in ids], np.int32),
        smpl_pose=stack("smpl_pose"),
        smpl_pose_nofill=stack("smpl_pose_nofill"),
        smpl_beta=stack("smpl_beta"),
        smpl_orient_cam=stack("smpl_orient_cam"),
        root_trans_cam=stack("root_trans_cam"),
        kp_2d=stack("kp_2d"),
        kp_2d_score=stack("kp_2d_score"),
        cam_K=stack("cam_K"),
    )


def init_batched(in_dict: dict, pad_to: int = 0, **kwargs) -> BatchedPersons:
    """in_dict['est']: {person_id: hybrik pose dict} -> BatchedPersons.

    pad_to: bucket the frame axis up to this length (extra frames are
    invisible/non-existent) so dataset sweeps reuse a few compiled shapes
    instead of one per sequence length. num_fr_real records the true
    length for loss normalization.
    """
    est = in_dict["est"]
    if not est:
        raise ValueError(
            "in_dict['est'] contains no person tracks — stage 1 (detector/"
            "tracker or HybrIK bridge) found nobody in the video. Check the "
            "stage-1 output (pose.pkl) and detector score threshold.")
    any_person = next(iter(est.values()))
    num_fr_real = len(any_person["bboxes_dict"]["exist"])
    num_fr = max(num_fr_real, pad_to)
    persons = {idx: init_person(pd, num_fr, **kwargs) for idx, pd in est.items()}
    bp = batch_persons(persons, num_fr)
    bp.num_fr_real = num_fr_real
    return bp

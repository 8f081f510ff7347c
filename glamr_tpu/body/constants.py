"""SMPL joint metadata: names, orderings, regressor index maps.

These are dataset/model facts (SMPL joint tree, OpenPose-style landmark
naming, H36M evaluation subsets) mirrored from the reference so that
checkpoints, pose pickles and metrics remain interchangeable
(reference: lib/models/smpl.py:23-271, lib/utils/joints.py).
"""
from __future__ import annotations

import numpy as np

NUM_SMPL_JOINTS = 24
NUM_VERTEX_LANDMARKS = 21  # vertex-picked extra landmarks (nose..heels, finger tips)
NUM_EXTRA_JOINTS = 9       # regressed extra joints (J_regressor_extra)

# kinematic tree: parent of each of the 24 SMPL joints
SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
    dtype=np.int32,
)

SMPL_JOINT_NAMES = [
    "pelvis", "left_hip", "right_hip", "spine1", "left_knee", "right_knee",
    "spine2", "left_ankle", "right_ankle", "spine3", "left_foot", "right_foot",
    "neck", "left_collar", "right_collar", "head", "left_shoulder",
    "right_shoulder", "left_elbow", "right_elbow", "left_wrist", "right_wrist",
    "left_index1", "right_index1",
]

# index into the 54-joint output array (24 smpl + 21 vertex landmarks + 9 extra)
# by landmark name (reference: lib/models/smpl.py:35-57)
JOINT_MAP = {
    "OP Nose": 24, "OP Neck": 12, "OP RShoulder": 17,
    "OP RElbow": 19, "OP RWrist": 21, "OP LShoulder": 16,
    "OP LElbow": 18, "OP LWrist": 20, "OP MidHip": 0,
    "OP RHip": 2, "OP RKnee": 5, "OP RAnkle": 8,
    "OP LHip": 1, "OP LKnee": 4, "OP LAnkle": 7,
    "OP REye": 25, "OP LEye": 26, "OP REar": 27,
    "OP LEar": 28, "OP LBigToe": 29, "OP LSmallToe": 30,
    "OP LHeel": 31, "OP RBigToe": 32, "OP RSmallToe": 33, "OP RHeel": 34,
    "Right Ankle": 8, "Right Knee": 5, "Right Hip": 45,
    "Left Hip": 46, "Left Knee": 4, "Left Ankle": 7,
    "Right Wrist": 21, "Right Elbow": 19, "Right Shoulder": 17,
    "Left Shoulder": 16, "Left Elbow": 18, "Left Wrist": 20,
    "Neck (LSP)": 47, "Top of Head (LSP)": 48,
    "Pelvis (MPII)": 49, "Thorax (MPII)": 50,
    "Spine (H36M)": 51, "Jaw (H36M)": 52,
    "Head (H36M)": 53, "Nose": 24, "Left Eye": 26,
    "Right Eye": 25, "Left Ear": 28, "Right Ear": 27,
    "Left Thumb Tip": 35, "Left Index Tip": 36, "Left Middle Tip": 37,
    "Left Ring Tip": 38, "Left Pinky Tip": 39,
    "Right Thumb Tip": 40, "Right Index Tip": 41, "Right Middle Tip": 42,
    "Right Ring Tip": 43, "Right Pinky Tip": 44,
}

# default 49-joint output ordering (reference: lib/models/smpl.py:59-77)
JOINT_NAMES = [
    "OP Nose", "OP Neck", "OP RShoulder", "OP RElbow", "OP RWrist",
    "OP LShoulder", "OP LElbow", "OP LWrist", "OP MidHip", "OP RHip",
    "OP RKnee", "OP RAnkle", "OP LHip", "OP LKnee", "OP LAnkle", "OP REye",
    "OP LEye", "OP REar", "OP LEar", "OP LBigToe", "OP LSmallToe", "OP LHeel",
    "OP RBigToe", "OP RSmallToe", "OP RHeel", "Right Ankle", "Right Knee",
    "Right Hip", "Left Hip", "Left Knee", "Left Ankle", "Right Wrist",
    "Right Elbow", "Right Shoulder", "Left Shoulder", "Left Elbow",
    "Left Wrist", "Neck (LSP)", "Top of Head (LSP)", "Pelvis (MPII)",
    "Thorax (MPII)", "Spine (H36M)", "Jaw (H36M)", "Head (H36M)", "Nose",
    "Left Eye", "Right Eye", "Left Ear", "Right Ear",
]

_BODY26 = [
    "Pelvis (MPII)", "OP LHip", "OP RHip", "Spine (H36M)", "OP LKnee",
    "OP RKnee", "OP Neck", "OP LAnkle", "OP RAnkle", "OP LBigToe",
    "OP RBigToe", "OP LSmallToe", "OP RSmallToe", "OP LHeel", "OP RHeel",
    "OP Nose", "OP LEye", "OP REye", "OP LEar", "OP REar", "OP LShoulder",
    "OP RShoulder", "OP LElbow", "OP RElbow", "OP LWrist", "OP RWrist",
]

# ordered joint-name lists per pose type (reference: smpl.py:118-271)
POSE_TYPE_JOINT_NAMES = {
    "body26": _BODY26,
    "body26fk": _BODY26,
    "body34": _BODY26 + [
        "Left Pinky Tip", "Right Pinky Tip", "Left Middle Tip",
        "Right Middle Tip", "Left Index Tip", "Right Index Tip",
        "Left Thumb Tip", "Right Thumb Tip",
    ],
    "body30": _BODY26 + [
        "Left Pinky Tip", "Right Pinky Tip", "Left Index Tip", "Right Index Tip",
    ],
    "body15": [
        "Pelvis (MPII)", "OP RAnkle", "OP RKnee", "OP RHip", "OP LHip",
        "OP LKnee", "OP LAnkle", "OP RWrist", "OP RElbow", "OP RShoulder",
        "OP LShoulder", "OP LElbow", "OP LWrist", "Neck (LSP)",
        "Top of Head (LSP)",
    ],
}


def joint_indices_for_pose_type(pose_type: str | None) -> np.ndarray:
    """Indices into the 54-joint array selecting the pose type's ordering."""
    names = POSE_TYPE_JOINT_NAMES[pose_type] if pose_type else JOINT_NAMES
    return np.array([JOINT_MAP[n] for n in names], dtype=np.int32)


# H36M 17-joint regressor subsets (reference: smpl.py:23-26)
H36M_TO_J17 = [6, 5, 4, 1, 2, 3, 16, 15, 14, 11, 12, 13, 8, 10, 0, 7, 9]
H36M_TO_J14 = H36M_TO_J17[:14]
H36M_TO_J15 = [H36M_TO_J17[14]] + H36M_TO_J17[:14]
H36M_TO_J16 = H36M_TO_J17[14:16] + H36M_TO_J17[:14]


# --------------------------------------------------------------------------
# joint-set metadata (the reference's lib/utils/joints.py classes, reduced
# to the fields the pipeline actually consumes: names, edges, counts)
# --------------------------------------------------------------------------

BODY26FK_NAMES = {
    0: "pelvis", 1: "left_hip", 2: "right_hip", 3: "torso", 4: "left_knee",
    5: "right_knee", 6: "neck", 7: "left_ankle", 8: "right_ankle",
    9: "left_big_toe", 10: "right_big_toe", 11: "left_small_toe",
    12: "right_small_toe", 13: "left_heel", 14: "right_heel", 15: "nose",
    16: "left_eye", 17: "right_eye", 18: "left_ear", 19: "right_ear",
    20: "left_shoulder", 21: "right_shoulder", 22: "left_elbow",
    23: "right_elbow", 24: "left_wrist", 25: "right_wrist",
}

SMPL_NAMES = {i: n for i, n in enumerate(SMPL_JOINT_NAMES)}
# reference naming for the SMPL joint-info class uses hand/foot names
SMPL_NAMES[22] = "left_hand"
SMPL_NAMES[23] = "right_hand"

COCO_NAMES = {
    0: "nose", 1: "left_eye", 2: "right_eye", 3: "left_ear", 4: "right_ear",
    5: "left_shoulder", 6: "right_shoulder", 7: "left_elbow", 8: "right_elbow",
    9: "left_wrist", 10: "right_wrist", 11: "left_hip", 12: "right_hip",
    13: "left_knee", 14: "right_knee", 15: "left_ankle", 16: "right_ankle",
}

BODY26FK_EDGES = [
    (0, 3), (3, 6), (6, 0), (8, 5), (5, 2), (2, 0), (2, 21), (21, 23),
    (23, 25), (7, 4), (4, 1), (1, 0), (1, 20), (20, 22), (22, 24), (21, 6),
    (20, 6), (6, 15), (15, 17), (17, 19), (15, 16), (16, 18), (8, 14),
    (8, 10), (10, 12), (7, 13), (7, 9), (9, 11),
]


class JointsInfo:
    """Lightweight joint-set descriptor (names / count / edges / root)."""

    def __init__(self, pose_type: str, names: dict, edges=None):
        self.pose_type = pose_type
        self.name = dict(names)
        self.count = len(names)
        self.edges = list(edges) if edges is not None else []
        self.root = 0
        for idx, n in names.items():
            setattr(self, n, idx)


def get_joints_info(pose_type: str) -> JointsInfo:
    if pose_type == "body26fk":
        return JointsInfo("body26fk", BODY26FK_NAMES, BODY26FK_EDGES)
    if pose_type == "smpl":
        return JointsInfo("smpl", SMPL_NAMES)
    if pose_type == "coco":
        return JointsInfo("coco", COCO_NAMES)
    raise ValueError(f"Unknown pose_type: {pose_type}")


def smpl_to_body26fk_map() -> np.ndarray:
    """(K, 2) array of (body26fk index, smpl index) pairs for joints with a
    shared name — used to scatter HybrIK's 24 SMPL 2D keypoints into body26fk
    slots (reference: global_recon/models/global_recon_model.py:82-85)."""
    src = get_joints_info("smpl")
    dst = get_joints_info("body26fk")
    dst_by_name = {v: k for k, v in dst.name.items()}
    pairs = [(dst_by_name[v], k) for k, v in src.name.items() if v in dst_by_name]
    return np.array(sorted(pairs), dtype=np.int32)

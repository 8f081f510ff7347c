"""SMPL body model: parameters, LBS/FK kernels, joint metadata."""
from .constants import (
    H36M_TO_J14,
    H36M_TO_J15,
    H36M_TO_J16,
    H36M_TO_J17,
    JOINT_MAP,
    JOINT_NAMES,
    SMPL_JOINT_NAMES,
    SMPL_PARENTS,
    get_joints_info,
    joint_indices_for_pose_type,
    smpl_to_body26fk_map,
)
from .lbs import lbs, reroot, rigid_fk, rigid_transform
from .model import SMPLModel, load_smpl, synthetic_smpl_model
from .smpl import SMPL, SMPLOutput, get_smpl

__all__ = [k for k in dir() if not k.startswith("_")]

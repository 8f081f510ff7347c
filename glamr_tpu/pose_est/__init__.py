"""Stage-1 pose estimation bridge (HybrIK subprocess + pose.pkl schema)."""
from .bridge import (
    POSE_PKL_SCHEMA,
    run_pose_est_on_video,
    load_pose_pkl,
    synthetic_pose_est,
    validate_pose_dict,
)

__all__ = [k for k in dir() if not k.startswith("_")]

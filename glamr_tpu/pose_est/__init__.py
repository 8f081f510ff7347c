"""Stage-1 pose estimation: HybrIK subprocess bridge + the in-framework
estimator (keypoint lifter + analytic twist-swing IK)."""
from .bridge import (
    POSE_PKL_SCHEMA,
    run_pose_est_on_video,
    load_pose_pkl,
    synthetic_pose_est,
    validate_pose_dict,
)
from .estimator import lifter_pose_est, load_lifter, run_lifter_on_tracks
from .ik import hybrik, twist_angles
from .lifter import KeypointLifter, LifterConfig

__all__ = [k for k in dir() if not k.startswith("_")]

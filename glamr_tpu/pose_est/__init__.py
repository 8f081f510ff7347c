"""Stage-1 pose estimation: HybrIK subprocess bridge + the in-framework
estimator (keypoint lifter + analytic twist-swing IK)."""
from .bridge import (
    POSE_PKL_SCHEMA,
    run_pose_est_on_video,
    load_pose_pkl,
    synthetic_pose_est,
    validate_pose_dict,
)
from .detector import DetectorConfig, PersonKeypointDetector, decode_detections
from .estimator import (
    detect_video,
    lifter_pose_est,
    load_detector,
    load_lifter,
    run_lifter_on_tracks,
    video_pose_est,
)
from .ik import hybrik, twist_angles
from .lifter import KeypointLifter, LifterConfig
from .tracker import GreedyTracker, track_detections

__all__ = [k for k in dir() if not k.startswith("_")]

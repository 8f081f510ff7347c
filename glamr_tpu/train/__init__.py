"""pjit data-parallel training loops for the CVAEs + keypoint lifter."""
from .trainer import (
    make_infiller_eval_step,
    make_trajpred_eval_step,
    make_trajpred_device_step,
    make_lifter_train_step,
    make_lifter_eval_step,
    make_detector_train_step,
    make_detector_eval_step,
    TrainState,
    make_infiller_train_step,
    make_trajpred_train_step,
    init_infiller,
    init_trajpred,
)

__all__ = [k for k in dir() if not k.startswith("_")]

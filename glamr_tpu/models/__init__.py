"""Model registry (mirrors the reference's model_dict pattern:
motion_infiller/models/__init__.py:5-7, traj_pred/models/__init__.py:4-6)."""
from .configs import MotionInfillerConfig, TrajPredConfig, TransformerSpec
from .dist import Categorical, Normal
from .joint_model import JointModel, load_joint_model
from .motion_infiller import (
    MotionInfillerVAE,
    infill_multi_step,
    recon_multi_step,
    num_latents,
    num_windows,
)
from .nn import (
    GRU,
    LSTM,
    MLP,
    MultiHeadAttention,
    PositionalEncoding,
    TransformerDecoder,
    TransformerEncoder,
)
from .traj_pred import TrajPredVAE, predict_multi_step

model_dict = {
    "motion_infiller_vae": MotionInfillerVAE,
    "traj_pred_vae": TrajPredVAE,
}

__all__ = [k for k in dir() if not k.startswith("_")]

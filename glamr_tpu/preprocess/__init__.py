"""Dataset preprocessing: AMASS (CVAE training), 3DPW and Dynamic-H36M
(benchmark evaluation)."""
from .amass import process_amass, resample_sequence, smplh_to_smpl_pose
from .threedpw import convert_3dpw
from .h36m import (convert_h36m, convert_h36m_sequence,
                   create_occluded_scene, gen_sinusoidal_traj)

__all__ = [k for k in dir() if not k.startswith("_")]

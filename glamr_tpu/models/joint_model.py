"""Joint motion-infiller + trajectory-predictor model.

Composes the two pretrained CVAEs: infill occluded body pose, derive
root-relative joint positions via template FK, then predict the global
trajectory — the generative backbone that stage-4 optimizes through
(reference: motion_infiller/models/motion_traj_joint_model.py).

Everything here is a pure, differentiable function of the latent `eps`
arrays, which is exactly what stage-4 latent optimization requires
(reference get_motion_latent/get_traj_latent :135-139).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..body.smpl import SMPL
from .configs import MotionInfillerConfig, TrajPredConfig
from .motion_infiller import MotionInfillerVAE, infill_multi_step, num_latents
from .traj_pred import TrajPredVAE, predict_multi_step


@dataclass
class JointModel:
    """Bundles the two CVAEs, their params and an SMPL instance."""

    mfiller: MotionInfillerVAE
    mfiller_params: Any
    trajpred: TrajPredVAE
    trajpred_params: Any
    smpl: SMPL
    multi_step_mfiller: bool = True
    multi_step_trajpred: bool = False

    # -------------------------------------------------------------- latents
    def motion_latent_shape(self, seq_len: int) -> tuple:
        return (num_latents(self.mfiller.cfg, seq_len), self.mfiller.cfg.nz)

    def traj_latent_shape(self, seq_len: int) -> tuple:
        return (1, self.trajpred.cfg.nz)

    # ------------------------------------------------------------ inference
    def infer(
        self,
        in_body_pose: jax.Array,   # (B, T, 69) masked body pose
        frame_mask: jax.Array,     # (B, T) 1 = visible
        motion_eps: jax.Array,     # (num_windows, B, nz_m)
        traj_eps: jax.Array,       # (B, nz_t) or (1, nz_t)
        init_xy: Optional[jax.Array] = None,
        init_heading: Optional[jax.Array] = None,
    ) -> dict:
        """Full generative pass. Differentiable w.r.t. both eps arrays."""
        if self.multi_step_mfiller:
            body_pose = infill_multi_step(
                self.mfiller, self.mfiller_params, in_body_pose, frame_mask, motion_eps
            )
        else:
            out = self.mfiller.apply(
                self.mfiller_params, in_body_pose, frame_mask, motion_eps[0],
                method=MotionInfillerVAE.infer_step,
            )
            body_pose = out

        joint_pos = self.smpl.joint_pos_from_body_pose(body_pose)

        if self.multi_step_trajpred:
            traj = predict_multi_step(
                self.trajpred, self.trajpred_params, joint_pos, traj_eps,
                init_xy, init_heading,
            )
        else:
            traj = self.trajpred.apply(
                self.trajpred_params, joint_pos, traj_eps, init_xy, init_heading,
                method=TrajPredVAE.decode,
            )
        return {
            "body_pose": body_pose,                  # (B, T, 69)
            "joint_pos": joint_pos,                  # (B, T, 69)
            "local_traj": traj["out_local_traj"],    # (B, T, 11)
            "trans": traj["out_trans"],              # (B, T, 3)
            "orient_q": traj["out_orient_q"],        # (B, T, 4)
        }

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

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..body.smpl import SMPL
from .configs import MotionInfillerConfig, TrajPredConfig
from .motion_infiller import MotionInfillerVAE, infill_multi_step, num_latents
from .traj_pred import TrajPredVAE, predict_multi_step


def load_joint_model(mt_cfg, smpl=None, rng_seed: int = 0,
                     require_checkpoints: bool = False,
                     random_init: bool = False):
    """Build a JointModel from a joint_motion_traj config (reference
    MotionTrajJointModel.__init__/load_* :17-71): resolves the two model
    configs, initializes the flax modules, and loads the latest trained
    checkpoints from results_root_dir/<cfg>/version_N/checkpoints when
    present (randomly-initialized params otherwise, unless
    require_checkpoints). `random_init=True` skips checkpoint loading
    entirely — the untrained-prior arm of CVAE ablations.
    """
    import os

    import jax
    import jax.numpy as jnp

    from ..body.smpl import get_smpl
    from ..utils.checkpoint import load_checkpoint
    from ..utils.config import Config
    from ..utils.tools import resolve_results_dir

    specs = mt_cfg.model_specs
    mf_yaml = Config(specs["mfiller_cfg"])
    tp_yaml = Config(specs["trajpred_cfg"])
    mcfg = MotionInfillerConfig.from_dict(mf_yaml.model_specs)
    tcfg = TrajPredConfig.from_dict(tp_yaml.model_specs,
                                    seq_len=tp_yaml.get("seq_len", 100))
    mfiller = MotionInfillerVAE(mcfg)
    trajpred = TrajPredVAE(tcfg)

    rng = jax.random.PRNGKey(rng_seed)
    W = mcfg.window_len
    mf_params = mfiller.init(rng, jnp.zeros((1, W, 69)), jnp.zeros((1, W, 69)),
                             jnp.ones((1, W)))
    q0 = jnp.tile(jnp.array([1.0, 0, 0, 0]), (1, 8, 1))
    tp_params = trajpred.init(rng, jnp.zeros((1, 8, 69)), jnp.zeros((1, 8, 3)), q0)

    def latest_cp(yaml_cfg, cp_sel):
        from ..utils.tools import find_checkpoint_across_versions

        base = os.path.join(
            resolve_results_dir(yaml_cfg.get("results_root_dir", "results")),
            yaml_cfg.id)
        p = find_checkpoint_across_versions(base, cp_sel)
        if p is not None:
            return p
        # committed params-only release artifact (glamr-export-params)
        from ..utils.checkpoint import released_checkpoint_path
        return released_checkpoint_path(yaml_cfg.id)

    for name, params_ref, yaml_cfg, sel in [] if random_init else [
        ("mfiller", "mf", mf_yaml, specs.get("mfiller_cp", "best")),
        ("trajpred", "tp", tp_yaml, specs.get("trajpred_cp", "best")),
    ]:
        cp = latest_cp(yaml_cfg, sel)
        if cp is None:
            if require_checkpoints:
                raise FileNotFoundError(f"no checkpoint for {name} ({yaml_cfg.id})")
        else:
            from ..utils.checkpoint import extract_params
            loaded = extract_params(load_checkpoint(cp))
            if name == "mfiller":
                mf_params = loaded
            else:
                tp_params = loaded

    return JointModel(
        mfiller=mfiller, mfiller_params=mf_params,
        trajpred=trajpred, trajpred_params=tp_params,
        smpl=smpl or get_smpl("body26fk"),
        multi_step_mfiller=mt_cfg.get("multi_step_mfiller", True),
        multi_step_trajpred=mt_cfg.get("multi_step_trajpred", False),
    )


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
    def infer_samples(
        self,
        in_body_pose: jax.Array,   # (B, T, 69)
        frame_mask: jax.Array,     # (B, T)
        rng: jax.Array,
        sample_num: int = 1,
        init_xy: Optional[jax.Array] = None,
        init_heading: Optional[jax.Array] = None,
    ) -> dict:
        """Draw sample_num independent prior samples (the reference's
        sample_num / num_motion_samp path, motion_traj_joint_model.py:141
        + cfg num_motion_samp) — vmapped over the sample axis; outputs get
        a leading (S, ...) axis."""
        from .motion_infiller import num_latents

        T = in_body_pose.shape[1]
        L = num_latents(self.mfiller.cfg, T)
        B = in_body_pose.shape[0]
        k1, k2 = jax.random.split(rng)
        motion_eps = jax.random.normal(
            k1, (sample_num, L, B, self.mfiller.cfg.nz))
        traj_eps = jax.random.normal(
            k2, (sample_num, B, self.trajpred.cfg.nz))

        def one(me, te):
            return self.infer(in_body_pose, frame_mask, me, te,
                              init_xy, init_heading)

        return jax.vmap(one)(motion_eps, traj_eps)

    def infer(
        self,
        in_body_pose: jax.Array,   # (B, T, 69) masked body pose
        frame_mask: jax.Array,     # (B, T) 1 = visible
        motion_eps: jax.Array,     # (num_windows, B, nz_m)
        traj_eps: jax.Array,       # (B, nz_t) or (1, nz_t)
        init_xy: Optional[jax.Array] = None,
        init_heading: Optional[jax.Array] = None,
    ) -> dict:
        """Full generative pass. Differentiable w.r.t. both eps arrays.

        float32 matmuls: the decoded trajectory feeds stage-4 keypoint
        residuals, where TPU bf16 rotation chains cost >100 px (see
        recon.forward.recon_forward).
        """
        with jax.default_matmul_precision("float32"):
            return self._infer(in_body_pose, frame_mask, motion_eps, traj_eps,
                               init_xy, init_heading)

    def _infer(self, in_body_pose, frame_mask, motion_eps, traj_eps,
               init_xy=None, init_heading=None) -> dict:
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

"""High-level SMPL interface: full forward with extended joint sets.

Mirrors the reference's SMPL wrapper surface (lib/models/smpl.py:274-343):
  * forward(...)    -> vertices + pose-type-ordered joints, root re-anchored
  * get_joints(...) -> template-skeleton FK fast path (24 joints)

but as pure jittable functions over an SMPLModel pytree. The 54-joint
extended set = 24 kinematic joints + 21 vertex landmarks + 9 regressed
extras, then an index map selects/orders per pose type ('body26fk', ...).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .lbs import lbs, reroot, rigid_fk
from .model import SMPLModel, load_smpl, synthetic_smpl_model


class SMPLOutput(NamedTuple):
    vertices: jax.Array  # (B, V, 3)
    joints: jax.Array    # (B, K, 3) pose-type ordered
    joints24: jax.Array  # (B, 24, 3) raw kinematic joints


class SMPL:
    """Thin stateless wrapper binding an SMPLModel + a pose-type joint map.

    Methods are jit-compatible (the instance only holds static arrays and
    python ints, and is hashed by identity for jit static args — prefer
    calling through module-level partials or closing over the instance).
    """

    def __init__(self, model: SMPLModel | None = None, pose_type: str | None = "body26fk"):
        self.model = model if model is not None else load_smpl()
        self.pose_type = pose_type
        self.joint_map = jnp.asarray(C.joint_indices_for_pose_type(pose_type))
        self.num_joints = int(self.joint_map.shape[0])
        self.faces = self.model.faces

    # ---------------------------------------------------------------- forward
    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    def forward(
        self,
        global_orient: jax.Array,        # (B, 3) axis-angle
        body_pose: jax.Array,            # (B, 69) axis-angle
        betas: jax.Array,                # (B, 10)
        root_trans: jax.Array | None = None,  # (B, 3)
        root_scale: jax.Array | None = None,  # (B,)
        pose2rot: bool = True,
    ) -> SMPLOutput:
        """Full LBS + extended joints, optionally re-rooted at root_trans
        (reference: smpl.py:289-316)."""
        pose = jnp.concatenate([global_orient, body_pose], axis=-1)
        verts, joints24 = lbs(self.model, betas, pose, pose2rot=pose2rot)

        landmarks = verts[:, self.model.landmark_vertex_ids]          # (B, 21, 3)
        extra = jnp.einsum("jv,bvc->bjc", self.model.j_regressor_extra, verts)
        joints54 = jnp.concatenate([joints24, landmarks, extra], axis=1)
        joints = joints54[:, self.joint_map]

        if root_trans is not None:
            verts = reroot(verts, joints, root_trans, root_scale)
            joints24 = reroot(joints24, joints, root_trans, root_scale)
            joints = reroot(joints, joints, root_trans, root_scale)
        return SMPLOutput(vertices=verts, joints=joints, joints24=joints24)

    # ------------------------------------------------------------- fast paths
    def get_joints(
        self,
        global_orient: jax.Array,
        body_pose: jax.Array,
        betas: jax.Array | None = None,   # accepted for parity; unused, like the reference
        transl: jax.Array | None = None,
        root_trans: jax.Array | None = None,
        root_scale: jax.Array | None = None,
        pose2rot: bool = True,
    ) -> jax.Array:
        """Template-skeleton FK, 24 joints — no blend shapes, no skinning
        (matches reference get_joints which ignores betas: smpl.py:318-343)."""
        joints = rigid_fk(self.model, global_orient, body_pose, transl, pose2rot)
        if root_trans is not None:
            joints = reroot(joints, joints, root_trans, root_scale)
        return joints

    def joint_pos_from_body_pose(self, body_pose: jax.Array) -> jax.Array:
        """Root-relative 23-joint positions (69-D) from body pose — the
        CVAE conditioning signal (motion_infiller_vae.py:484-493)."""
        flat = body_pose.reshape(-1, 69)
        zeros = jnp.zeros_like(flat[:, :3])
        joints = self.get_joints(zeros, flat, root_trans=zeros)
        out = joints[:, 1:, :].reshape(body_pose.shape[:-1] + (69,))
        return out

    def shaped_joint_pos(self, body_pose: jax.Array, betas: jax.Array,
                         root_scale: jax.Array | None = None) -> jax.Array:
        """Root-relative 23-joint positions with shape applied (full LBS
        joints path used when traj predictor consumes shaped joints —
        motion_traj_joint_model.py:84-95)."""
        flat = body_pose.reshape(-1, 69)
        zeros = jnp.zeros_like(flat[:, :3])
        _, joints24 = lbs(
            self.model, betas.reshape(-1, 10),
            jnp.concatenate([zeros, flat], axis=-1), want_verts=False,
        )
        joints24 = reroot(joints24, joints24, zeros, root_scale)
        return joints24[:, 1:, :].reshape(body_pose.shape[:-1] + (69,))


_DEFAULT: dict = {}


def get_smpl(pose_type: str = "body26fk", synthetic: bool | None = None,
             num_verts: int | None = None) -> SMPL:
    """Process-wide cached SMPL instances (model arrays are shared)."""
    key = (pose_type, synthetic, num_verts)
    if key not in _DEFAULT:
        if synthetic:
            model = synthetic_smpl_model(num_verts or 1728)
        else:
            model = load_smpl()
        _DEFAULT[key] = SMPL(model, pose_type)
    return _DEFAULT[key]

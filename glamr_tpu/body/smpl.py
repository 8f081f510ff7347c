"""High-level SMPL interface: full forward with extended joint sets.

Mirrors the reference's SMPL wrapper surface (lib/models/smpl.py:274-343):
  * forward(...)    -> vertices + pose-type-ordered joints, root re-anchored
  * get_joints(...) -> template-skeleton FK fast path (24 joints)

but as pure jittable functions over an SMPLModel pytree. The 54-joint
extended set = 24 kinematic joints + 21 vertex landmarks + 9 regressed
extras, then an index map selects/orders per pose type ('body26fk', ...).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .lbs import lbs, reroot, rigid_fk
from .model import SMPLModel, load_smpl, synthetic_smpl_model


def _use_soa(body_pose) -> bool:
    """Route to the channel-leading (SoA) body-math path only when it
    pays: batch at least a lane-width multiple AND under a jit trace
    (eagerly, SoA's ~2k tiny ops would each be their own dispatch)."""
    return body_pose.shape[0] >= 128 and isinstance(body_pose, jax.core.Tracer)


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
        self._build_joint_submodel()

    def _build_joint_submodel(self):
        """Precompute the vertex subset the extended joint set depends on.

        The pose-type joints are 24 kinematic joints + vertex landmarks +
        regressed extras. Only the landmark vertices and the (sparse)
        support of j_regressor_extra are ever read from the skinned mesh,
        so the stage-4 hot loop skins just those ~O(100) vertices instead
        of the full 6890 — the same math, ~50x less HBM/FLOP traffic.
        Rest-pose joints fold the shape blend through the regressor:
        J(beta) = J_template + (J_reg @ shapedirs) . beta, so no full-mesh
        blend shape is needed either.
        """
        m = self.model
        lm = np.asarray(m.landmark_vertex_ids)
        extra_support = np.unique(np.nonzero(np.asarray(m.j_regressor_extra))[1])
        sub = np.unique(np.concatenate([lm, extra_support]))
        pos = {v: i for i, v in enumerate(sub.tolist())}
        self._sub_verts = jnp.asarray(sub)
        self._sub_landmark_pos = jnp.asarray(np.array([pos[v] for v in lm], np.int32))
        self._sub_v_template = m.v_template[sub]
        self._sub_shapedirs = m.shapedirs[sub]
        self._sub_posedirs = m.posedirs[sub]
        self._sub_lbs_weights = m.lbs_weights[sub]
        self._sub_jreg_extra = m.j_regressor_extra[:, sub]
        # rest-joint shape blend folded through the joint regressor
        self._joint_template = jnp.einsum("jv,vc->jc", m.j_regressor, m.v_template)
        self._joint_shapedirs = jnp.einsum("jv,vcs->jcs", m.j_regressor, m.shapedirs)

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

    def joints_fast(
        self,
        global_orient: jax.Array,        # (B, 3) axis-angle
        body_pose: jax.Array,            # (B, 69)
        betas: jax.Array,                # (B, 10)
        root_trans: jax.Array | None = None,
        root_scale: jax.Array | None = None,
    ) -> jax.Array:
        """Pose-type joints via subset skinning — numerically identical to
        forward(...).joints but skins only the vertices the joint set reads
        (see _build_joint_submodel). The stage-4 optimizer's hot op.

        At production batch sizes this runs in channel-leading (SoA)
        layout: the batch axis stays on the TPU lane dimension throughout
        (see lbs_soa; ~9x over the AoS form inside the optimizer scan,
        results equal to ~1e-6). Below the lane width there is nothing to
        gain and the SoA graph's ~2k HLO ops compile much slower, so tiny
        static batches keep the AoS form (B is static under jit — the
        choice is per compiled program, not data-dependent). Eager calls
        also stay AoS: SoA's ~2k tiny ops only pay off fused under jit —
        eagerly each would be its own dispatch."""
        if _use_soa(body_pose):
            from .lbs_soa import joints_fast_soa

            return joints_fast_soa(self, global_orient, body_pose, betas,
                                   root_trans, root_scale)
        return self.joints_fast_aos(global_orient, body_pose, betas,
                                    root_trans, root_scale)

    def joints_fast_aos(
        self,
        global_orient: jax.Array,        # (B, 3) axis-angle
        body_pose: jax.Array,            # (B, 69)
        betas: jax.Array,                # (B, 10)
        root_trans: jax.Array | None = None,
        root_scale: jax.Array | None = None,
    ) -> jax.Array:
        """Array-of-structs reference implementation of joints_fast (same
        math in (B, J, 3, 3) layout; kept as the equivalence oracle)."""
        from .lbs import rigid_transform, rodrigues

        B = body_pose.shape[0]
        pose = jnp.concatenate([global_orient, body_pose], axis=-1)
        rot_mats = rodrigues(pose.reshape(B, 24, 3))

        rest_joints = self._joint_template + jnp.einsum(
            "jcs,bs->bjc", self._joint_shapedirs, betas
        )
        joints24, rel_tf = rigid_transform(rot_mats, rest_joints, self.model.parents)

        v_shaped = self._sub_v_template + jnp.einsum(
            "vcs,bs->bvc", self._sub_shapedirs, betas
        )
        eye = jnp.eye(3, dtype=rot_mats.dtype)
        pose_feature = (rot_mats[:, 1:] - eye).reshape(B, -1)
        v_posed = v_shaped + jnp.einsum("vcp,bp->bvc", self._sub_posedirs, pose_feature)
        vert_tf = jnp.einsum("vj,bjrc->bvrc", self._sub_lbs_weights, rel_tf)
        verts = (
            jnp.einsum("bvij,bvj->bvi", vert_tf[..., :3, :3], v_posed)
            + vert_tf[..., :3, 3]
        )

        landmarks = verts[:, self._sub_landmark_pos]
        extra = jnp.einsum("jv,bvc->bjc", self._sub_jreg_extra, verts)
        joints54 = jnp.concatenate([joints24, landmarks, extra], axis=1)
        joints = joints54[:, self.joint_map]
        if root_trans is not None:
            joints = reroot(joints, joints, root_trans, root_scale)
        return joints

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
        (matches reference get_joints which ignores betas: smpl.py:318-343).

        Large static batches under jit take the channel-leading FK
        (lbs_soa) — this is the CVAE-training hot op
        (joint_pos_from_body_pose runs it at batch x seq_len frames
        inside the fused train step)."""
        if pose2rot and _use_soa(body_pose):
            from .lbs_soa import rigid_fk_soa

            joints = rigid_fk_soa(self.model, global_orient, body_pose, transl)
        else:
            joints = rigid_fk(self.model, global_orient, body_pose, transl,
                              pose2rot)
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
    """Process-wide cached SMPL instances (model arrays are shared).

    Construction is pinned to the CPU backend: building the model issues
    dozens of small ops whose compiles each cost a round-trip when the
    default device is a (possibly remote) TPU; jitted consumers transfer
    the arrays once at compile time.
    """
    key = (pose_type, synthetic, num_verts)
    if key not in _DEFAULT:
        from ..utils.cache import host_prep_scope
        with host_prep_scope():
            if synthetic:
                model = synthetic_smpl_model(num_verts or 1728)
            else:
                model = load_smpl()
            _DEFAULT[key] = SMPL(model, pose_type)
    return _DEFAULT[key]

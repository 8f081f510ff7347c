"""Linear blend skinning and rigid forward kinematics, TPU-native.

Pure functions over (SMPLModel, batched inputs). The batch axis is flat —
callers vmap/reshape persons x frames into it — so every op is a large
matmul or einsum that XLA tiles onto the MXU:

  * blend shapes:      (B, 10) @ (10, V*3)
  * pose correctives:  (B, 207) @ (207, V*3)
  * joint regression:  (J, V) @ (B, V, 3)
  * skinning:          (V, J) @ (B, J, 12) then per-vertex affine

The 24-joint FK is an unrolled loop over the static kinematic tree
(24 tiny batched matmuls — negligible next to skinning).

Reference behaviour: smplx.lbs.lbs / batch_rigid_transform as used by
lib/models/smpl.py:289-343; re-derived from the SMPL formulation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .model import SMPLModel


def rodrigues(aa: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3)."""
    from ..transforms.rotation import angle_axis_to_rotation_matrix

    return angle_axis_to_rotation_matrix(aa)


def rigid_transform(
    rot_mats: jax.Array,  # (B, J, 3, 3)
    joints: jax.Array,    # (B, J, 3) rest joints
    parents,              # (J,) numpy int
) -> tuple[jax.Array, jax.Array]:
    """Forward kinematics along the SMPL tree.

    Returns (posed_joints (B, J, 3), rel_transforms (B, J, 4, 4)) where
    rel_transforms map rest-pose vertices to posed space (the "A" matrices
    of the SMPL paper with the rest-joint offset folded in).
    """
    B, J = joints.shape[0], joints.shape[1]
    rel_joints = joints.at[:, 1:].add(-joints[:, parents[1:]])

    def make_tf(rot, t):
        tf = jnp.zeros(rot.shape[:-2] + (4, 4), rot.dtype)
        tf = tf.at[..., :3, :3].set(rot)
        tf = tf.at[..., :3, 3].set(t)
        return tf.at[..., 3, 3].set(1.0)

    local_tf = make_tf(rot_mats, rel_joints)  # (B, J, 4, 4)

    # unrolled tree walk: parent chains are static, 24 joints. These 4x4
    # chain products are tiny but accuracy-critical (errors compound down
    # the tree), so pin them to full f32 precision on the MXU.
    # (A level-batched walk — one einsum per tree DEPTH with gathers —
    # was tried and is 16x SLOWER inside the optimizer scan: the gather/
    # concat backward lowers to scatter-adds, while this unrolled form
    # lowers to static slices XLA fuses cleanly.)
    hp = jax.lax.Precision.HIGHEST
    chains = [local_tf[:, 0]]
    for j in range(1, J):
        chains.append(
            jnp.einsum("bij,bjk->bik", chains[parents[j]], local_tf[:, j], precision=hp)
        )
    global_tf = jnp.stack(chains, axis=1)  # (B, J, 4, 4)

    posed_joints = global_tf[..., :3, 3]
    # subtract the rest-joint offset: A = G - pack(G[..., :3, :3] @ rest_joint)
    correction = jnp.einsum("bjik,bjk->bji", global_tf[..., :3, :3], joints, precision=hp)
    rel_tf = global_tf.at[..., :3, 3].add(-correction)
    return posed_joints, rel_tf


def lbs(
    model: SMPLModel,
    betas: jax.Array,       # (B, 10)
    pose: jax.Array,        # (B, 72) axis-angle or (B, 24, 3, 3) rotmats
    pose2rot: bool = True,
    want_verts: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Full SMPL forward: returns (vertices (B, V, 3), joints (B, J, 3)).

    vertices is None when want_verts=False (joints-only fast path still
    applies blend shapes, unlike rigid_fk which matches the reference's
    template-only get_joints)."""
    B = betas.shape[0]
    J = model.num_joints

    # shape blend: v_template + shapedirs . betas
    v_shaped = model.v_template + jnp.einsum(
        "vcs,bs->bvc", model.shapedirs, betas
    )
    rest_joints = jnp.einsum("jv,bvc->bjc", model.j_regressor, v_shaped)

    if pose2rot:
        rot_mats = rodrigues(pose.reshape(B, J, 3))
    else:
        rot_mats = pose.reshape(B, J, 3, 3)

    posed_joints, rel_tf = rigid_transform(rot_mats, rest_joints, model.parents)

    if not want_verts:
        return None, posed_joints

    # pose-corrective blend shapes from the non-root rotations
    eye = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(B, -1)  # (B, 207)
    v_posed = v_shaped + jnp.einsum("vcp,bp->bvc", model.posedirs, pose_feature)

    # skinning: per-vertex affine = lbs_weights @ rel transforms
    vert_tf = jnp.einsum("vj,bjrc->bvrc", model.lbs_weights, rel_tf)  # (B,V,4,4)
    verts = (
        jnp.einsum("bvij,bvj->bvi", vert_tf[..., :3, :3], v_posed)
        + vert_tf[..., :3, 3]
    )
    return verts, posed_joints


def rigid_fk(
    model: SMPLModel,
    global_orient: jax.Array,  # (B, 3) axis-angle
    body_pose: jax.Array,      # (B, 69)
    transl: jax.Array | None = None,
    pose2rot: bool = True,
) -> jax.Array:
    """Joints-only FK on the *template* skeleton (no blend shapes) — the
    reference's fast SMPL.get_joints path (lib/models/smpl.py:318-343)."""
    pose = jnp.concatenate([global_orient, body_pose], axis=-1)
    B = pose.shape[0]
    J = model.num_joints
    rest_joints = jnp.einsum("jv,vc->jc", model.j_regressor, model.v_template)
    rest_joints = jnp.broadcast_to(rest_joints, (B, J, 3))
    if pose2rot:
        rot_mats = rodrigues(pose.reshape(B, J, 3))
    else:
        rot_mats = pose.reshape(B, J, 3, 3)
    joints, _ = rigid_transform(rot_mats, rest_joints, model.parents)
    if transl is not None:
        joints = joints + transl[:, None, :]
    return joints


def reroot(points: jax.Array, joints: jax.Array, root_trans: jax.Array,
           root_scale: jax.Array | None = None) -> jax.Array:
    """Re-anchor points at root_trans with optional uniform root scale,
    where joints[:, 0] is the current root (smpl.py:309-316)."""
    cur_root = joints[:, :1, :]
    if root_scale is None:
        return points - cur_root + root_trans[:, None, :]
    return (points - cur_root) * root_scale[:, None, None] + root_trans[:, None, :]

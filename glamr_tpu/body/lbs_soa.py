"""Channel-leading (structure-of-arrays) subset skinning — the TPU layout
for the stage-4 hot op.

Why this exists: the natural array-of-structs shapes of body math —
rotmats (B, 3, 3), transforms (B, 4, 4), joints (B, J, 3) — put tiny
trailing dims on the TPU's (8, 128) vector-register tile, so every
elementwise op pays ~40x lane padding in HBM traffic. Profiling the
900-frame glamr_static stage scan showed the per-iteration cost almost
entirely in these padded fusions/copies (~2.3 ms/iter, ~1350 HLO ops).

Here every scalar channel of the computation is a (B,) vector — the big
batch axis IS the lane axis — and a 3x3 matrix is nine (B,) channels.
The FK chain (reference smplx batch_rigid_transform; our
lbs.rigid_transform) becomes 27-fma channel products that XLA fuses into
a few full-width kernels: measured 0.22 ms/iter fwd+bwd vs 2.03 for the
AoS form at B=1800 on a v5e (9x).

Numerics match transforms.rotation exactly (same aa->quat Taylor guard,
same quat normalize, same quat->rotmat formula), so results are
bit-comparable to lbs.rigid_transform up to fma reassociation (~1e-7).

Skinning matmuls (posedirs/lbs-weights/regressors) stay real matmuls with
B on the lane side: einsum("...s,sb->...b") — MXU-shaped, no padding.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def aa_channels_to_rotmat(x: jax.Array, y: jax.Array, z: jax.Array):
    """Axis-angle channels (each (...,)) -> 9 rotation-matrix channels.

    Matches transforms.rotation.angle_axis_to_rotation_matrix =
    quaternion_to_rotation_matrix(angle_axis_to_quaternion(aa)) including
    both Taylor guards and the quaternion normalize.
    """
    theta_sq = x * x + y * y + z * z
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-18))
    half = 0.5 * theta
    small = theta_sq < 1e-12
    k_exact = jnp.sin(half) / jnp.where(small, 1.0, theta)
    k = jnp.where(small, 0.5 - theta_sq / 48.0, k_exact)
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    qx, qy, qz = x * k, y * k, z * k
    # normalize (rotation.normalize: clamp norm at 1e-9)
    n = jnp.sqrt(w * w + qx * qx + qy * qy + qz * qz)
    inv = 1.0 / jnp.maximum(n, 1e-9)
    w, qx, qy, qz = w * inv, qx * inv, qy * inv, qz * inv

    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = w * qx, w * qy, w * qz
    return (
        (1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)),
        (2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)),
        (2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)),
    )


def _matmul3(A, B):
    return tuple(
        tuple(A[i][0] * B[0][k] + A[i][1] * B[1][k] + A[i][2] * B[2][k]
              for k in range(3))
        for i in range(3)
    )


def _matvec3(A, v):
    return tuple(A[i][0] * v[0] + A[i][1] * v[1] + A[i][2] * v[2]
                 for i in range(3))


def fk_chain_channels(pose_T: jax.Array, rest_jcb: jax.Array, parents):
    """FK along the SMPL tree in channel form.

    pose_T    (72, B) transposed axis-angle pose [root + 23 body joints]
    rest_jcb  (J, 3, B) rest joints, channel-minor
    parents   (J,) numpy int

    Returns (G_rot, G_t, local_Rjb): per-joint global rotation channels
    (J tuples of 3x3 (B,) channels), translation channels (J tuples of 3
    (B,)), and the LOCAL rotations as a 3x3 grid of (J, B) arrays (for
    the pose feature). Same recurrence as lbs.rigid_transform's unrolled
    chain; the per-joint rodrigues runs once, vectorized over J, which
    keeps the HLO graph ~J x smaller than a per-joint emission.
    """
    J = rest_jcb.shape[0]
    aa_jb = pose_T.reshape(J, 3, -1)
    local_Rjb = aa_channels_to_rotmat(aa_jb[:, 0], aa_jb[:, 1], aa_jb[:, 2])
    G_rot, G_t = [], []
    for j in range(J):
        R = tuple(tuple(local_Rjb[r][c][j] for c in range(3))
                  for r in range(3))
        if j == 0:
            G_rot.append(R)
            G_t.append((rest_jcb[0, 0], rest_jcb[0, 1], rest_jcb[0, 2]))
        else:
            p = int(parents[j])
            rel = (rest_jcb[j, 0] - rest_jcb[p, 0],
                   rest_jcb[j, 1] - rest_jcb[p, 1],
                   rest_jcb[j, 2] - rest_jcb[p, 2])
            G_rot.append(_matmul3(G_rot[p], R))
            mv = _matvec3(G_rot[p], rel)
            G_t.append(tuple(mv[i] + G_t[p][i] for i in range(3)))
    return G_rot, G_t, local_Rjb


def joints_fast_soa(smpl, global_orient: jax.Array, body_pose: jax.Array,
                    betas: jax.Array, root_trans: jax.Array | None = None,
                    root_scale: jax.Array | None = None,
                    channels_out: bool = False) -> jax.Array:
    """Channel-leading subset skinning; same math/IO as SMPL.joints_fast
    (which mirrors reference smpl.py:318-343 joints + extra regressor).

    Exactly two layout changes cross the boundary: one transpose of the
    (B, 82) inputs on entry and one of the (J, 3, B) joints on exit; all
    intermediate tensors keep B minor-most.
    """
    pose_T = jnp.concatenate([global_orient, body_pose], axis=-1).T  # (72,B)
    betas_T = betas.T                                                # (10,B)
    parents = np.asarray(smpl.model.parents)

    # rest joints with shape blend folded through the joint regressor
    rest_jcb = smpl._joint_template[:, :, None] + jnp.einsum(
        "jcs,sb->jcb", smpl._joint_shapedirs, betas_T)               # (24,3,B)

    G_rot, G_t, local_Rjb = fk_chain_channels(pose_T, rest_jcb, parents)

    # pose feature: local rotmats of joints 1..23 minus identity, row-major
    eye = np.eye(3, dtype=np.float32)
    pf_jrc = jnp.stack([jnp.stack([local_Rjb[r][c][1:] - eye[r, c]
                                   for c in range(3)], axis=1)
                        for r in range(3)], axis=1)                  # (23,3,3,B)
    pf_T = pf_jrc.reshape(207, -1)                                   # (207,B)

    # skinned vertex subset, channel-minor
    v_shaped = smpl._sub_v_template[:, :, None] + jnp.einsum(
        "vcs,sb->vcb", smpl._sub_shapedirs, betas_T)                 # (V,3,B)
    v_posed = v_shaped + jnp.einsum(
        "vcp,pb->vcb", smpl._sub_posedirs, pf_T)

    # rel transforms A = [G_rot | G_t - G_rot @ rest_j], stacked (J,12,B)
    A = []
    for j in range(24):
        corr = _matvec3(G_rot[j], (rest_jcb[j, 0], rest_jcb[j, 1],
                                   rest_jcb[j, 2]))
        A.append(jnp.stack([
            *[G_rot[j][r][c] for r in range(3) for c in range(3)],
            *[G_t[j][i] - corr[i] for i in range(3)],
        ]))
    A = jnp.stack(A)                                                 # (24,12,B)
    vert_tf = jnp.einsum("vj,jcb->vcb", smpl._sub_lbs_weights, A)    # (V,12,B)

    verts = jnp.stack([
        vert_tf[:, 0] * v_posed[:, 0] + vert_tf[:, 1] * v_posed[:, 1]
        + vert_tf[:, 2] * v_posed[:, 2] + vert_tf[:, 9],
        vert_tf[:, 3] * v_posed[:, 0] + vert_tf[:, 4] * v_posed[:, 1]
        + vert_tf[:, 5] * v_posed[:, 2] + vert_tf[:, 10],
        vert_tf[:, 6] * v_posed[:, 0] + vert_tf[:, 7] * v_posed[:, 1]
        + vert_tf[:, 8] * v_posed[:, 2] + vert_tf[:, 11],
    ], axis=1)                                                       # (V,3,B)

    joints24 = jnp.stack([jnp.stack(t) for t in G_t])                # (24,3,B)
    landmarks = verts[smpl._sub_landmark_pos]                        # (L,3,B)
    extra = jnp.einsum("jv,vcb->jcb", smpl._sub_jreg_extra, verts)
    joints54 = jnp.concatenate([joints24, landmarks, extra], axis=0)
    joints = joints54[smpl.joint_map]                                # (Jp,3,B)

    if root_trans is not None:
        cur_root = joints[:1]                                        # (1,3,B)
        if root_scale is None:
            joints = joints - cur_root + root_trans.T[None]
        else:
            joints = (joints - cur_root) * root_scale[None, None, :] \
                + root_trans.T[None]
    if channels_out:
        return joints                                                # (Jp,3,B)
    return jnp.transpose(joints, (2, 0, 1))                          # (B,Jp,3)


def rigid_fk_soa(model, global_orient: jax.Array, body_pose: jax.Array,
                 transl: jax.Array | None = None) -> jax.Array:
    """Joints-only template FK in channel form (lbs.rigid_fk equivalent,
    reference SMPL.get_joints smpl.py:318-343). The rest skeleton is a
    constant, so its channels are scalars broadcast against the (B,)
    rotation channels — the chain is pure lane-width fma."""
    B = body_pose.shape[0]
    pose_T = jnp.concatenate([global_orient, body_pose], axis=-1).T  # (72,B)
    rest = jnp.einsum("jv,vc->jc", model.j_regressor, model.v_template)
    rest_jcb = rest[:, :, None]                                      # (24,3,1)
    parents = np.asarray(model.parents)

    G_rot, G_t, _ = fk_chain_channels(pose_T, rest_jcb, parents)
    rows = [jnp.stack([jnp.broadcast_to(c, (B,)) for c in t]) for t in G_t]
    joints = jnp.transpose(jnp.stack(rows), (2, 0, 1))               # (B,24,3)
    if transl is not None:
        joints = joints + transl[:, None, :]
    return joints

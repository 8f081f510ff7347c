"""Analytic twist-swing inverse kinematics: 3D joints -> SMPL pose.

The reference delegates per-frame pose estimation to HybrIK, an external
torch/CUDA submodule run in its own conda env (pose_est/run_pose_est_demo.py:
12-28; the HybrIK/ directory is empty in the snapshot). HybrIK's core idea —
recover SMPL joint rotations in closed form from target 3D joint locations
via a twist-and-swing decomposition — is reimplemented here TPU-natively:
pure jnp, a static 24-step unrolled walk down the kinematic tree, vmapped
over a flat batch axis, fully differentiable (usable as a network head).

Per joint j with parent chain global rotation G_p:
  * single-child joints: the posed bone d = t_child - t_j must satisfy
    d = G_p R_j r (r = rest bone). The swing is the minimal rotation taking
    r̂ to (G_pᵀ d)̂ ; the twist is a rotation about r̂ by the input twist
    angle φ_j (underdetermined from joint positions alone — HybrIK predicts
    it with a network; `twist_angles` extracts it from a known pose).
    R_j = swing ∘ twist.
  * multi-child joints (pelvis: hips+spine1; spine3: neck+collars): solved
    exactly by orthogonal Procrustes (Kabsch) over all child bones — three
    non-collinear bones pin the rotation, no twist needed.
  * leaf joints (feet, head, hands): unconstrained by joint positions;
    identity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..body.model import SMPLModel
from ..transforms.rotation import rotation_matrix_to_angle_axis

# SMPL tree roles (see body/constants.py SMPL_PARENTS)
KABSCH_CHILDREN = {0: (1, 2, 3), 9: (12, 13, 14)}
TWIST_CHILD = {1: 4, 2: 5, 3: 6, 4: 7, 5: 8, 6: 9, 7: 10, 8: 11, 12: 15,
               13: 16, 14: 17, 16: 18, 17: 19, 18: 20, 19: 21, 20: 22,
               21: 23}
LEAF_JOINTS = (10, 11, 15, 22, 23)
# joints whose local rotation carries a twist degree of freedom (ordered)
TWIST_JOINTS = tuple(sorted(TWIST_CHILD))
NUM_TWISTS = len(TWIST_JOINTS)  # 17

_EPS = 1e-8


def _normalize(v, axis=-1):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), _EPS)


def _rot_between(a: jax.Array, b: jax.Array) -> jax.Array:
    """Minimal rotation taking unit vector a to unit vector b, (..., 3, 3).
    Safe at a ≈ b (identity) and a ≈ -b (180° about any perpendicular)."""
    c = jnp.sum(a * b, axis=-1)[..., None, None]          # cos
    v = jnp.cross(a, b)
    # near-antiparallel: rotate about an arbitrary perpendicular axis
    perp = jnp.cross(a, jnp.where(jnp.abs(a[..., :1]) < 0.9,
                                  jnp.array([1.0, 0.0, 0.0], a.dtype),
                                  jnp.array([0.0, 1.0, 0.0], a.dtype)))
    anti = c[..., 0, 0] < -1.0 + 1e-6
    v = jnp.where(anti[..., None], _normalize(perp) * _EPS, v)
    vx = _skew(v)
    vv = jnp.einsum("...i,...j->...ij", v, v)
    eye = jnp.eye(3, dtype=a.dtype)
    # Rodrigues without trig: R = cI + vvᵀ(1-c)/s² ... rewritten stably as
    # R = I + [v]x + [v]x² / (1 + c)
    r = eye + vx + vx @ vx / jnp.maximum(1.0 + c, _EPS)
    # exact 180°: rotation by pi about the perpendicular axis
    p = _normalize(perp)
    r180 = -eye + 2 * jnp.einsum("...i,...j->...ij", p, p)
    return jnp.where(anti[..., None, None], r180, r)


def _skew(v: jax.Array) -> jax.Array:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([o, -z, y], -1),
        jnp.stack([z, o, -x], -1),
        jnp.stack([-y, x, o], -1),
    ], -2)


def _axis_rot(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotation about unit axis by angle, (..., 3, 3)."""
    ax = _skew(axis)
    s = jnp.sin(angle)[..., None, None]
    c = jnp.cos(angle)[..., None, None]
    eye = jnp.eye(3, dtype=axis.dtype)
    return eye + s * ax + (1 - c) * (ax @ ax)


def _kabsch(rest: jax.Array, target: jax.Array) -> jax.Array:
    """Least-squares rotation R minimizing Σ‖R·restₖ − targetₖ‖² for K
    paired direction vectors. rest/target: (..., K, 3) -> (..., 3, 3)."""
    m = jnp.einsum("...ki,...kj->...ij", target, rest)
    u, _, vt = jnp.linalg.svd(m)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", u, vt))
    fix = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None],
         det[..., None]], -1)
    return jnp.einsum("...ij,...j,...jk->...ik", u, fix, vt)


def rest_joints_from_betas(model: SMPLModel, betas: jax.Array | None,
                           batch: int) -> jax.Array:
    """(B, 24, 3) rest-pose joints, shape-blended when betas given."""
    if betas is None:
        rest = jnp.einsum("jv,vc->jc", model.j_regressor, model.v_template)
        return jnp.broadcast_to(rest, (batch, model.num_joints, 3))
    v_shaped = model.v_template + jnp.einsum("vcs,bs->bvc",
                                             model.shapedirs, betas)
    return jnp.einsum("jv,bvc->bjc", model.j_regressor, v_shaped)


def hybrik(model: SMPLModel, joints: jax.Array,
           twist: jax.Array | None = None,
           betas: jax.Array | None = None) -> jax.Array:
    """Closed-form SMPL pose from target joint positions.

    joints: (B, 24, 3) target joints (any frame — only bone directions
      matter, translation cancels).
    twist: (B, 15) twist angles for TWIST_JOINTS (zeros if None).
    betas: (B, 10) shape for the rest skeleton (template if None).

    Returns pose (B, 72) axis-angle (leaf joints identity).
    """
    B = joints.shape[0]
    parents = np.asarray(model.parents)
    rest = rest_joints_from_betas(model, betas, B)
    if twist is None:
        twist = jnp.zeros((B, NUM_TWISTS), joints.dtype)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=joints.dtype), (B, 3, 3))
    hp = jax.lax.Precision.HIGHEST

    def bones(pts, j, children):
        return jnp.stack([pts[:, c] - pts[:, j] for c in children], axis=1)

    local = [None] * 24
    glob = [None] * 24
    for j in range(24):
        gp = eye if j == 0 else glob[parents[j]]
        if j in KABSCH_CHILDREN:
            ch = KABSCH_CHILDREN[j]
            r = _normalize(bones(rest, j, ch))
            d = _normalize(bones(joints, j, ch))
            # express targets in the parent frame, then solve locally
            d_loc = jnp.einsum("bji,bkj->bki", gp, d, precision=hp)
            rj = _kabsch(r, d_loc)
        elif j in TWIST_CHILD:
            c = TWIST_CHILD[j]
            r = _normalize(rest[:, c] - rest[:, j])
            d = _normalize(joints[:, c] - joints[:, j])
            d_loc = _normalize(jnp.einsum("bji,bj->bi", gp, d, precision=hp))
            swing = _rot_between(r, d_loc)
            phi = twist[:, TWIST_JOINTS.index(j)]
            rj = jnp.einsum("bij,bjk->bik", swing, _axis_rot(r, phi),
                            precision=hp)
        else:  # leaf
            rj = eye
        local[j] = rj
        glob[j] = rj if j == 0 else jnp.einsum("bij,bjk->bik", gp, rj,
                                               precision=hp)

    rot = jnp.stack(local, axis=1)  # (B, 24, 3, 3)
    return rotation_matrix_to_angle_axis(rot).reshape(B, 72)


def twist_angles(model: SMPLModel, pose: jax.Array,
                 betas: jax.Array | None = None) -> jax.Array:
    """Extract the twist angle of each TWIST_JOINT from a known pose
    (B, 72) — the supervision target for a HybrIK-style twist head, and
    the exactness companion of `hybrik` (round-trip property:
    hybrik(fk(pose), twist_angles(pose)) == pose for non-leaf joints)."""
    from ..body.lbs import rodrigues

    B = pose.shape[0]
    rest = rest_joints_from_betas(model, betas, B)
    rots = rodrigues(pose.reshape(B, 24, 3))
    out = []
    for j in TWIST_JOINTS:
        c = TWIST_CHILD[j]
        r = _normalize(rest[:, c] - rest[:, j])
        rj = rots[:, j]
        d = _normalize(jnp.einsum("bij,bj->bi", rj, r))
        swing = _rot_between(r, d)
        tw = jnp.einsum("bji,bjk->bik", swing, rj)  # swingᵀ R = twist
        # rotation about axis r: angle from Rodrigues projection
        s = jnp.einsum("bi,bi->b", r, jnp.stack([
            tw[:, 2, 1] - tw[:, 1, 2],
            tw[:, 0, 2] - tw[:, 2, 0],
            tw[:, 1, 0] - tw[:, 0, 1],
        ], -1)) / 2.0
        cang = (jnp.trace(tw, axis1=-2, axis2=-1) - 1.0) / 2.0
        out.append(jnp.arctan2(s, cang))
    return jnp.stack(out, axis=-1)

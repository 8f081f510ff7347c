"""Rotation representation conversions, TPU-native (pure jnp).

Covers the conversion set of the reference GLAMR foundation library
(reference: lib/utils/konia_transform.py, lib/utils/torch_transform.py),
re-derived from standard rotation algebra rather than translated.

Conventions (matching the reference so checkpoints/configs stay compatible):
  * quaternions are (w, x, y, z), unit norm, scalar-first
  * rotation matrices are world-from-body, column-major action: v' = R @ v
  * 6D rotation rep is the first two COLUMNS of R concatenated:
    rot6d = [R[..,0], R[..,1]]  (reference: torch_transform.py:215-227)
  * axis-angle ("angle_axis") is axis * angle, radians

All functions broadcast over arbitrary leading dimensions and are safe
under jit/vmap/grad: no data-dependent control flow, eps-guarded
divisions so gradients stay finite at singular points.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


def normalize(x: jax.Array, eps: float = 1e-9) -> jax.Array:
    """L2-normalize along the last axis with a lower clamp on the norm."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


def safe_atan2(y: jax.Array, x: jax.Array, eps: float = _EPS) -> jax.Array:
    """atan2 with a finite gradient at (0, 0).

    Mirrors the reference's guard (torch_transform.py:64-67): nudge y by eps
    where both inputs are ~0 so the gradient of atan2 does not NaN.
    """
    both_zero = (jnp.abs(y) < eps) & (jnp.abs(x) < eps)
    y = jnp.where(both_zero, y + eps, y)
    return jnp.arctan2(y, x)


# ---------------------------------------------------------------------------
# quaternion algebra
# ---------------------------------------------------------------------------

def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b of wxyz quaternions (broadcasts)."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def quat_apply(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    xyz = q[..., 1:]
    t = 2.0 * jnp.cross(xyz, v)
    return v + q[..., :1] * t + jnp.cross(xyz, t)


def quat_angle(q: jax.Array, eps: float = _EPS) -> jax.Array:
    """Rotation angle of a unit quaternion in [0, pi].

    Uses the same w-based form as the reference (torch_transform.py:49-55)
    so values agree bit-for-bit in the well-conditioned region.
    """
    s = 2.0 * q[..., 0] ** 2 - 1.0
    return jnp.arccos(jnp.clip(s, -1.0 + eps, 1.0 - eps))


def quat_angle_diff(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Angle of the relative rotation between two quaternions."""
    return quat_angle(quat_mul(q1, quat_conjugate(q2)))


def quat_between_two_vec(v1: jax.Array, v2: jax.Array, eps: float = _EPS) -> jax.Array:
    """Shortest-arc quaternion rotating direction v1 onto v2.

    Handles the parallel and anti-parallel cases with jnp.where branches
    (reference handles them with boolean indexing: torch_transform.py:125-153).
    """
    dot = jnp.sum(v1 * v2, axis=-1)
    cross = jnp.cross(v1, v2)
    q = jnp.concatenate([(1.0 + dot)[..., None], cross], axis=-1)

    # anti-parallel: rotate pi about any axis orthogonal to v1
    vx = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], v1.dtype), v1.shape)
    vy = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], v1.dtype), v1.shape)
    use_y = jnp.abs(jnp.sum(v1 * vx, axis=-1)) >= 1.0 - eps
    ref_axis = jnp.where(use_y[..., None], vy, vx)
    ortho = normalize(jnp.cross(ref_axis, v1))
    q_pi = angle_axis_to_quaternion(ortho * jnp.pi)

    same = (dot > 1.0 - eps)[..., None]
    opposite = (dot < -1.0 + eps)[..., None]
    identity = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0, 0.0], v1.dtype), q.shape)
    q = jnp.where(opposite, q_pi, q)
    q = jnp.where(same, identity, q)
    return normalize(q)


# ---------------------------------------------------------------------------
# axis-angle <-> quaternion
# ---------------------------------------------------------------------------

def angle_axis_to_quaternion(aa: jax.Array) -> jax.Array:
    """(..., 3) axis-angle -> (..., 4) wxyz quaternion, Taylor-guarded at 0."""
    theta_sq = jnp.sum(aa * aa, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-18))
    half = 0.5 * theta
    # sin(theta/2)/theta: exact where theta is safe, 2nd-order Taylor at 0
    small = theta_sq < 1e-12
    k_exact = jnp.sin(half) / jnp.where(small, 1.0, theta)
    k_taylor = 0.5 - theta_sq / 48.0
    k = jnp.where(small, k_taylor, k_exact)
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w, aa * k], axis=-1)


def quaternion_to_angle_axis(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz quaternion -> (..., 3) axis-angle, Taylor-guarded.

    For w < 0 the equivalent negated quaternion is used so the returned
    angle lies in (-pi, pi] (shortest arc), matching the reference's
    vendored kornia behaviour (konia_transform.py:560-610).
    """
    w = q[..., :1]
    xyz = q[..., 1:]
    sin_sq = jnp.sum(xyz * xyz, axis=-1, keepdims=True)
    sin_half = jnp.sqrt(jnp.maximum(sin_sq, 1e-18))
    two_theta = 2.0 * jnp.where(
        w < 0.0, jnp.arctan2(-sin_half, -w), jnp.arctan2(sin_half, w)
    )
    small = sin_sq < 1e-12
    # lim_{theta->0} theta / sin(theta/2) = 2
    k = jnp.where(small, 2.0, two_theta / jnp.where(small, 1.0, sin_half))
    return xyz * k


# ---------------------------------------------------------------------------
# axis-angle <-> rotation matrix (Rodrigues)
# ---------------------------------------------------------------------------

def angle_axis_to_rotation_matrix(aa: jax.Array) -> jax.Array:
    """(..., 3) axis-angle -> (..., 3, 3) via quaternion (stable at 0)."""
    return quaternion_to_rotation_matrix(angle_axis_to_quaternion(aa))


def rotation_matrix_to_angle_axis(rotmat: jax.Array) -> jax.Array:
    return quaternion_to_angle_axis(rotation_matrix_to_quaternion(rotmat))


# ---------------------------------------------------------------------------
# quaternion <-> rotation matrix
# ---------------------------------------------------------------------------

def quaternion_to_rotation_matrix(q: jax.Array) -> jax.Array:
    """Unit wxyz quaternion -> (..., 3, 3) rotation matrix."""
    q = normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def rotation_matrix_to_quaternion(rotmat: jax.Array, eps: float = _EPS) -> jax.Array:
    """(..., 3, 3) rotation matrix -> wxyz quaternion.

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select by the largest diagonal-based discriminant with jnp.where
    (the reference's vendored kornia does the same with torch.where,
    konia_transform.py:349-450).
    """
    m = rotmat
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    trace = m00 + m11 + m22

    def safe_div(num, den):
        den = jnp.where(jnp.abs(den) < eps, den + eps, den)
        return num / den

    sq_w = jnp.sqrt(jnp.maximum(trace + 1.0, eps)) * 2.0
    q_w = jnp.stack([0.25 * sq_w, safe_div(m21 - m12, sq_w),
                     safe_div(m02 - m20, sq_w), safe_div(m10 - m01, sq_w)], axis=-1)

    sq_x = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, eps)) * 2.0
    q_x = jnp.stack([safe_div(m21 - m12, sq_x), 0.25 * sq_x,
                     safe_div(m01 + m10, sq_x), safe_div(m02 + m20, sq_x)], axis=-1)

    sq_y = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, eps)) * 2.0
    q_y = jnp.stack([safe_div(m02 - m20, sq_y), safe_div(m01 + m10, sq_y),
                     0.25 * sq_y, safe_div(m12 + m21, sq_y)], axis=-1)

    sq_z = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, eps)) * 2.0
    q_z = jnp.stack([safe_div(m10 - m01, sq_z), safe_div(m02 + m20, sq_z),
                     safe_div(m12 + m21, sq_z), 0.25 * sq_z], axis=-1)

    where_2 = jnp.where((m11 > m22)[..., None], q_y, q_z)
    where_1 = jnp.where(((m00 > m11) & (m00 > m22))[..., None], q_x, where_2)
    return jnp.where((trace > 0.0)[..., None], q_w, where_1)


# ---------------------------------------------------------------------------
# 6D rotation representation (Zhou et al. continuity rep)
# ---------------------------------------------------------------------------

def rotmat_to_rot6d(m: jax.Array) -> jax.Array:
    """First two columns of R, concatenated -> (..., 6)."""
    return jnp.concatenate([m[..., 0], m[..., 1]], axis=-1)


def rot6d_to_rotmat(rot6d: jax.Array) -> jax.Array:
    """Gram-Schmidt the two 3-vectors back into a rotation matrix."""
    a1 = rot6d[..., :3]
    a2 = rot6d[..., 3:]
    b1 = normalize(a1)
    b2 = normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def angle_axis_to_rot6d(aa: jax.Array) -> jax.Array:
    return rotmat_to_rot6d(angle_axis_to_rotation_matrix(aa))


def rot6d_to_angle_axis(rot6d: jax.Array) -> jax.Array:
    return rotation_matrix_to_angle_axis(rot6d_to_rotmat(rot6d))


def quat_to_rot6d(q: jax.Array) -> jax.Array:
    return rotmat_to_rot6d(quaternion_to_rotation_matrix(q))


def rot6d_to_quat(rot6d: jax.Array) -> jax.Array:
    return rotation_matrix_to_quaternion(rot6d_to_rotmat(rot6d))


# ---------------------------------------------------------------------------
# euler (yaw-pitch-roll about z-y-x, matching the reference's convention)
# ---------------------------------------------------------------------------

def ypr_euler_from_quat(q: jax.Array, eps: float = _EPS) -> jax.Array:
    """Quaternion -> (roll, pitch, yaw) stacked last (torch_transform.py:71-105)."""
    yaw = safe_atan2(2.0 * (q[..., 0] * q[..., 3] + q[..., 1] * q[..., 2]),
                     1.0 - 2.0 * (q[..., 2] ** 2 + q[..., 3] ** 2), eps)
    pitch = jnp.arcsin(jnp.clip(2.0 * (q[..., 0] * q[..., 2] - q[..., 1] * q[..., 3]),
                                -1.0 + eps, 1.0 - eps))
    roll = safe_atan2(2.0 * (q[..., 0] * q[..., 1] + q[..., 2] * q[..., 3]),
                      1.0 - 2.0 * (q[..., 1] ** 2 + q[..., 2] ** 2), eps)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_from_ypr_euler(angles: jax.Array) -> jax.Array:
    """(roll, pitch, yaw) -> wxyz quaternion (inverse of ypr_euler_from_quat)."""
    half = angles * 0.5
    sr, sp, sy = jnp.moveaxis(jnp.sin(half), -1, 0)
    cr, cp, cy = jnp.moveaxis(jnp.cos(half), -1, 0)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )

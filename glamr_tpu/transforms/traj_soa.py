"""Channel-leading (SoA) trajectory codec — the integration path of the
stage-4 per-iteration graph in lane-dense form.

Same motivation as body/lbs_soa: the (P, T, 11)/(P, T, 4) trajectory
tensors put their small trailing dims on the TPU (8, 128) register tile
(~12-32x lane padding per elementwise op), and the compose -> integrate
(cumsum) -> quaternion -> axis-angle chain runs ~80 padded ops per
optimizer iteration. Here every channel is a (..., T) array (T on
lanes) and a quaternion is a 4-tuple of channels.

Numerics match transforms.{rotation,heading,traj} formula-for-formula
(same eps guards, same Taylor branches, same Shepperd selection), so
results equal the AoS path up to fma reassociation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .traj import BASE_ORIENT

_EPS = 1e-6


def safe_atan2_ch(y, x, eps: float = _EPS):
    both_zero = (jnp.abs(y) < eps) & (jnp.abs(x) < eps)
    return jnp.arctan2(jnp.where(both_zero, y + eps, y), x)


def aa_to_quat_ch(x, y, z):
    """Axis-angle channels -> wxyz quaternion channels (Taylor-guarded;
    matches rotation.angle_axis_to_quaternion)."""
    theta_sq = x * x + y * y + z * z
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-18))
    half = 0.5 * theta
    small = theta_sq < 1e-12
    k = jnp.where(small, 0.5 - theta_sq / 48.0,
                  jnp.sin(half) / jnp.where(small, 1.0, theta))
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return (w, x * k, y * k, z * k)


def quat_mul_ch(a, b):
    """Hamilton product of wxyz channel quaternions (broadcasts)."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def quat_to_aa_ch(q):
    """wxyz quaternion channels -> axis-angle channels (shortest arc;
    matches rotation.quaternion_to_angle_axis)."""
    w, x, y, z = q
    sin_sq = x * x + y * y + z * z
    sin_half = jnp.sqrt(jnp.maximum(sin_sq, 1e-18))
    two_theta = 2.0 * jnp.where(
        w < 0.0, jnp.arctan2(-sin_half, -w), jnp.arctan2(sin_half, w))
    small = sin_sq < 1e-12
    k = jnp.where(small, 2.0, two_theta / jnp.where(small, 1.0, sin_half))
    return (x * k, y * k, z * k)


def rot6d_to_quat_ch(c):
    """6 channel components (first two rotation-matrix COLUMNS, Zhou rep)
    -> wxyz quaternion channels. Gram-Schmidt (rotation.rot6d_to_rotmat,
    normalize clamp 1e-9) then branch-free Shepperd
    (rotation.rotation_matrix_to_quaternion, eps guards 1e-6)."""
    a1 = c[0], c[1], c[2]
    a2 = c[3], c[4], c[5]
    n1 = jnp.sqrt(a1[0] ** 2 + a1[1] ** 2 + a1[2] ** 2)
    inv1 = 1.0 / jnp.maximum(n1, 1e-9)
    b1 = (a1[0] * inv1, a1[1] * inv1, a1[2] * inv1)
    dot = b1[0] * a2[0] + b1[1] * a2[1] + b1[2] * a2[2]
    u2 = (a2[0] - dot * b1[0], a2[1] - dot * b1[1], a2[2] - dot * b1[2])
    n2 = jnp.sqrt(u2[0] ** 2 + u2[1] ** 2 + u2[2] ** 2)
    inv2 = 1.0 / jnp.maximum(n2, 1e-9)
    b2 = (u2[0] * inv2, u2[1] * inv2, u2[2] * inv2)
    b3 = (b1[1] * b2[2] - b1[2] * b2[1],
          b1[2] * b2[0] - b1[0] * b2[2],
          b1[0] * b2[1] - b1[1] * b2[0])
    # R columns are b1, b2, b3: m[i][j] = (b_{j+1})_i
    m00, m01, m02 = b1[0], b2[0], b3[0]
    m10, m11, m12 = b1[1], b2[1], b3[1]
    m20, m21, m22 = b1[2], b2[2], b3[2]
    trace = m00 + m11 + m22

    def safe_div(num, den):
        return num / jnp.where(jnp.abs(den) < _EPS, den + _EPS, den)

    sq_w = jnp.sqrt(jnp.maximum(trace + 1.0, _EPS)) * 2.0
    q_w = (0.25 * sq_w, safe_div(m21 - m12, sq_w),
           safe_div(m02 - m20, sq_w), safe_div(m10 - m01, sq_w))
    sq_x = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2.0
    q_x = (safe_div(m21 - m12, sq_x), 0.25 * sq_x,
           safe_div(m01 + m10, sq_x), safe_div(m02 + m20, sq_x))
    sq_y = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, _EPS)) * 2.0
    q_y = (safe_div(m02 - m20, sq_y), safe_div(m01 + m10, sq_y),
           0.25 * sq_y, safe_div(m12 + m21, sq_y))
    sq_z = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, _EPS)) * 2.0
    q_z = (safe_div(m10 - m01, sq_z), safe_div(m02 + m20, sq_z),
           safe_div(m12 + m21, sq_z), 0.25 * sq_z)

    cond_x = (m00 > m11) & (m00 > m22)
    cond_y = m11 > m22
    cond_w = trace > 0.0
    return tuple(
        jnp.where(cond_w, qw,
                  jnp.where(cond_x, qx, jnp.where(cond_y, qy, qz)))
        for qw, qx, qy, qz in zip(q_w, q_x, q_y, q_z)
    )


def traj_local2global_heading_ch(tl, local_heading: bool = True):
    """Channel form of traj.traj_local2global_heading ('6d' local orient,
    no deheading — the modes the stage-4 forward uses).

    tl: sequence of 11 channel arrays, each (..., T) with T minor-most:
    [dx, dy, z, r0..r5, hv_cos, hv_sin].
    Returns (trans (tx, ty, tz), orient_q (w, x, y, z)) channel tuples.
    """
    d_heading = safe_atan2_ch(tl[10], tl[9])
    heading = jnp.cumsum(d_heading, axis=-1) if local_heading else d_heading
    prev = jnp.concatenate(
        [jnp.zeros_like(heading[..., :1]), heading[..., :-1]], axis=-1)
    c, s = jnp.cos(prev), jnp.sin(prev)
    tx = jnp.cumsum(tl[0] * c - tl[1] * s, axis=-1)
    ty = jnp.cumsum(tl[0] * s + tl[1] * c, axis=-1)

    zero = jnp.zeros_like(heading)
    heading_q = aa_to_quat_ch(zero, zero, heading)
    local_q = rot6d_to_quat_ch(tl[3:9])
    base = tuple(jnp.asarray(b, tl[0].dtype) for b in BASE_ORIENT)
    orient_q = quat_mul_ch(quat_mul_ch(heading_q, local_q), base)
    return (tx, ty, tl[2]), orient_q

"""Heading (z-axis yaw in the z-up body frame) decomposition.

GLAMR factors every root orientation into heading * local:
heading is the rotation about +z encoded by the (w, z) quaternion
components; "deheading" removes it. This is the algebra the 11-D local
trajectory representation is built on (reference:
lib/utils/torch_transform.py:157-211, traj_pred/utils/traj_utils.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotation import (
    angle_axis_to_quaternion,
    normalize,
    quat_conjugate,
    quat_mul,
    safe_atan2,
)


def get_heading(q: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Heading angle of quaternion q: 2*atan2(q_z, q_w). Shape (...,)."""
    return 2.0 * safe_atan2(q[..., 3], q[..., 0], eps)


def get_heading_q(q: jax.Array) -> jax.Array:
    """Project q onto the pure-heading (rotation about z) subgroup."""
    zeroed = q * jnp.array([1.0, 0.0, 0.0, 1.0], dtype=q.dtype)
    return normalize(zeroed)


def heading_to_vec(h_theta: jax.Array) -> jax.Array:
    """Angle -> unit 2-vector (cos, sin), the continuous heading encoding."""
    return jnp.stack([jnp.cos(h_theta), jnp.sin(h_theta)], axis=-1)


def vec_to_heading(h_vec: jax.Array) -> jax.Array:
    """(…, 2) heading vector -> angle. Inverse of heading_to_vec up to scale."""
    return safe_atan2(h_vec[..., 1], h_vec[..., 0])


def heading_to_quat(h_theta: jax.Array) -> jax.Array:
    """Heading angle -> quaternion rotating about +z by that angle."""
    zeros = jnp.zeros(h_theta.shape + (2,), dtype=h_theta.dtype)
    aa = jnp.concatenate([zeros, h_theta[..., None]], axis=-1)
    return angle_axis_to_quaternion(aa)


def deheading_quat(q: jax.Array, heading_q: jax.Array | None = None) -> jax.Array:
    """Remove the heading component: returns heading_q^{-1} * q."""
    if heading_q is None:
        heading_q = get_heading_q(q)
    return quat_mul(quat_conjugate(heading_q), q)


def get_yaw(q: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Euler yaw (z in zyx order) — distinct from heading for tilted poses."""
    return safe_atan2(
        2.0 * (q[..., 0] * q[..., 3] + q[..., 1] * q[..., 2]),
        1.0 - 2.0 * (q[..., 2] ** 2 + q[..., 3] ** 2),
        eps,
    )


def get_yaw_q(q: jax.Array) -> jax.Array:
    """Quaternion for the Euler-yaw component only."""
    yaw = get_yaw(q)
    zeros = jnp.zeros(yaw.shape + (2,), dtype=q.dtype)
    return angle_axis_to_quaternion(jnp.concatenate([zeros, yaw[..., None]], axis=-1))

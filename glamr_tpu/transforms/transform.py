"""Homogeneous 4x4 rigid-transform helpers and Procrustes alignment.

Reference behaviour: lib/utils/torch_transform.py:246-345. Re-expressed as
pure jnp with broadcasting; the Procrustes solve uses jnp SVD (maps to the
XLA QR/SVD path on TPU; batch sizes here are tiny relative to the rest of
the pipeline).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotation import angle_axis_to_rotation_matrix, rot6d_to_rotmat, rotation_matrix_to_angle_axis


def make_transform(rot: jax.Array, trans: jax.Array, rot_type: str | None = None) -> jax.Array:
    """Build (..., 4, 4) from rotation (matrix / axis-angle / 6d) + translation."""
    if rot_type == "axis_angle":
        rot = angle_axis_to_rotation_matrix(rot)
    elif rot_type == "6d":
        rot = rot6d_to_rotmat(rot)
    batch = jnp.broadcast_shapes(rot.shape[:-2], trans.shape[:-1])
    out = jnp.zeros(batch + (4, 4), dtype=trans.dtype)
    out = out.at[..., :3, :3].set(rot)
    out = out.at[..., :3, 3].set(trans)
    out = out.at[..., 3, 3].set(1.0)
    return out


def transform_trans(transform_mat: jax.Array, trans: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) to points (..., N, 3) or (..., 3)."""
    squeeze = trans.ndim == transform_mat.ndim - 1
    if squeeze:
        trans = trans[..., None, :]
    out = jnp.einsum("...ij,...nj->...ni", transform_mat[..., :3, :3], trans)
    out = out + transform_mat[..., None, :3, 3]
    return out[..., 0, :] if squeeze else out


def transform_rot(transform_mat: jax.Array, rot_aa: jax.Array) -> jax.Array:
    """Left-compose the transform's rotation with axis-angle rotations."""
    rotmat = angle_axis_to_rotation_matrix(rot_aa)
    new = jnp.einsum("...ij,...jk->...ik", transform_mat[..., :3, :3], rotmat)
    return rotation_matrix_to_angle_axis(new)


def inverse_transform(transform_mat: jax.Array) -> jax.Array:
    """Closed-form inverse of a rigid transform: [R^T, -R^T t]."""
    rot_t = jnp.swapaxes(transform_mat[..., :3, :3], -1, -2)
    t = transform_mat[..., :3, 3]
    out = jnp.zeros_like(transform_mat)
    out = out.at[..., :3, :3].set(rot_t)
    out = out.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", rot_t, t))
    out = out.at[..., 3, 3].set(1.0)
    return out


def similarity_transform(S1: jax.Array, S2: jax.Array) -> jax.Array:
    """Procrustes: align point sets S1 (..., N, 3) onto S2 with scale+rot+trans.

    Returns the aligned S1. Matches the evaluation-time PA alignment of the
    reference (torch_transform.py:282-345, itself the standard Umeyama solve).
    """
    mu1 = jnp.mean(S1, axis=-2, keepdims=True)
    mu2 = jnp.mean(S2, axis=-2, keepdims=True)
    X1 = S1 - mu1
    X2 = S2 - mu2
    var1 = jnp.sum(X1 * X1, axis=(-1, -2))

    # cross-covariance (3x3): X1^T X2
    K = jnp.einsum("...ni,...nj->...ij", X1, X2)
    U, _, Vh = jnp.linalg.svd(K)
    V = jnp.swapaxes(Vh, -1, -2)
    det = jnp.linalg.det(jnp.einsum("...ij,...kj->...ik", U, V))
    Z = jnp.broadcast_to(jnp.eye(3, dtype=S1.dtype), K.shape).copy()
    Z = Z.at[..., -1, -1].set(jnp.sign(det))
    R = jnp.einsum("...ij,...jk,...lk->...il", V, Z, U)

    scale = jnp.einsum("...ii->...", jnp.einsum("...ij,...jk->...ik", R, K)) / var1
    t = mu2 - scale[..., None, None] * jnp.einsum("...ij,...nj->...ni", R, mu1)
    return scale[..., None, None] * jnp.einsum("...ij,...nj->...ni", R, X1 + mu1) + t

"""Pinhole camera projection (reference: lib/utils/geometry.py:23-32)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def perspective_projection(points: jax.Array, cam_K: jax.Array,
                           eps: float = 1e-9) -> jax.Array:
    """Project 3D points (..., N, 3) with intrinsics K (..., 3, 3) -> (..., N, 2).

    Division by depth is eps-guarded so padded/degenerate frames (z = 0)
    produce finite values instead of inf (those frames are always masked
    out of the losses; the guard keeps their gradients zero, not NaN).
    """
    z = points[..., 2:3]
    z_safe = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    projected = points / z_safe
    out = jnp.einsum("...ij,...nj->...ni", cam_K, projected)
    return out[..., :2]

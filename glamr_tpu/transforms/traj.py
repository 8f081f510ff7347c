"""The 11-D local heading-frame trajectory codec — the core GLAMR representation.

A world trajectory (trans [..., T, 3], orient quaternion [..., T, 4]) is
encoded per frame as

    [d_xy (2), z (1), local_orient_6d (6), d_heading_vec (2)]

where d_xy is the frame-to-frame xy displacement expressed in the previous
frame's heading coordinates, and d_heading_vec encodes the frame-to-frame
heading change as (cos, sin). Frame 0 stores the *absolute* xy and heading.
Decoding integrates headings and yaw-rotated displacements with cumulative
sums — one fused XLA program, no Python loop.

Reference semantics: traj_pred/utils/traj_utils.py:44-117. This module is
batch-first ([..., T, D], time on axis -2), unlike the reference's
time-first layout, so it vmaps over persons/samples and shards naturally.

Padding property (used by the global optimizer): if all entries before the
first real frame hold IDENTITY_LOCAL_TRAJ (d_xy = 0, z = 0, identity local
orient, d_heading_vec = (1, 0) i.e. heading delta 0) and the absolute init
values sit at that first real frame, decoding the padded array yields the
correct trajectory on the real frames (cumsum over identity deltas is zero,
and rotation by heading 0 is the identity) — so ragged per-person spans
become fixed [P, T] arrays. NOTE an all-zeros pad does NOT work: the zero
heading vector decodes to heading pi/2 under the atan2 guard.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .heading import (
    deheading_quat,
    get_heading,
    get_heading_q,
    heading_to_quat,
    heading_to_vec,
    vec_to_heading,
)
from .rotation import (
    normalize,
    quat_apply,
    quat_conjugate,
    quat_mul,
    quat_to_rot6d,
    rot6d_to_quat,
)

# z-up base orientation (w, x, y, z) — the constant frame change GLAMR applies
# between SMPL's y-up body frame and the z-up world (traj_utils.py:14).
BASE_ORIENT = (0.5, 0.5, 0.5, 0.5)

# the "do nothing" local-traj frame: zero displacement, zero height, identity
# local orientation in 6d ([1,0,0], [0,1,0] columns), zero heading delta
IDENTITY_LOCAL_TRAJ = (0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 1.0, 0.0)


def pad_local_traj_span(local_span, start: int, total_len: int):
    """Place a local-traj span (T_span, 11) at [start, start+T_span) of a
    (total_len, 11) array whose other frames hold IDENTITY_LOCAL_TRAJ, so
    decoding the padded array reproduces the span's trajectory in place."""
    out = np.tile(np.array(IDENTITY_LOCAL_TRAJ, np.float32), (total_len, 1))
    out[start: start + local_span.shape[0]] = np.asarray(local_span)
    return out


def _base_q(dtype) -> jax.Array:
    return jnp.array(BASE_ORIENT, dtype=dtype)


def rot_2d(xy: jax.Array, theta: jax.Array) -> jax.Array:
    """Rotate 2-vectors xy (..., 2) by angles theta (...,)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [xy[..., 0] * c - xy[..., 1] * s, xy[..., 0] * s + xy[..., 1] * c], axis=-1
    )


def traj_global2local_heading(
    trans: jax.Array,
    orient_q: jax.Array,
    local_orient_type: str = "6d",
) -> jax.Array:
    """World trajectory -> 11-D local rep. trans (..., T, 3), orient (..., T, 4)."""
    xy, z = trans[..., :2], trans[..., 2:3]
    q = quat_mul(orient_q, quat_conjugate(_base_q(orient_q.dtype)))
    heading = get_heading(q)
    local_q = deheading_quat(q, get_heading_q(q))
    if local_orient_type == "6d":
        local_orient = quat_to_rot6d(local_q)
    else:
        local_orient = local_q[..., :3]

    d_xy = xy[..., 1:, :] - xy[..., :-1, :]
    d_heading = heading[..., 1:] - heading[..., :-1]
    d_xy_local = rot_2d(d_xy, -heading[..., :-1])
    # frame 0 carries the absolutes
    d_xy_full = jnp.concatenate([xy[..., :1, :], d_xy_local], axis=-2)
    d_heading_full = jnp.concatenate([heading[..., :1], d_heading], axis=-1)
    d_heading_vec = heading_to_vec(d_heading_full)
    return jnp.concatenate([d_xy_full, z, local_orient, d_heading_vec], axis=-1)


def traj_local2global_heading(
    local_traj: jax.Array,
    local_orient_type: str = "6d",
    deheading_local: bool = False,
    local_heading: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """11-D local rep -> (trans (..., T, 3), orient_q (..., T, 4)).

    local_heading=False treats the last two channels as absolute headings
    (used when the optimizer runs in absolute-heading mode).
    """
    d_xy = local_traj[..., :2]
    z = local_traj[..., 2:3]
    local_orient = local_traj[..., 3:-2]
    d_heading = vec_to_heading(local_traj[..., -2:])

    heading = jnp.cumsum(d_heading, axis=-1) if local_heading else d_heading
    # frame t's displacement is expressed in frame t-1's heading coords;
    # frame 0 is absolute (rotation by prepended heading 0 = identity).
    prev_heading = jnp.concatenate(
        [jnp.zeros_like(heading[..., :1]), heading[..., :-1]], axis=-1
    )
    xy = jnp.cumsum(rot_2d(d_xy, prev_heading), axis=-2)
    trans = jnp.concatenate([xy, z], axis=-1)

    heading_q = heading_to_quat(heading)
    if local_orient_type == "6d":
        local_q = rot6d_to_quat(local_orient)
        if deheading_local:
            local_q = deheading_quat(local_q)
    else:
        local_q = normalize(
            jnp.concatenate([local_orient, jnp.zeros_like(local_orient[..., :1])], axis=-1)
        )
    orient_q = quat_mul(quat_mul(heading_q, local_q), _base_q(local_traj.dtype))
    return trans, orient_q


def get_init_heading_q(orient_q0: jax.Array) -> jax.Array:
    """Heading quaternion of the first frame after removing the base orient."""
    q = quat_mul(orient_q0, quat_conjugate(_base_q(orient_q0.dtype)))
    return get_heading_q(q)


def convert_traj_world2heading(
    orient_q: jax.Array,
    trans: jax.Array,
    apply_base_orient_after: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Re-express a trajectory in its first frame's heading coordinates.

    Used for the chunked G-MPJPE alignment (evaluator) and the trajectory
    predictor's init_heading_coord input (traj_utils.py:97-107).
    """
    base = _base_q(orient_q.dtype)
    q_nobase = quat_mul(orient_q, quat_conjugate(jnp.broadcast_to(base, orient_q.shape)))
    heading_q = get_heading_q(q_nobase[..., :1, :])
    inv_heading = jnp.broadcast_to(quat_conjugate(heading_q), q_nobase.shape)
    orient_heading = quat_mul(inv_heading, q_nobase)
    # subtract first-frame xy only (z stays absolute)
    trans_local = trans - jnp.concatenate(
        [jnp.broadcast_to(trans[..., :1, :2], trans[..., :2].shape),
         jnp.zeros_like(trans[..., 2:])], axis=-1
    )
    trans_heading = quat_apply(inv_heading, trans_local)
    if apply_base_orient_after:
        orient_heading = quat_mul(orient_heading, jnp.broadcast_to(base, orient_heading.shape))
    return orient_heading, trans_heading


def convert_traj_heading2world(
    orient_q: jax.Array,
    trans: jax.Array,
    init_heading_q: jax.Array,
    init_trans: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Inverse of convert_traj_world2heading given the stored init values."""
    init_heading_q = jnp.broadcast_to(init_heading_q, orient_q.shape)
    trans_world = quat_apply(init_heading_q, trans)
    trans_world = trans_world + jnp.concatenate(
        [jnp.broadcast_to(init_trans[..., :2], trans_world[..., :2].shape),
         jnp.zeros_like(trans_world[..., 2:])], axis=-1
    )
    orient_world = quat_mul(
        quat_mul(init_heading_q, orient_q),
        jnp.broadcast_to(_base_q(orient_q.dtype), orient_q.shape),
    )
    return orient_world, trans_world


# ---------------------------------------------------------------------------
# occlusion-aware interpolation (host-side numpy: runs once at data init,
# outside jit — reference uses scipy interp1d: traj_utils.py:120-142)
# ---------------------------------------------------------------------------

def interp_linear_extrap(vis_idx: np.ndarray, values: np.ndarray, length: int) -> np.ndarray:
    """Per-channel linear interpolation over visible frames with linear
    extrapolation outside, matching scipy interp1d(fill_value='extrapolate')."""
    vis_idx = np.asarray(vis_idx, dtype=np.float64)
    grid = np.arange(length, dtype=np.float64)
    flat = values.reshape(len(vis_idx), -1)
    out = np.empty((length, flat.shape[1]), dtype=values.dtype)
    for c in range(flat.shape[1]):
        out[:, c] = np.interp(grid, vis_idx, flat[:, c])
    # np.interp clamps at the boundaries; add linear extrapolation
    if len(vis_idx) >= 2:
        left_slope = (flat[1] - flat[0]) / max(vis_idx[1] - vis_idx[0], 1e-9)
        right_slope = (flat[-1] - flat[-2]) / max(vis_idx[-1] - vis_idx[-2], 1e-9)
        before = grid < vis_idx[0]
        after = grid > vis_idx[-1]
        out[before] = flat[0] + (grid[before, None] - vis_idx[0]) * left_slope
        out[after] = flat[-1] + (grid[after, None] - vis_idx[-1]) * right_slope
    return out.reshape((length,) + values.shape[1:])


def interp_orient_q_sep_heading(
    orient_q_vis: np.ndarray, vis_frames: np.ndarray
) -> np.ndarray:
    """Interpolate occluded orientations separately in heading-vector and
    deheaded local-6d space, then recompose (traj_utils.py:120-142).

    Host-side numpy (runs once during data initialization).
    """
    import jax.numpy as _jnp  # computed with the jnp kernels for consistency

    q = jnp.asarray(orient_q_vis)
    q_rb = quat_mul(q, quat_conjugate(_base_q(q.dtype)))
    heading_vec = np.asarray(heading_to_vec(get_heading(q_rb)))
    local_orient = np.asarray(quat_to_rot6d(deheading_quat(q_rb, get_heading_q(q_rb))))

    length = int(vis_frames.shape[0])
    vis_ind = np.where(np.asarray(vis_frames))[0]
    heading_vec_i = interp_linear_extrap(vis_ind, heading_vec, length)
    local_orient_i = interp_linear_extrap(vis_ind, local_orient, length)

    heading_q = heading_to_quat(vec_to_heading(jnp.asarray(heading_vec_i)))
    local_q = rot6d_to_quat(jnp.asarray(local_orient_i))
    out = quat_mul(quat_mul(heading_q, local_q), _base_q(heading_q.dtype))
    return np.asarray(out)

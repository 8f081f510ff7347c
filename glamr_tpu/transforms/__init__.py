"""TPU-native rotation / heading / trajectory transform library.

Foundation layer of glamr_tpu — everything above (body model, CVAEs,
global optimizer, evaluator) builds on these pure-jnp kernels.
"""
from .rotation import (
    angle_axis_to_quaternion,
    angle_axis_to_rot6d,
    angle_axis_to_rotation_matrix,
    normalize,
    quat_angle,
    quat_angle_diff,
    quat_apply,
    quat_between_two_vec,
    quat_conjugate,
    quat_from_ypr_euler,
    quat_mul,
    quat_to_rot6d,
    quaternion_to_angle_axis,
    quaternion_to_rotation_matrix,
    rot6d_to_angle_axis,
    rot6d_to_quat,
    rot6d_to_rotmat,
    rotation_matrix_to_angle_axis,
    rotation_matrix_to_quaternion,
    rotmat_to_rot6d,
    safe_atan2,
    ypr_euler_from_quat,
)
from .heading import (
    deheading_quat,
    get_heading,
    get_heading_q,
    get_yaw,
    get_yaw_q,
    heading_to_quat,
    heading_to_vec,
    vec_to_heading,
)
from .transform import (
    inverse_transform,
    make_transform,
    similarity_transform,
    transform_rot,
    transform_trans,
)
from .traj import (
    BASE_ORIENT,
    convert_traj_heading2world,
    convert_traj_world2heading,
    get_init_heading_q,
    interp_linear_extrap,
    interp_orient_q_sep_heading,
    rot_2d,
    traj_global2local_heading,
    traj_local2global_heading,
)

__all__ = [k for k in dir() if not k.startswith("_")]

"""Device-portable geometry core: quaternions, SO(3)/SE(3), SE(3) B-splines.

All functions are pure, dtype-polymorphic, and jit/vmap/grad-safe.
Reference parity: src/core/common/{Quaternion.h, SplineFunctor.h, Spline.h},
src/core/states/Transformation.cpp.
"""

from .lie import (
    quat_identity,
    quat_multiply,
    quat_conjugate,
    quat_normalize,
    quat_rotate,
    quat_log,
    quat_exp,
    quat_to_matrix,
    so3_hat,
    se3_exp,
    se3_log,
)
from .transform import (
    Pose,
    pose_identity,
    pose_compose,
    pose_inverse,
    pose_apply,
    pose_exp,
    pose_log,
)
from .spline import (
    SplineKnots,
    spline_segment_start_and_u,
    spline_interp_t,
    spline_interp_q,
    spline_pose_at,
    spline_pose_at_times,
    spline_retract,
    spline_transform_to,
    spline_transform_by,
    spline_transform_by_right,
)

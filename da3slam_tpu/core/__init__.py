"""Core geometry + transform algebra (pure JAX, CPU-runnable).

This is the single canonical home for math the reference repo duplicated
four times (see DA3-SLAM ``align_geometry.py:192``,
``utils/align_geometry_single.py:52``, ``utils/geometry.py:4``,
``utils/da3_streaming.py:53``).
"""

from da3slam_tpu.core.transforms import (  # noqa: F401
    se3_to_4x4,
    se3_from_4x4,
    se3_inverse,
    se3_compose,
    sim3_identity,
    sim3_apply,
    sim3_compose,
    sim3_inverse,
    sim3_accumulate,
    sim3_to_matrix,
    sim3_transform_w2c,
    quat_to_rotmat,
    rotmat_to_quat,
    slerp_rotations,
    orthonormalize_rotation,
)
from da3slam_tpu.core.geometry import (  # noqa: F401
    pixel_grid,
    backproject_depth,
    project_points,
    depth_scale_ratio,
)

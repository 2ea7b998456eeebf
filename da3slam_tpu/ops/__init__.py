"""Registration / alignment ops and TPU kernels.

Replaces the reference's native dependencies (SURVEY.md §2.4): Open3D
point-to-point ICP and KD-tree correspondence search become fixed-shape JAX
registration kernels (projective data association — depth maps give pixel-grid
correspondence structure, no trees needed), and the numba-accelerated weighted
alignment becomes compiled XLA.
"""

from da3slam_tpu.ops.registration import (  # noqa: F401
    weighted_umeyama,
    umeyama,
    huber_weights,
    irls_sim3,
    RegistrationResult,
)
from da3slam_tpu.ops.icp import icp_point_to_point, ICPResult  # noqa: F401
from da3slam_tpu.ops.tsdf import (  # noqa: F401
    TSDFGrid,
    fuse_frames,
    fuse_pipeline_output,
    integrate_frames,
    integrate_frames_sparse,
    make_grid,
)

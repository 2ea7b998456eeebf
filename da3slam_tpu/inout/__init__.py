"""Host-side I/O: config loading, image path handling, PLY / trajectory export."""

from da3slam_tpu.inout.config import load_config, update_recursive  # noqa: F401
from da3slam_tpu.inout.images import load_image_paths, extract_keyframes, load_images  # noqa: F401
from da3slam_tpu.inout.ply import write_ply, read_ply, merge_ply_files  # noqa: F401
from da3slam_tpu.inout.trajectory import (  # noqa: F401
    load_camera_poses,
    load_trajectory,
    save_camera_poses,
    save_trajectory_kitti,
    save_trajectory_tum,
)
from da3slam_tpu.inout.mesh import (  # noqa: F401
    marching_tetrahedra,
    read_mesh_ply,
    tsdf_to_mesh,
    write_mesh_ply,
)

"""Host-side I/O: config loading, image path handling, PLY / trajectory export."""

from da3slam_tpu.inout.config import load_config, update_recursive  # noqa: F401
from da3slam_tpu.inout.images import load_image_paths, extract_keyframes, load_images  # noqa: F401
from da3slam_tpu.inout.ply import write_ply, read_ply, merge_ply_files  # noqa: F401
from da3slam_tpu.inout.trajectory import save_camera_poses, load_camera_poses  # noqa: F401

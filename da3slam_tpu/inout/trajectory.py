"""Trajectory / intrinsics export in the reference's file formats.

``camera_poses.txt``: one row per frame, 16 floats = flattened 4x4 c2w
(reference utils/da3_streaming.py:777-783).
``intrinsic.txt``: one row per frame, ``fx fy cx cy``
(da3_streaming.py:786-795).
``camera_poses.ply``: camera centers as colored points
(da3_streaming.py:797-817).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from da3slam_tpu.inout.ply import write_ply

CHUNK_COLORS = np.array(
    [
        [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0], [255, 0, 255],
        [0, 255, 255], [128, 0, 0], [0, 128, 0], [0, 0, 128], [128, 128, 0],
    ],
    np.uint8,
)


def save_camera_poses(
    output_dir: str | Path,
    c2w_poses: np.ndarray,
    intrinsics: np.ndarray,
    chunk_indices: np.ndarray | None = None,
) -> None:
    """Write camera_poses.txt / intrinsic.txt / camera_poses.ply.

    Args:
      c2w_poses:     ``[N, 4, 4]`` camera-to-world
      intrinsics:    ``[N, 3, 3]``
      chunk_indices: optional ``[N]`` int — colors each camera center by its
                     chunk in the PLY (the reference's per-chunk coloring,
                     da3_streaming.py:797-817)
    """
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    with open(out / "camera_poses.txt", "w") as f:
        for pose in c2w_poses:
            f.write(" ".join(str(x) for x in np.asarray(pose).flatten()) + "\n")

    with open(out / "intrinsic.txt", "w") as f:
        for K in intrinsics:
            f.write(f"{K[0, 0]} {K[1, 1]} {K[0, 2]} {K[1, 2]}\n")

    centers = np.asarray(c2w_poses)[:, :3, 3]
    if chunk_indices is not None:
        colors = CHUNK_COLORS[np.asarray(chunk_indices) % len(CHUNK_COLORS)]
    else:
        colors = np.broadcast_to(CHUNK_COLORS[0], centers.shape).copy()
    write_ply(out / "camera_poses.ply", centers, colors, binary=False)


def load_camera_poses(path: str | Path) -> np.ndarray:
    """Read a camera_poses.txt back into ``[N, 4, 4]``."""
    rows = np.loadtxt(path)
    if rows.ndim == 1:
        rows = rows[None]
    return rows.reshape(-1, 4, 4)

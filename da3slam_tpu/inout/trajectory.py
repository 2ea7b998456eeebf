"""Trajectory / intrinsics I/O.

Reference formats (utils/da3_streaming.py:777-817):
  ``camera_poses.txt``: one row per frame, 16 floats = flattened 4x4 c2w.
  ``intrinsic.txt``: one row per frame, ``fx fy cx cy``.
  ``camera_poses.ply``: camera centers as colored points.

Interop formats (the reference's streaming path targets KITTI odometry
sequences — da3_streaming.py:829-830 — and standard evaluation tooling
like ``evo`` consumes TUM):
  KITTI: 12 floats per row = the top 3x4 of the c2w matrix, row-major.
  TUM:   ``timestamp tx ty tz qx qy qz qw`` per row (c2w).
``load_trajectory`` auto-detects the three by column count (16/12/8).
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
    extra_formats: tuple[str, ...] = (),
) -> None:
    """Write camera_poses.txt / intrinsic.txt / camera_poses.ply.

    Args:
      c2w_poses:     ``[N, 4, 4]`` camera-to-world
      intrinsics:    ``[N, 3, 3]``
      chunk_indices: optional ``[N]`` int — colors each camera center by its
                     chunk in the PLY (the reference's per-chunk coloring,
                     da3_streaming.py:797-817)
      extra_formats: any of "tum" / "kitti" — additionally writes
                     ``camera_poses_tum.txt`` / ``camera_poses_kitti.txt``
                     for standard evaluation tooling
    """
    validate_extra_formats(extra_formats)  # fail before any file is written
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

    # interop extras last: the reference-format exports above must survive
    # even if an extras writer fails mid-run
    for fmt in extra_formats:
        if fmt == "tum":
            save_trajectory_tum(out / "camera_poses_tum.txt", c2w_poses)
        elif fmt == "kitti":
            save_trajectory_kitti(out / "camera_poses_kitti.txt", c2w_poses)


EXTRA_TRAJ_FORMATS = ("tum", "kitti")


def validate_extra_formats(formats) -> tuple[str, ...]:
    """Validate interop-export format names; call at CLI-parse/config time
    so a typo fails BEFORE a multi-hour run, not at export."""
    formats = tuple(formats)
    for fmt in formats:
        if fmt not in EXTRA_TRAJ_FORMATS:
            raise ValueError(
                f"unknown trajectory export format {fmt!r}; "
                f"supported: {', '.join(EXTRA_TRAJ_FORMATS)}"
            )
    return formats


def _loadtxt(path: str | Path, **kw) -> np.ndarray:
    """np.loadtxt that tolerates comma-delimited rows (some public pose
    files use them; the auto-detector accepts them too)."""
    with open(path) as f:
        first = ""
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                first = line
                break
    if "," in first:
        kw.setdefault("delimiter", ",")
    return np.loadtxt(path, **kw)


def load_camera_poses(path: str | Path) -> np.ndarray:
    """Read a camera_poses.txt back into ``[N, 4, 4]``."""
    rows = _loadtxt(path)
    if rows.ndim == 1:
        rows = rows[None]
    return rows.reshape(-1, 4, 4)


# ---------------------------------------------------------------------------
# Interop formats: KITTI odometry + TUM
# ---------------------------------------------------------------------------

def save_trajectory_kitti(path: str | Path, c2w_poses: np.ndarray) -> None:
    """KITTI odometry poses file: 12 floats per row (top 3x4, row-major)."""
    P = np.asarray(c2w_poses, np.float64)[:, :3, :].reshape(-1, 12)
    with open(path, "w") as f:
        for row in P:
            f.write(" ".join(f"{x:.9g}" for x in row) + "\n")


def load_trajectory_kitti(path: str | Path) -> np.ndarray:
    """KITTI odometry poses file → ``[N, 4, 4]`` c2w."""
    rows = _loadtxt(path)
    if rows.ndim == 1:
        rows = rows[None]
    out = np.tile(np.eye(4), (rows.shape[0], 1, 1))
    out[:, :3, :] = rows.reshape(-1, 3, 4)
    return out


def _quat_to_rotmat_np(q: np.ndarray) -> np.ndarray:
    """(w,x,y,z) quaternions ``[..., 4]`` → ``[..., 3, 3]``, pure numpy
    (float64-preserving — the jax helpers would downcast to f32)."""
    q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.empty(q.shape[:-1] + (3, 3), q.dtype)
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - w * z)
    R[..., 0, 2] = 2 * (x * z + w * y)
    R[..., 1, 0] = 2 * (x * y + w * z)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - w * x)
    R[..., 2, 0] = 2 * (x * z - w * y)
    R[..., 2, 1] = 2 * (y * z + w * x)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def save_trajectory_tum(
    path: str | Path,
    c2w_poses: np.ndarray,
    timestamps: np.ndarray | None = None,
) -> None:
    """TUM trajectory: ``timestamp tx ty tz qx qy qz qw`` per row (c2w).

    ``timestamps`` defaults to the frame index; quaternions come from the
    pure-numpy Shepperd conversion (export3d._rotmat_to_quat_np — f64 in,
    f64 out; stores (w, x, y, z), reordered to TUM's (x, y, z, w) here).
    """
    from da3slam_tpu.inout.export3d import _rotmat_to_quat_np

    P = np.asarray(c2w_poses, np.float64)
    if timestamps is None:
        timestamps = np.arange(len(P), dtype=np.float64)
    q_wxyz = _rotmat_to_quat_np(P[:, :3, :3])
    t = P[:, :3, 3]
    with open(path, "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        for ts, tr, q in zip(timestamps, t, q_wxyz):
            f.write(
                f"{ts:.6f} {tr[0]:.9g} {tr[1]:.9g} {tr[2]:.9g} "
                f"{q[1]:.9g} {q[2]:.9g} {q[3]:.9g} {q[0]:.9g}\n"
            )


def load_trajectory_tum(path: str | Path) -> tuple[np.ndarray, np.ndarray]:
    """TUM trajectory → ``(timestamps [N], c2w [N, 4, 4])``."""
    rows = _loadtxt(path, comments="#")
    if rows.ndim == 1:
        rows = rows[None]
    if rows.shape[1] != 8:
        raise ValueError(
            f"{path}: TUM rows have 8 columns (t tx ty tz qx qy qz qw), "
            f"got {rows.shape[1]}"
        )
    ts = rows[:, 0]
    q_wxyz = rows[:, [7, 4, 5, 6]]  # reorder (x,y,z,w) → (w,x,y,z)
    R = _quat_to_rotmat_np(q_wxyz)
    out = np.tile(np.eye(4), (rows.shape[0], 1, 1))
    out[:, :3, :3] = R
    out[:, :3, 3] = rows[:, 1:4]
    return ts, out


def load_trajectory(path: str | Path, fmt: str = "auto") -> np.ndarray:
    """Load a trajectory as ``[N, 4, 4]`` c2w from any supported format.

    ``fmt``: "reference" (16-float rows), "kitti" (12), "tum" (8), or
    "auto" — detected from the column count of the first data row.
    """
    if fmt == "auto":
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line and not line.startswith("#"):
                    n = len(line.replace(",", " ").split())
                    break
            else:
                raise ValueError(f"{path}: no data rows")
        fmt = {16: "reference", 12: "kitti", 8: "tum"}.get(n)
        if fmt is None:
            raise ValueError(
                f"{path}: unrecognized trajectory format ({n} columns; "
                "expected 16=reference, 12=KITTI, 8=TUM)"
            )
    if fmt == "reference":
        return load_camera_poses(path)
    if fmt == "kitti":
        return load_trajectory_kitti(path)
    if fmt == "tum":
        return load_trajectory_tum(path)[1]
    raise ValueError(f"unknown trajectory format {fmt!r}")

"""Render a trained 3DGS scene along a camera trajectory.

Closes the loop the reference never could (its ``main_3dgs.py`` was a stub,
reference main_3dgs.py:1-5): after ``main_3dgs --train_iters`` writes a
splat PLY and the SLAM run writes ``camera_poses.txt`` / ``intrinsic.txt``,
this CLI replays the trajectory through the differentiable tile rasterizer
(ops/rasterize.py) and writes the rendered frames as PNGs — novel-view
synthesis from the SLAM map, entirely on-device.

``--interp N`` slerps N in-between cameras per trajectory edge for smooth
fly-throughs (the viewer's demo mode, offline and at full quality).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Render 3DGS splats along a trajectory")
    p.add_argument("--splats", required=True, help="3DGS .ply (main_3dgs output)")
    p.add_argument("--poses", required=True,
                   help="camera_poses.txt (16-float c2w rows) from the SLAM run")
    p.add_argument("--intrinsics", default=None,
                   help="intrinsic.txt (fx fy cx cy rows); defaults to a "
                        "60-deg pinhole if absent")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--height", type=int, default=504)
    p.add_argument("--width", type=int, default=504)
    p.add_argument("--interp", type=int, default=0,
                   help="slerp N extra cameras between consecutive poses")
    p.add_argument("--stride", type=int, default=1, help="render every k-th pose")
    p.add_argument("--bg", type=float, nargs=3, default=(0.0, 0.0, 0.0))
    p.add_argument("--max_per_tile", type=int, default=256)
    return p


def _interp_poses(c2w: np.ndarray, n_between: int) -> np.ndarray:
    """Slerp rotations + lerp translations between consecutive c2w poses."""
    from da3slam_tpu.core.transforms import slerp_rotations

    out = []
    for a, b in zip(c2w[:-1], c2w[1:]):
        out.append(a)
        for t in np.linspace(0, 1, n_between + 2)[1:-1]:
            T = np.eye(4)
            T[:3, :3] = slerp_rotations(a[:3, :3], b[:3, :3], float(t))
            T[:3, 3] = (1 - t) * a[:3, 3] + t * b[:3, 3]
            out.append(T)
    out.append(c2w[-1])
    return np.stack(out)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from da3slam_tpu.inout.export3d import read_3dgs_ply
    from da3slam_tpu.inout.trajectory import load_camera_poses
    from da3slam_tpu.ops.rasterize import rasterize

    gs = read_3dgs_ply(args.splats)
    c2w = load_camera_poses(args.poses)[:: args.stride]
    if args.interp > 0:
        c2w = _interp_poses(c2w, args.interp)

    H, W = args.height, args.width
    if args.intrinsics:
        rows = np.loadtxt(args.intrinsics)
        if rows.ndim == 1:
            rows = rows[None]
        fx, fy, cx, cy = rows[0]
    else:
        fx = fy = 0.5 * W / np.tan(np.deg2rad(30.0))
        cx, cy = W / 2.0, H / 2.0
    K = jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    points = jnp.asarray(gs["points"], jnp.float32)
    scales = jnp.asarray(gs["scales"], jnp.float32)
    quats = jnp.asarray(gs["rotations"], jnp.float32)
    colors = jnp.asarray(gs["colors"], jnp.float32)
    opacity = jnp.asarray(gs["opacity"], jnp.float32)
    bg = jnp.asarray(args.bg, jnp.float32)

    @jax.jit
    def render(E):
        rgb, alpha, _ = rasterize(
            points, scales, quats, colors, opacity, K, E, (H, W),
            bg=bg, max_per_tile=args.max_per_tile,
        )
        return jnp.clip(rgb, 0.0, 1.0)

    for i, T in enumerate(c2w):
        E = jnp.asarray(np.linalg.inv(T)[:3], jnp.float32)  # c2w → w2c
        frame = np.asarray(render(E) * 255.0).astype(np.uint8)
        Image.fromarray(frame).save(out_dir / f"{i:06d}.png")
    print(f"rendered {len(c2w)} frames ({W}x{H}, {points.shape[0]} splats) "
          f"to {out_dir}")


if __name__ == "__main__":
    main()

"""Measure dense vs block-sparse TSDF fusion on the real chip.

Corner-room synthetic at bench-like scale (504x504 depth, 192-res grid),
sweeping block size / budget.  Run: python tools/tsdf_sparse_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from da3slam_tpu.ops.tsdf import (
    estimate_bounds,
    grid_from_bounds,
    integrate_frames,
    integrate_frames_sparse,
)
from da3slam_tpu.utils.synthetic import (
    default_intrinsics,
    make_trajectory,
    render_depth,
)


def main(n_frames=32, hw=(504, 504), resolution=192):
    K = default_intrinsics(hw)
    poses = make_trajectory(n_frames)
    depth = np.stack([render_depth(E, K, hw) for E in poses]).astype(np.float32)
    conf = np.ones(depth.shape, np.float32)
    Ks = np.repeat(K[None], n_frames, axis=0).astype(np.float32)
    E = poses.astype(np.float32)

    lo, hi = estimate_bounds(depth[:8], Ks[:8], E[:8], resolution=resolution)
    grid0 = grid_from_bounds(lo, hi, resolution)
    print("grid:", grid0.sdf.shape, "voxels:", grid0.sdf.size)

    dd, cc, kk, ee = map(jnp.asarray, (depth, conf, Ks, E))
    jax.block_until_ready(dd)

    def timeit(fn, reps=3):
        out = fn()
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / reps / n_frames * 1e3, out

    ms, g = timeit(lambda: integrate_frames(grid0, dd, cc, kk, ee))
    print(f"dense: {ms:.2f} ms/frame  ({1e3 / ms:.1f} FPS)")

    for bs in (8, 4):
        nb = 1
        for s in grid0.sdf.shape:
            nb *= -(-s // bs)
        g_s, counts = integrate_frames_sparse(
            grid0, dd, cc, kk, ee, block_size=bs)
        print(f"bs={bs}: nb={nb} active max={counts.max()} "
              f"mean={counts.mean():.0f}")
        for budget in (None, int(counts.max() * 1.25) + 64):
            ms, out = timeit(lambda: integrate_frames_sparse(
                grid0, dd, cc, kk, ee, block_size=bs, active_blocks=budget))
            gs, _ = out
            # quality vs dense: compare sdf where sparse touched
            wmask = np.asarray(gs.weight) > 0
            diff = np.abs(np.asarray(gs.sdf) - np.asarray(g.sdf))[wmask]
            print(f"  bs={bs} budget={budget}: {ms:.2f} ms/frame "
                  f"({1e3 / ms:.1f} FPS)  max|sdf-dense| on touched: "
                  f"{diff.max():.4f}")


if __name__ == "__main__":
    main()

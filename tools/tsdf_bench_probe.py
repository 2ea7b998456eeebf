"""Dense vs block-sparse TSDF on the EXACT bench_tsdf_fusion scene
(SMALL-model pipeline depths over textured corner-room frames, 192-res
grid).  Run on the real chip: python tools/tsdf_bench_probe.py"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from da3slam_tpu.models import DepthAnything3
from da3slam_tpu.ops.tsdf import (
    estimate_bounds,
    grid_from_bounds,
    integrate_frames,
    integrate_frames_sparse,
)
from da3slam_tpu.slam.pipeline import run_streaming_slam
from da3slam_tpu.utils.synthetic import (
    default_intrinsics,
    make_trajectory,
    render_rgb_sequence,
)


def main():
    hw = (504, 504)
    n_frames = 106
    frames = render_rgb_sequence(
        make_trajectory(n_frames), default_intrinsics(hw), hw
    )
    frames_dev = jnp.asarray(frames)
    jax.block_until_ready(frames_dev)
    small = DepthAnything3.from_pretrained("small")

    out = run_streaming_slam(
        small.params, frames_dev, small.cfg,
        chunk_size=16, overlap=1, process_hw=hw, segment_spill="device",
    )
    C, N = out.depth.shape[:2]
    depth = jnp.asarray(out.depth).reshape(C * N, *out.depth.shape[2:])
    conf = jnp.maximum(
        jnp.asarray(out.conf).reshape(C * N, *out.conf.shape[2:]) - 1.0, 0.0
    )
    K = jnp.asarray(out.intrinsics).reshape(C * N, 3, 3)
    E = jnp.asarray(out.extrinsics_global).reshape(C * N, 3, 4)
    jax.block_until_ready(depth)
    nf = depth.shape[0]

    lo, hi = estimate_bounds(depth[:8], K[:8], E[:8], resolution=192)
    grid0 = grid_from_bounds(lo, hi, 192)
    print("grid:", grid0.sdf.shape, "voxels:", grid0.sdf.size, flush=True)

    def timeit(fn, reps=3):
        out = fn()
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / reps / nf * 1e3, out

    ms, g = timeit(lambda: integrate_frames(grid0, depth, conf, K, E))
    print(f"dense: {ms:.2f} ms/frame  ({1e3 / ms:.1f} FPS)", flush=True)

    for bs in (8, 4):
        nb = 1
        for s in grid0.sdf.shape:
            nb *= -(-s // bs)
        _, counts = integrate_frames_sparse(
            grid0, depth, conf, K, E, block_size=bs, active_blocks=64)
        cmax, cmean = int(counts.max()), float(counts.mean())
        print(f"bs={bs}: nb={nb} active max={cmax} mean={cmean:.0f} "
              f"({cmax / nb:.1%})", flush=True)
        budget = min(nb, int(cmax * 1.2) + 64)
        ms, o = timeit(lambda: integrate_frames_sparse(
            grid0, depth, conf, K, E, block_size=bs, active_blocks=budget))
        gs, _ = o
        wmask = np.asarray(gs.weight) > 0
        diff = np.abs(np.asarray(gs.sdf) - np.asarray(g.sdf))[wmask]
        print(f"  bs={bs} budget={budget}: {ms:.2f} ms/frame "
              f"({1e3 / ms:.1f} FPS)  max|sdf-dense| touched: {diff.max():.4f}",
              flush=True)


if __name__ == "__main__":
    main()

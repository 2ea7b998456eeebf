#!/usr/bin/env python
"""Stage decomposition of the SMALL-tier headline path on the real chip.

Times: encoder / encoder+DPT / full forward on one 16-frame window, then the
full fused-scan pipeline over 106 textured frames (7 windows) — the bench
headline — to expose the per-window overhead on top of the raw forwards.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from da3slam_tpu.models import DepthAnything3
from da3slam_tpu.models import vit, dpt
from da3slam_tpu.models.da3 import forward_fn
from da3slam_tpu.slam.pipeline import run_streaming_slam

N, H, W = 16, 504, 504
REPS = 4


def _force(out):
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[-1])


def timed(name, fn, *args, scale=N):
    _force(fn(*args))
    best = np.inf
    for _ in range(REPS):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:18s} {best * 1e3:8.1f} ms  ({scale / best:6.1f} FPS)", flush=True)
    return best


def main():
    model = DepthAnything3.from_pretrained("small")
    cfg = model.cfg
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(N, H, W, 3)), jnp.float32)

    @jax.jit
    def enc_only(params, images):
        taps, final, grid = vit.encode(params["encoder"], images, cfg,
                                       "auto", jnp.bfloat16)
        return final[:, 0, :8]

    @jax.jit
    def enc_dpt(params, images):
        taps, final, grid = vit.encode(params["encoder"], images, cfg,
                                       "auto", jnp.bfloat16)
        d, c, r = dpt.apply_dpt(params["dpt"], taps, grid, (H, W), cfg)
        return d[:, :2, :2]

    @jax.jit
    def full(params, images):
        out = forward_fn(params, images, cfg, dtype=jnp.bfloat16)
        return out["depth"][:, :2, :2]

    t_enc = timed("encoder", enc_only, model.params, imgs)
    t_ed = timed("encoder+DPT", enc_dpt, model.params, imgs)
    t_full = timed("full forward", full, model.params, imgs)
    print(f"DPT head          {(t_ed - t_enc) * 1e3:8.1f} ms", flush=True)
    print(f"camera/rays/desc  {(t_full - t_ed) * 1e3:8.1f} ms", flush=True)

    # the bench headline: fused-scan pipeline over 7 windows of 16 (step 15)
    from da3slam_tpu.utils.synthetic import (
        default_intrinsics, make_trajectory, render_rgb_sequence,
    )

    n_frames = 106
    frames = render_rgb_sequence(
        make_trajectory(n_frames), default_intrinsics((H, W)), (H, W)
    )
    frames_dev = jnp.asarray(frames)
    jax.block_until_ready(frames_dev)

    def pipe():
        out = run_streaming_slam(model.params, frames_dev, cfg,
                                 chunk_size=16, overlap=1, process_hw=(H, W))
        return out.extrinsics_global

    t_pipe = timed("pipeline 106f", pipe, scale=n_frames)
    n_windows = 7
    print(f"per-window        {t_pipe / n_windows * 1e3:8.1f} ms "
          f"(forward {t_full * 1e3:.1f} -> align+preproc+scan "
          f"{(t_pipe / n_windows - t_full) * 1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()

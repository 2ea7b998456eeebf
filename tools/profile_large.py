#!/usr/bin/env python
"""Stage decomposition of the LARGE-tier window forward on the real chip.

Times encoder / encoder+DPT / full forward separately to locate the gap to
the 30 FPS line (BENCH round 3: 28.0 FPS e2e forward).  One process, three
jits, best-of-N with single tiny syncs (verify skill: dispatch ≈ 50 ms RTT
is noise at these stage times).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from da3slam_tpu.models import DepthAnything3
from da3slam_tpu.models import vit, dpt, camera
from da3slam_tpu.models.da3 import forward_fn

N, H, W = 16, 504, 504
REPS = 4


def _force(out):
    # host fetch forces true completion; block_until_ready can return
    # early through the remote-relay transport (see bench.py:_force)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[-1])


def timed(name, fn, *args):
    _force(fn(*args))
    best = np.inf
    for _ in range(REPS):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:18s} {best * 1e3:8.1f} ms  ({N / best:5.1f} FPS)", flush=True)
    return best


def main():
    model = DepthAnything3.from_pretrained("large")
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


if __name__ == "__main__":
    main()

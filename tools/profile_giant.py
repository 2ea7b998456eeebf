#!/usr/bin/env python
"""Giant-tier (DA3NESTED-GIANT-LARGE) feasibility measurement on one v5e.

The reference's first-listed checkpoint tier (reference configs/config1.yaml:2)
is the nested giant; rounds 1-3 measured SMALL/BASE/LARGE only.  This probes:

  - parameter count / HBM footprint of the giant preset (D=1536, depth 40,
    SwiGLU FFN — models/config.py PRESETS["giant"])
  - 16-frame window forward wall time / FPS at the reference process_res=504
  - device memory stats before/after, if the backend exposes them

Run solo (one TPU process at a time — verify skill).  Compile for a 40-block
model through the axon tunnel is slow (~minutes); size timeouts accordingly.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N, H, W = 16, 504, 504
REPS = 3


def _force(out):
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[-1])


def _mem(tag):
    try:
        stats = jax.local_devices()[0].memory_stats()
        used = stats.get("bytes_in_use", 0) / 2**30
        peak = stats.get("peak_bytes_in_use", 0) / 2**30
        lim = stats.get("bytes_limit", 0) / 2**30
        print(f"[mem {tag}] in_use={used:.2f} GiB peak={peak:.2f} GiB "
              f"limit={lim:.2f} GiB", flush=True)
    except Exception as e:  # noqa: BLE001 — stats are best-effort on axon
        print(f"[mem {tag}] unavailable: {e!r}", flush=True)


def main():
    from da3slam_tpu.models import DepthAnything3
    from da3slam_tpu.models.da3 import forward_fn

    print(f"backend: {jax.devices()[0]}", flush=True)
    _mem("start")

    t0 = time.perf_counter()
    model = DepthAnything3.from_pretrained("giant")
    jax.block_until_ready(model.params)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(model.params))
    n_bytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(model.params))
    print(f"init {time.perf_counter()-t0:.1f}s  params={n_params/1e9:.3f}B "
          f"({n_bytes/2**30:.2f} GiB f32)", flush=True)
    _mem("params")

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(N, H, W, 3)), jnp.float32)
    jax.block_until_ready(imgs)

    @jax.jit
    def full(params, images):
        out = forward_fn(params, images, model.cfg, dtype=jnp.bfloat16)
        return out["depth"][:, :2, :2], out["extrinsics"]

    t0 = time.perf_counter()
    _force(full(model.params, imgs))
    print(f"compile+first run {time.perf_counter()-t0:.1f}s", flush=True)
    _mem("after-forward")

    best = np.inf
    for _ in range(REPS):
        t0 = time.perf_counter()
        _force(full(model.params, imgs))
        best = min(best, time.perf_counter() - t0)
        print(f"  rep {time.perf_counter()-t0:.3f}s", flush=True)
    print(f"giant full forward {best*1e3:8.1f} ms  ({N/best:5.2f} FPS)",
          flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Minimized repro for the fused CLAHE + BASE-tier forward TPU crash.

Known platform issue (ROADMAP.md, round 2): ONE jitted program containing
``preprocess_batch`` (the vmapped-CLAHE brightness pass with its LUT
gathers) AND a BASE-tier 16-frame forward kills the axon TPU worker
("TPU worker process crashed", a kernel fault).  Boundary observed:

  - works with n <= 8 frames fused
  - works with n = 16 when the brightness pass is skipped
  - works with n = 16 as two separate jits (the workaround everywhere it
    matters, e.g. bench.py:bench_forward)
  - jax.lax.optimization_barrier between the stages does NOT help

This script is the tripwire for the workaround: run it after a platform
update; if it prints FUSED OK the "don't fuse for big tiers" guards can be
retired.

Exit codes: 0 = fused program ran (platform fixed, or CPU backend),
            2 = fused program failed while the split path worked (bug still
                present), 3 = even the split path failed (something else).

Usage: python tools/repro_fused_clahe.py [--tier base] [--frames 16]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="base", help="model preset (default base)")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--hw", type=int, default=504, help="input square side")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from da3slam_tpu.models import DepthAnything3
    from da3slam_tpu.models.da3 import forward_fn
    from da3slam_tpu.preprocess.device import preprocess_batch

    print(f"backend: {jax.devices()[0].platform} x{jax.device_count()}")
    model = DepthAnything3.from_pretrained(args.tier)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, size=(args.frames, args.hw, args.hw, 3), dtype=np.uint8)
    )
    jax.block_until_ready(frames)

    def run_split():
        imgs = jax.jit(lambda f: preprocess_batch(f, out_hw=(args.hw, args.hw)))(frames)
        out = jax.jit(
            lambda p, x: forward_fn(p, x, model.cfg, dtype=jnp.bfloat16)
        )(model.params, imgs)
        return float(np.asarray(out["depth"]).ravel()[-1])

    def run_fused():
        @jax.jit
        def fused(p, f):
            imgs = preprocess_batch(f, out_hw=(args.hw, args.hw))
            return forward_fn(p, imgs, model.cfg, dtype=jnp.bfloat16)

        out = fused(model.params, frames)
        return float(np.asarray(out["depth"]).ravel()[-1])

    try:
        v = run_split()
        print(f"SPLIT OK (two jits): depth[-1]={v:.4f}")
    except Exception as e:  # noqa: BLE001
        print(f"SPLIT FAILED: {e!r} — not the known fusion bug; investigate")
        return 3

    try:
        v = run_fused()
        print(f"FUSED OK: depth[-1]={v:.4f} — platform bug appears FIXED; "
              "the split-preprocess workaround (bench.py, ROADMAP.md) can go")
        return 0
    except Exception as e:  # noqa: BLE001
        print(f"FUSED FAILED (known platform bug still present): {e!r}")
        return 2


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Sweep flash block sizes at the ONE-BLOCK intra-view shape.

The intra-view path (B=16 views, S=1301 tokens, H=6, D=64) runs as one
padded 1408-block per (batch, head) — ~38 TF/s in the bench artifact vs
~81 at the big cross-view shape.  With a single k step there is no
pipelining: the VPU exp pass serializes against both matmuls inside each
program.  This probe measures whether q-tiling (bq < S, bk = S) lets
Mosaic overlap the VPU of q-tile i with the MXU of q-tile i+1, and
whether k-tiling's denominator recurrence costs more than it buys.

Usage: probe_intra_flash.py bq,bk [bq,bk ...]   (<=3 per process — verify
skill's TPU sweep discipline; each config pays a fresh compile)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from da3slam_tpu.ops.flash_attention import flash_attention

CHAIN = 256
B, S, H, D = 16, 36 * 36 + 5, 6, 64


def bench(q, k, v, bq, bk, reps=3):
    @jax.jit
    def chained(q, k, v):
        def body(o, _):
            return flash_attention(o, k, v, block_q=bq, block_k=bk,
                                   stable=False), None

        o, _ = jax.lax.scan(body, q, None, length=CHAIN)
        return o

    out = chained(q, k, v)
    float(np.asarray(out[0, 0, -1, -1]))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chained(q, k, v)
        float(np.asarray(out[0, 0, -1, -1]))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    flops = 4.0 * B * H * S * S * D

    for arg in sys.argv[1:]:
        bq, bk = (int(x) for x in arg.split(","))
        try:
            dt = bench(q, k, v, bq, bk)
            print(f"bq={bq:5d} bk={bk:5d}  {dt * 1e3:7.3f} ms  "
                  f"{flops / dt / 1e12:6.2f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq:5d} bk={bk:5d}  FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()

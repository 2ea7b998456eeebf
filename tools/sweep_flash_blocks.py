#!/usr/bin/env python
"""Sweep flash-attention block sizes at the SLAM hot shape on the real TPU.

S = 16·(36²+5) = 20816 is not a multiple of any large block, so padded work
Sq·Sk varies by several percent across block choices; this sweep measures
the real effect (padding waste vs per-block VPU overhead vs K/V restream
traffic) to drive the adaptive selection in ops/flash_attention.py.

Timing discipline (verify skill): chain the kernel against itself in one
lax.scan dispatch; sync once on a tiny slice.
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

CHAIN = 64


def bench(q, k, v, bq, bk, splits=1, reps=2):
    @jax.jit
    def chained(q, k, v):
        def body(o, _):
            return flash_attention(o, k, v, block_q=bq, block_k=bk,
                                   k_splits=splits), None

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
    S, H, D = 16 * (36 * 36 + 5), 6, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, S, H, D)), jnp.bfloat16)
    flops = 4.0 * H * S * S * D

    def ru(x, m):
        return -(-x // m) * m

    # one or more "bq,bk,splits" argv triplets; default sweep otherwise
    if len(sys.argv) > 1:
        configs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
    else:
        configs = [(1024, 2048, 1), (1024, 3584, 1), (1024, 5376, 1)]
    print(f"S={S} H={H} D={D}  chain={CHAIN}")
    rows = []
    for bq, bk, sp in configs:
        pad = ru(S, bq) * ru(S, bk) / (S * S)
        try:
            dt = bench(q, k, v, bq, bk, sp)
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq:5d} bk={bk:5d} sp={sp}  FAILED {type(e).__name__}", flush=True)
            continue
        tf = flops / dt / 1e12
        rows.append((tf, bq, bk, sp, pad))
        print(f"bq={bq:5d} bk={bk:5d} sp={sp} pad={pad:.4f}  {dt * 1e3:7.3f} ms  "
              f"{tf:6.1f} TF/s  ({tf / 98.5:.3f} of D=64 SoL)", flush=True)
    rows.sort(reverse=True)
    tf, bq, bk, sp, pad = rows[0]
    print(f"\nBEST: bq={bq} bk={bk} k_splits={sp}  {tf:.1f} TF/s = {tf / 98.5:.3f} SoL")


if __name__ == "__main__":
    main()

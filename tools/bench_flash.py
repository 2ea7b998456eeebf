"""Microbenchmark for ops/flash_attention at the SLAM hot shape.

The dominant kernel (SURVEY.md §3.1) is cross-view attention over a 16-frame
chunk: S = 16 views x (37x37 patches + registers) ~ 22k tokens, H=6 heads of
D=64 (DA3-SMALL).  Prints TF/s for the forward kernel per (block_q, block_k).

Usage: python tools/bench_flash.py [--s 21984] [--h 6] [--grad]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from da3slam_tpu.ops.flash_attention import flash_attention


def bench(fn, q, k, v, iters=20, warmup=3):
    """Times `fn(q, k, v)` with iterations chained through q so the device
    must execute all of them; a host fetch of one element forces true
    completion (block_until_ready can return early through the remote-relay
    transport)."""

    def chained(q, k, v, n):
        def body(_, q):
            o = fn(q, k, v)
            return (q + 1e-6 * o.astype(q.dtype)).astype(q.dtype)

        return jax.lax.fori_loop(0, n, body, q)

    run = jax.jit(chained, static_argnames="n")
    float(np.asarray(run(q, k, v, warmup))[0, 0, 0, 0])
    t0 = time.perf_counter()
    float(np.asarray(run(q, k, v, iters))[0, 0, 0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=21984)
    ap.add_argument("--h", type=int, default=6)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--grad", action="store_true", help="bench fwd+bwd too")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    B, S, H, D = args.b, args.s, args.h, args.d
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), dtype=jnp.bfloat16)

    fwd_flops = 4.0 * B * H * S * S * D  # QK^T + PV, 2 flops per MAC
    print(f"shape B={B} S={S} H={H} D={D}  fwd_flops={fwd_flops/1e12:.2f} TF")
    print(f"devices: {jax.devices()}")

    for bq, bk in [(256, 1024), (512, 1024), (512, 2048), (1024, 1024),
                   (1024, 2048), (512, 4096), (2048, 2048)]:
        try:
            f = jax.jit(lambda q, k, v, bq=bq, bk=bk: flash_attention(
                q, k, v, block_q=bq, block_k=bk))
            dt = bench(f, q, k, v, iters=args.iters)
            print(f"fwd  bq={bq:5d} bk={bk:5d}: {dt*1e3:8.2f} ms  "
                  f"{fwd_flops/dt/1e12:7.2f} TF/s")
        except Exception as e:  # noqa: BLE001
            print(f"fwd  bq={bq:5d} bk={bk:5d}: FAILED {type(e).__name__}: {e}")

    if args.grad:
        tot_flops = fwd_flops * (1 + 2.5)  # bwd ~ 2.5x fwd matmul work
        for bq, bk in [(512, 1024), (512, 2048), (1024, 1024)]:
            def loss(q, k, v, bq=bq, bk=bk):
                return jnp.sum(flash_attention(
                    q, k, v, block_q=bq, block_k=bk).astype(jnp.float32))
            g = jax.grad(loss, argnums=0)
            try:
                dt = bench(g, q, k, v, iters=max(args.iters // 2, 5))
                print(f"f+b  bq={bq:5d} bk={bk:5d}: {dt*1e3:8.2f} ms  "
                      f"{tot_flops/dt/1e12:7.2f} TF/s")
            except Exception as e:  # noqa: BLE001
                print(f"f+b  bq={bq:5d} bk={bk:5d}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

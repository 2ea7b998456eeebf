"""Flash-attention kernel microbenchmark at the SLAM hot shape.

The hot kernel (SURVEY.md §3.1): cross-view attention over a 16-frame chunk
at process_res=504 → S = 16·(504/14)² + extra tokens ≈ 20.8k, ViT-S heads
H=6, D=64, bf16.  Reports achieved TF/s (4·B·H·S²·D FLOPs) per
(block_q, block_k) configuration, plus the XLA reference for context.

Usage: python tools/bench_flash.py [--backward]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    # a host fetch forces true completion (block_until_ready alone can
    # return early through the remote-relay transport — see bench.py)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def bench(fn, *args, reps=5):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backward", action="store_true")
    ap.add_argument("--seq", type=int, default=20786)  # 16·36²+2 extra tokens/frame... realistic odd S
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()

    B, S, H, D = 1, args.seq, args.heads, args.dim
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)

    flops_fwd = 4.0 * B * H * S * S * D
    print(f"shape B={B} S={S} H={H} D={D} bf16; fwd FLOPs {flops_fwd/1e9:.1f} G")

    from da3slam_tpu.ops.flash_attention import flash_attention

    if args.backward:
        def loss(q, k, v, bq, bk):
            return flash_attention(q, k, v, block_q=bq, block_k=bk).astype(jnp.float32).sum()

        grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)), static_argnums=(3, 4))
        for bq, bk in [(256, 1024), (512, 1024), (512, 2048), (1024, 1024)]:
            try:
                dt = bench(lambda: grad(q, k, v, bq, bk))
            except Exception as e:
                print(f"bwd bq={bq} bk={bk}: FAIL {type(e).__name__}")
                continue
            # fwd recompute inside bwd ≈ 2.5× fwd flops for dq,dk,dv
            print(f"bwd bq={bq:5d} bk={bk:5d}: {dt*1e3:8.2f} ms  {flops_fwd*2.5/dt/1e12:6.1f} TF/s")
        return

    configs = [
        (256, 512), (256, 1024), (256, 2048),
        (512, 512), (512, 1024), (512, 2048), (512, 4096),
        (1024, 512), (1024, 1024), (1024, 2048),
        (2048, 1024),
    ]
    for bq, bk in configs:
        try:
            dt = bench(lambda: flash_attention(q, k, v, block_q=bq, block_k=bk))
        except Exception as e:
            print(f"fwd bq={bq:5d} bk={bk:5d}: FAIL {type(e).__name__}: {e}")
            continue
        print(f"fwd bq={bq:5d} bk={bk:5d}: {dt*1e3:8.2f} ms  {flops_fwd/dt/1e12:6.1f} TF/s")

    # XLA reference (materialises S×S — may OOM at full S; try anyway)
    def xla_attn(q, k, v):
        qf = q.astype(jnp.float32) / (D ** 0.5)
        s = jnp.einsum("bqhd,bkhd->bhqk", qf.astype(jnp.bfloat16), k)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    try:
        dt = bench(jax.jit(xla_attn), q, k, v, reps=3)
        print(f"xla reference      : {dt*1e3:8.2f} ms  {flops_fwd/dt/1e12:6.1f} TF/s")
    except Exception as e:
        print(f"xla reference      : FAIL {type(e).__name__}")


if __name__ == "__main__":
    main()

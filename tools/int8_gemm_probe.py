#!/usr/bin/env python
"""Probe: XLA int8 (W8A8) GEMM throughput vs bf16 at the LARGE-tier encoder
shapes.  The v5e MXU runs int8 at 2x bf16; unlike attention (where int8
dequant/requant adds [S, S]-sized VPU passes — measured negative,
tools/int8_flash_probe.py), a projection GEMM's rescale is one multiply
over the OUTPUT [tokens, features], negligible next to the matmul.

Shapes: LARGE 16-frame chunk, S = 16*(36^2+5) = 20816 tokens, D = 1024:
  qkv: [S, D] x [D, 3D];  mlp1: [S, D] x [D, 4D];  mlp2: [S, 4D] x [4D, D]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

S, D = 20816, 1024


def _force(x):
    float(np.asarray(x).ravel()[-1])


def time_fn(fn, *args, chain=32, reps=2):
    @jax.jit
    def chained(*a):
        def body(c, _):
            out = fn(c, *a[1:])
            # feed a slice of the output back so the chain is data-dependent
            return c * 0.999 + out[:, :D].astype(c.dtype) * 1e-6, None

        c, _ = jax.lax.scan(body, a[0], None, length=chain)
        return c

    out = chained(*args)
    _force(out[0, -1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chained(*args)
    _force(out[0, -1])
    return (time.perf_counter() - t0) / (chain * reps)


def main():
    rng = np.random.default_rng(0)
    x16 = jnp.asarray(rng.normal(size=(S, D)), jnp.bfloat16)
    w16 = jnp.asarray(rng.normal(size=(D, 4 * D)), jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 128, size=(S, D)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 128, size=(D, 4 * D)), jnp.int8)
    sw = jnp.asarray(rng.normal(size=(4 * D,)), jnp.float32)

    flops = 2.0 * S * D * 4 * D

    def bf16_gemm(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def int8_gemm(x, w, sw):
        acc = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * sw  # per-out-channel rescale

    def int8_dyn(x, w, sw):
        # dynamic per-token activation quant from a bf16 input (the real
        # serving path: quantize activations on the fly, weights pre-quantized)
        xa = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-30)
        x8 = jnp.round(x.astype(jnp.float32) / xa * 127.0).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x8, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * (sw * (1.0 / 127.0)) * xa

    dt = time_fn(bf16_gemm, x16, w16)
    print(f"bf16  gemm {dt * 1e3:7.3f} ms  {flops / dt / 1e12:6.1f} TF/s", flush=True)
    dt = time_fn(lambda c, w, s: int8_gemm((c * 64).astype(jnp.int8), w, s), x16, w8, sw)
    print(f"int8  gemm {dt * 1e3:7.3f} ms  {flops / dt / 1e12:6.1f} TF/s (pre-quant acts)", flush=True)
    dt = time_fn(int8_dyn, x16, w8, sw)
    print(f"int8  dyn  {dt * 1e3:7.3f} ms  {flops / dt / 1e12:6.1f} TF/s (dynamic act quant)", flush=True)


if __name__ == "__main__":
    main()

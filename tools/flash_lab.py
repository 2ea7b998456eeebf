"""Flash-attention kernel experiments (amortized, dispatch-overhead-free).

The tunneled dev link adds ~3-4 ms per dispatch, so every timing chains
N_INNER kernel calls inside one jit (lax.scan over q) and divides.

Variants:
  old    — round-1 kernel: per-block iota masking, row-sum on the VPU
  new    — current ops/flash_attention.py behavior: last-block-only cond
           mask + denominator fused into the PV matmul (ones-column in V)
  new2   — `new` with nh heads per invocation: independent per-head chains
           let Mosaic overlap one head's VPU softmax with the other's MXU
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634
N_INNER = 10


def _kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
            scale2, variant, block_k, seq_k, head_dim):
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    nh = q_ref.shape[0]
    fused = variant != "old"  # "qs" implies fused
    Dp = acc_scr.shape[-1]
    for h in range(nh):
        q = q_ref[h]
        k = k_ref[h]
        if variant == "qs":  # scale pre-folded into q on the host
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale2

        if variant == "old":
            col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < seq_k, s, NEG_INF)
        elif seq_k % block_k != 0:
            def _masked(s):
                col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                return jnp.where(col < seq_k, s, NEG_INF)
            s = jax.lax.cond(ki == n_k - 1, _masked, lambda s: s, s)

        m_prev = m_scr[h, :, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)

        if fused:
            lane = jax.lax.broadcasted_iota(jnp.int32, (k.shape[0], Dp), 1)
            v_ones = jnp.pad(v_ref[h], ((0, 0), (0, Dp - head_dim))) + (
                lane == head_dim
            ).astype(v_ref.dtype)
            acc_scr[h] = acc_scr[h] * alpha + jax.lax.dot_general(
                p.astype(v_ones.dtype), v_ones,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            l_new = l_scr[h, :, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            l_scr[h] = jnp.broadcast_to(l_new, l_scr.shape[1:])
            acc_scr[h] = acc_scr[h] * alpha + jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m_scr[h] = jnp.broadcast_to(m_new, m_scr.shape[1:])

    @pl.when(ki == n_k - 1)
    def _fin():
        for h in range(nh):
            if fused:
                l_fin = jnp.maximum(acc_scr[h, :, head_dim:head_dim + 1], 1e-30)
                o_ref[h] = (acc_scr[h, :, :head_dim] / l_fin).astype(o_ref.dtype)
            else:
                l_fin = jnp.maximum(l_scr[h, :, :1], 1e-30)
                o_ref[h] = (acc_scr[h] / l_fin).astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


def make_fn(BH, S, D, variant, bq, bk, nh):
    scale2 = LOG2E / (D ** 0.5)
    Sp = _round_up(S, max(bq, bk))
    grid = (BH // nh, Sp // bq, Sp // bk)
    Dp = _round_up(D + 1, 128) if variant != "old" else D

    call = pl.pallas_call(
        functools.partial(_kernel, scale2=scale2, variant=variant,
                          block_k=bk, seq_k=S, head_dim=D),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nh, bq, D), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((nh, bk, D), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((nh, bk, D), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((nh, bq, D), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Sp, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        scratch_shapes=[
            pltpu.VMEM((nh, bq, 128), jnp.float32),
            pltpu.VMEM((nh, bq, 128), jnp.float32),
            pltpu.VMEM((nh, bq, Dp), jnp.float32),
        ],
    )

    @jax.jit
    def chained(q, k, v):
        if variant == "qs":
            q = (q.astype(jnp.float32) * scale2).astype(q.dtype)
        def body(q, _):
            return call(q, k, v), None
        o, _ = jax.lax.scan(body, q, None, length=N_INNER)
        return o

    return chained, Sp


def _force(o):
    np.asarray(jax.device_get(o.ravel()[0]))


def main():
    BH, D = 6, 64
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
    key = jax.random.PRNGKey(0)
    flops = 4.0 * BH * S * S * D
    print(f"BH={BH} S={S} D={D}; {flops/1e9:.0f} GFLOP x{N_INNER} chained")

    cases = [
        ("old", 512, 1024, 1),
        ("old", 1024, 1024, 1),
        ("new", 512, 1024, 1),
        ("new", 1024, 1024, 1),
        ("new", 512, 2048, 1),
        ("new", 1024, 2048, 1),
        ("new", 1024, 4096, 1),
        ("new", 2048, 2048, 1),
        ("new", 2048, 1024, 1),
        ("qs", 1024, 2048, 1),
        ("qs", 1024, 4096, 1),
        ("qs", 2048, 2048, 1),
    ]
    for variant, bq, bk, nh in cases:
        try:
            fn, Sp = make_fn(BH, S, D, variant, bq, bk, nh)
            kq, kk, kv = jax.random.split(key, 3)
            q = jax.random.normal(kq, (BH, Sp, D), jnp.bfloat16)
            k = jax.random.normal(kk, (BH, Sp, D), jnp.bfloat16)
            v = jax.random.normal(kv, (BH, Sp, D), jnp.bfloat16)
            _force(fn(q, k, v))
            t0 = time.perf_counter()
            for _ in range(3):
                o = fn(q, k, v)
            _force(o)
            dt = (time.perf_counter() - t0) / 3 / N_INNER
            print(f"{variant:5s} nh={nh} bq={bq:4d} bk={bk:4d}: {dt*1e3:7.2f} ms {flops/dt/1e12:6.1f} TF/s")
        except Exception as e:
            print(f"{variant:5s} nh={nh} bq={bq:4d} bk={bk:4d}: FAIL {type(e).__name__}: {str(e)[:110]}")


if __name__ == "__main__":
    main()

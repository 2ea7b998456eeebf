#!/usr/bin/env python
"""Measure the perf ceiling of a max-free flash forward.

The production kernel's VPU tax per k block: [bq,bk] max reduce, sub, exp2,
astype, plus the accumulator rescale.  If the running max is replaced by a
per-row CONSTANT (sound when derived from |q|·max|k| — the norm-bound
softmax trick), the max reduce and the rescale disappear.  This probe times
that variant with a literal constant to see the ceiling before building the
correctness plumbing.  Output values are wrong (constant m), timing is
representative.
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634
CHAIN = 64


def _kernel(q_ref, k_ref, v_ref, o_ref, acc_scr, *, head_dim):
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    Dp = acc_scr.shape[-1]
    sub = k.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (sub, Dp), 1)
    v_pad = jnp.pad(v_ref[0], ((0, 0), (0, Dp - head_dim)))
    v_ones = v_pad + (lane == head_dim).astype(v_pad.dtype)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = jnp.exp2(s - 15.0)  # constant stand-in for the per-row norm bound
    acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
        p.astype(v_ones.dtype), v_ones,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == n_k - 1)
    def _fin():
        l_fin = jnp.maximum(acc_scr[:, head_dim:head_dim + 1], 1e-30)
        o_ref[0] = (acc_scr[:, :head_dim] / l_fin).astype(o_ref.dtype)


def run(S, H, D, bq, bk):
    BH = H
    Sq = -(-S // bq) * bq
    Sk = -(-S // bk) * bk
    rng = np.random.default_rng(0)
    qf = jnp.asarray(rng.normal(size=(BH, Sq, D)) * 0.18, jnp.bfloat16)
    kf = jnp.asarray(rng.normal(size=(BH, Sk, D)), jnp.bfloat16)
    vf = jnp.asarray(rng.normal(size=(BH, Sk, D)), jnp.bfloat16)
    Dp = 128

    call = pl.pallas_call(
        functools.partial(_kernel, head_dim=D),
        grid=(BH, Sq // bq, Sk // bk),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bk, D), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bk, D), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Sq, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        scratch_shapes=[pltpu.VMEM((bq, Dp), jnp.float32)],
    )

    @jax.jit
    def chained(q, k, v):
        def body(o, _):
            return call(o, k, v), None

        o, _ = jax.lax.scan(body, q, None, length=CHAIN)
        return o

    out = chained(qf, kf, vf)
    float(np.asarray(out[0, 0, -1]))
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        out = chained(qf, kf, vf)
        float(np.asarray(out[0, 0, -1]))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    flops = 4.0 * H * S * S * D
    tf = flops / best / 1e12
    print(f"nomax bq={bq} bk={bk}: {best * 1e3:.3f} ms  {tf:.1f} TF/s "
          f"({tf / 98.5:.3f} SoL)", flush=True)


if __name__ == "__main__":
    S, H, D = 16 * (36 * 36 + 5), 6, 64
    for bq, bk in [(1024, 2048), (1024, 3584), (1024, 5376)]:
        run(S, H, D, bq, bk)

#!/usr/bin/env python
"""Bisect the production bound-mode kernel's gap vs the nomax ceiling probe.

The constant-m probe (flash_nomax_probe.py) hit 82 TF/s; the production
bound kernel (m_ref input + lax.cond padding mask + host-side norms in the
chain body) measures 40.  Variants isolate which addition pays:

  A  production-shape kernel, constant m, no cond       (= probe + lse out)
  B  + m_ref [bq, 8] input                              (norm plumbing)
  C  + lax.cond last-block padding mask                 (the full kernel)
  D  C with the cond replaced by an unconditional mask  (cond-cost check)

Usage: python tools/flash_bound_bisect.py A B   (≤3 variants per process —
see the verify skill's TPU sweep discipline).  Timing only; values wrong
for constant-m variants.
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

CHAIN = 64


def _kernel(q_ref, k_ref, v_ref, *rest, head_dim, seq_k, use_m_ref, mask):
    if use_m_ref:
        m_ref, o_ref, lse_ref, acc_scr = rest
    else:
        o_ref, lse_ref, acc_scr = rest
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
    m = m_ref[0][:, :1] if use_m_ref else 15.0
    p = jnp.exp2(s - m)
    n_pad = n_k * sub - seq_k
    if mask == "cond" and n_pad > 0:
        def _mask(p):
            col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
            return jnp.where(col < sub - n_pad, p, 0.0)

        p = jax.lax.cond(ki == n_k - 1, _mask, lambda x: x, p)
    elif mask == "always" and n_pad > 0:
        col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        p = jnp.where((col < sub - n_pad) | (ki < n_k - 1), p, 0.0)
    acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
        p.astype(v_ones.dtype), v_ones,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == n_k - 1)
    def _fin():
        l_raw = acc_scr[:, head_dim:head_dim + 1]
        if mask == "subtract" and n_pad > 0:
            # padded K rows are exactly zero -> s = 0 -> each contributes
            # exactly exp2(-m) to the denominator and 0 to p.V; remove
            # the bias analytically instead of masking p per block
            l_raw = l_raw - n_pad * jnp.exp2(-m)
        l_fin = jnp.maximum(l_raw, 1e-30)
        o_ref[0] = (acc_scr[:, :head_dim] / l_fin).astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(
            (m if use_m_ref else jnp.full((q.shape[0], 1), m)) + jnp.log2(l_fin),
            lse_ref.shape[1:],
        )


def run(tag, use_m_ref, mask, bq=1024, bk=3584):
    S, H, D = 16 * (36 * 36 + 5), 6, 64
    BH = H
    Sq = -(-S // bq) * bq
    Sk = -(-S // bk) * bk
    rng = np.random.default_rng(0)
    qf = jnp.asarray(rng.normal(size=(BH, Sq, D)) * 0.18, jnp.bfloat16)
    kf = jnp.asarray(rng.normal(size=(BH, Sk, D)), jnp.bfloat16)
    vf = jnp.asarray(rng.normal(size=(BH, Sk, D)), jnp.bfloat16)
    Dp = 128
    qspec = pl.BlockSpec((1, bq, D), lambda b, qi, ki: (b, qi, 0))
    kspec = pl.BlockSpec((1, bk, D), lambda b, qi, ki: (b, ki, 0))
    rowq = pl.BlockSpec((1, bq, 8), lambda b, qi, ki: (b, qi, 0))
    in_specs = [qspec, kspec, kspec] + ([rowq] if use_m_ref else [])
    call = pl.pallas_call(
        functools.partial(_kernel, head_dim=D, seq_k=S,
                          use_m_ref=use_m_ref, mask=mask),
        grid=(BH, Sq // bq, Sk // bk),
        in_specs=in_specs,
        out_specs=(qspec, rowq),
        out_shape=(
            jax.ShapeDtypeStruct((BH, Sq, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((BH, Sq, 8), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        scratch_shapes=[pltpu.VMEM((bq, Dp), jnp.float32)],
    )

    m8 = jnp.ones((BH, Sq, 8), jnp.float32) * 15.0

    @jax.jit
    def chained(q, k, v):
        def body(o, _):
            args = (o, k, v) + ((m8,) if use_m_ref else ())
            out, _ = call(*args)
            return out, None

        o, _ = jax.lax.scan(body, q, None, length=CHAIN)
        return o

    out = chained(qf, kf, vf)
    float(np.asarray(out[0, 0, -1]))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = chained(qf, kf, vf)
        float(np.asarray(out[0, 0, -1]))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    flops = 4.0 * H * S * S * D
    tf = flops / best / 1e12
    print(f"{tag} m_ref={use_m_ref} mask={mask}: {best * 1e3:.3f} ms  "
          f"{tf:.1f} TF/s ({tf / 98.3:.3f} SoL)", flush=True)


VARIANTS = {
    "A": dict(use_m_ref=False, mask="none"),
    "B": dict(use_m_ref=True, mask="none"),
    "C": dict(use_m_ref=True, mask="cond"),
    "D": dict(use_m_ref=True, mask="always"),
    "E": dict(use_m_ref=True, mask="subtract"),
}

if __name__ == "__main__":
    for tag in sys.argv[1:]:
        run(tag, **VARIANTS[tag])

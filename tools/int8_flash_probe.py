#!/usr/bin/env python
"""Probe: SageAttention-style int8 flash-attention forward on the v5e MXU.

Hypothesis (round 3): the bf16 flash forward is MXU-bound at 0.82 of the
D=64 speed-of-light (81 TF/s); the MXU runs int8 at 2x bf16 throughput
(394 vs 197 TOPS on v5e), so quantizing BOTH matmuls should land well above
the bf16 SoL:

  QK^T: q int8 (per-row scales) x k int8 (per-k-block scales) -> int32.
        Dequant is one fused [bq,1]-broadcast multiply (sq_i * sk_blk).
  PV:   p = exp2(s - m) in (0,1] under the RUNNING-MAX recurrence, so a
        fixed 127 scale quantizes p to int8 with <=1/254 row-relative
        error; v int8 with PER-CHANNEL scales (commutes through the k-sum,
        unlike per-row), int32 matmul, converted+scaled into the f32
        accumulator each step (the alpha rescale stays f32).

  The running max is REQUIRED here: the max-free bound shift can leave
  every p below 1/254 for diffuse rows (bound loose by >7 bits), which
  int8 truncates to zero — bf16's exponent range tolerates that, int8
  does not.

Measures (one process, <=3 kernel configs, sweep discipline):
  1. bf16 stable forward (the 67 TF/s reference point)
  2. bf16 bound forward (the 81 TF/s current default)
  3. int8 stable forward (the candidate)
plus a f32-reference max-abs-error for each at the SLAM hot shape.
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
NEG_INF = -1e30


def _round_up(x, m):
    return (x + m - 1) // m * m


def _int8_kernel(
    q_ref, k_ref, v_ref, sq_ref, sk_ref, o_ref,
    m_scr, acc_scr,
    *, head_dim: int,
):
    """Stable (running-max) forward, both matmuls int8.

    q_ref [1, bq, D] int8, k_ref [1, bk, D] int8, v_ref [1, bk, Dp] int8
    (v pre-padded with the 127-valued denominator column at head_dim),
    sq_ref [1, bq, 8] f32 (per-row q scale, base-2 logit scale folded in),
    sk_ref [1, 1, 8] f32 (this k-block's scale).
    """
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s_i32 = jax.lax.dot_general(
        q_ref[0], k_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [bq, bk]
    # dequant: one broadcast multiply (row scale x this block's k scale)
    s = s_i32.astype(jnp.float32) * (sq_ref[0][:, :1] * sk_ref[0][0, 0])

    m_prev = m_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    # p in (0, 1]; fixed 127 scale -> int8.  Round-to-nearest (+0.5 before
    # the truncating astype) matters: floor truncation biases every p down
    # by U(0,1)/127, which the diffuse-row denominator amplifies 4x
    # (measured max-abs 0.089 -> 0.020 on random normal inputs)
    p8 = (jnp.exp2(s - m_new) * 127.0 + 0.5).astype(jnp.int8)

    pv = jax.lax.dot_general(
        p8, v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [bq, Dp] int32
    acc_scr[:] = acc_scr[:] * alpha + pv.astype(jnp.float32)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(ki == n_k - 1)
    def _finalize():
        # denominator column j: sum_j p8_ij * 127 (v's ones-column is 127
        # with channel scale 1/127) -> both 1/127 p-scales cancel in the
        # ratio; the per-channel v scales are applied OUTSIDE the kernel.
        l_fin = jnp.maximum(acc_scr[:, head_dim:head_dim + 1], 1e-30)
        o_ref[0] = (acc_scr[:, :head_dim] / l_fin).astype(o_ref.dtype)


INTERPRET = False  # set by --interpret for CPU math validation


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def int8_flash(q, k, v, block_q=1024, block_k=3584):
    """[B, S, H, D] bf16/f32 in, bf16 out. Forward only (probe)."""
    B, S, H, D = q.shape
    scale2 = LOG2E / (D**0.5)
    bq = min(block_q, _round_up(S, 128))
    bk = min(block_k, _round_up(S, 128))
    Sq = _round_up(S, bq)
    Sk = _round_up(S, bk)
    Dp = _round_up(D + 1, 128)

    def fold(x, St):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, S, x.shape[-1])
        return jnp.pad(x, ((0, 0), (0, St - S), (0, 0)))

    qf = fold(q.astype(jnp.float32), Sq)
    kf = fold(k.astype(jnp.float32), Sk)
    vf = fold(v.astype(jnp.float32), Sk)

    # per-row q quant; base-2 logit scale folds into the row scales
    qa = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)  # [BH, Sq, 1]
    q8 = jnp.clip(jnp.round(qf / jnp.maximum(qa, 1e-30) * 127.0), -127, 127)
    sq = (qa[..., 0] / 127.0) * scale2  # [BH, Sq]

    # per-block k quant (block max of row maxes; padded rows are 0)
    ka = jnp.max(jnp.abs(kf), axis=-1)  # [BH, Sk]
    kb = jnp.max(ka.reshape(B * H, Sk // bk, bk), axis=-1)  # [BH, nk]
    kb = jnp.maximum(kb, 1e-30)
    k8 = jnp.clip(
        jnp.round(kf / (jnp.repeat(kb, bk, axis=-1)[..., None]) * 127.0),
        -127, 127,
    )
    sk = kb / 127.0  # [BH, nk]

    # per-channel v quant + 127-valued denominator column (channel scale
    # 1/127 cancels against p's 1/127 in the output ratio; real channels
    # need sv_d * 127 applied after the kernel — folded below)
    va = jnp.maximum(jnp.max(jnp.abs(vf), axis=(0, 1)), 1e-30)  # [D]
    v8 = jnp.clip(jnp.round(vf / va * 127.0), -127, 127)
    v8 = jnp.pad(v8, ((0, 0), (0, 0), (0, Dp - D)))
    lane = jax.lax.broadcasted_iota(jnp.int32, v8.shape, 2)
    # padded k rows must not contribute to the denominator: zero them
    row = jax.lax.broadcasted_iota(jnp.int32, v8.shape, 1)
    v8 = jnp.where((lane == D) & (row < S), 127.0, v8)

    grid = (B * H, Sq // bq, Sk // bk)
    out = pl.pallas_call(
        functools.partial(_int8_kernel, head_dim=D),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bk, D), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bk, Dp), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bq, 8), lambda b, qi, ki: (b, qi, 0)),
            # per-k-block scalar, replicated to an (8, 8) tile: Pallas TPU
            # block shapes need the last two dims (8, 128)-aligned or
            # array-equal, so a [BH, nk, 8] layout with (1, 1, 8) blocks
            # fails once nk > 1
            pl.BlockSpec((1, 8, 8), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Sq, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=INTERPRET,
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, Dp), jnp.float32),
        ],
    )(
        q8.astype(jnp.int8), k8.astype(jnp.int8), v8.astype(jnp.int8),
        jnp.tile(sq[..., None], (1, 1, 8)),
        jnp.tile(sk[..., None, None], (1, 1, 8, 8)).reshape(B * H, -1, 8),
    )
    # undo the per-channel v scales (p/denominator scales cancelled in-kernel)
    o = out[:, :S, :].astype(jnp.float32) * va[None, None, :]
    return jnp.swapaxes(o.reshape(B, H, S, D), 1, 2).astype(jnp.bfloat16)


def _force(x):
    float(np.asarray(x).ravel()[-1])


def time_chain(fn, q, k, v, chain=64, reps=2):
    @jax.jit
    def chained(q, k, v):
        def body(o, _):
            return fn(o.astype(q.dtype), k, v), None
        o, _ = jax.lax.scan(body, q, None, length=chain)
        return o

    out = chained(q, k, v)
    _force(out[0, 0, -1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chained(q, k, v)
    _force(out[0, 0, -1])
    return (time.perf_counter() - t0) / (chain * reps)


def main():
    global INTERPRET
    if "--interpret" in sys.argv:
        # CPU math validation: interpret-mode kernel vs f32 reference
        INTERPRET = True
        jax.config.update("jax_platforms", "cpu")
        S, H, D = 1500, 2, 64  # unaligned S exercises the padding paths
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(1, S, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, S, H, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, S, H, D)), jnp.float32)
        ref = jax.nn.dot_product_attention(q, k, v)
        out = np.asarray(int8_flash(q, k, v, block_q=512, block_k=512),
                         np.float32)
        err = np.max(np.abs(out - np.asarray(ref)))
        rel = err / np.max(np.abs(np.asarray(ref)))
        print(f"interpret acc: max-abs {err:.4e}  rel {rel:.4e}", flush=True)
        # random normal q/k is the WORST case for int8 p (maximally diffuse
        # softmax: every p tiny, 1/254 quantization felt everywhere);
        # trained/layernormed attention is far peakier
        assert rel < 0.08, "int8 attention error above 8% of output range"
        print("interpret mode OK", flush=True)
        return

    from da3slam_tpu.ops.flash_attention import flash_attention

    S, H, D = 16 * (36 * 36 + 5), 6, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, S, H, D)), jnp.bfloat16)
    flops = 4.0 * H * S * S * D

    # accuracy vs f32 reference on a small slice first (cheap compile)
    Ss = 2048
    qs, ks, vs = (x[:, :Ss] for x in (q, k, v))
    ref = jax.nn.dot_product_attention(
        qs.astype(jnp.float32), ks.astype(jnp.float32), vs.astype(jnp.float32)
    )
    for name, fn in [
        ("int8", lambda a, b, c: int8_flash(a, b, c)),
        ("bound", lambda a, b, c: flash_attention(a, b, c, stable=False)),
    ]:
        out = np.asarray(fn(qs, ks, vs), np.float32)
        err = np.max(np.abs(out - np.asarray(ref)))
        rel = err / np.max(np.abs(np.asarray(ref)))
        print(f"acc {name:6s} max-abs {err:.4e}  rel {rel:.4e}", flush=True)

    for name, fn in [
        ("int8", lambda a, b, c: int8_flash(a, b, c)),
        ("bound", lambda a, b, c: flash_attention(a, b, c, stable=False)),
    ]:
        dt = time_chain(fn, q, k, v)
        print(f"time {name:6s} {dt * 1e3:7.3f} ms  {flops / dt / 1e12:6.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()

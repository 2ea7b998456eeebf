"""Flash attention as a Pallas TPU kernel.

The cross-view attention over a 16-frame chunk is the framework's dominant
FLOP consumer (SURVEY.md §3.1: the hot kernel is O((N·H/14·W/14)²) attention
inside ``model.inference``).  This kernel streams K/V blocks through VMEM
with the online-softmax recurrence so the [S, S] score matrix never
materialises in HBM:

  grid = (batch·heads, q_blocks, k_blocks)   — k is the innermost
  (sequential on TPU) axis; running max / denominator / output accumulate in
  VMEM scratch across the k iterations and the output block is written once
  on the last k step (the double-buffered pipelining of q/k/v blocks is
  handled by the Pallas grid machinery).

Inference-path kernel: no custom VJP — the training step uses the XLA
attention path (``attn_impl="xla"``), which XLA differentiates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, block_k: int, seq_k: int,
):
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [bq, D]
    k = k_ref[0]  # [bk, D]
    # log2(e) is folded into `scale` by the caller: softmax runs in base-2
    # (exp lowers to exp2+mul on the VPU; base-2 skips the mul on every
    # score element)
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [bq, bk]

    # mask padded key columns (sequence padded up to a block multiple)
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < seq_k, s, NEG_INF)

    m_prev = m_scr[:, :1]  # [bq, 1]
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
    m_new = jnp.maximum(m_prev, m_cur)

    alpha = jnp.exp2(m_prev - m_new)  # rescale of old accumulator
    p = jnp.exp2(s - m_new)  # [bq, bk]
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == n_k - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 512,
    block_k: int = 2048,
) -> jax.Array:
    """Softmax(QKᵀ/√d)·V for ``[B, S, H, D]`` inputs (full attention).

    Shapes are padded internally to block multiples; padded key columns are
    masked, padded query rows are sliced off.
    """
    B, S, H, D = q.shape
    scale = 1.4426950408889634 / (D**0.5)  # log2(e)/sqrt(D): base-2 softmax

    bq = min(block_q, _round_up(S, 128))
    bk = min(block_k, _round_up(S, 128))
    Sq = _round_up(S, bq)
    Sk = _round_up(S, bk)

    def fold(x, St):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, S, D)
        if St != S:
            x = jnp.pad(x, ((0, 0), (0, St - S), (0, 0)))
        return x

    qf = fold(q, Sq)
    kf = fold(k, Sk)
    vf = fold(v, Sk)

    grid = (B * H, Sq // bq, Sk // bk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=bk, seq_k=S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bk, D), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bk, D), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Sq, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),  # running max (lane-replicated)
            pltpu.VMEM((bq, 128), jnp.float32),  # running denom
            pltpu.VMEM((bq, D), jnp.float32),  # output accumulator
        ],
    )(qf, kf, vf)

    out = out[:, :S, :].reshape(B, H, S, D)
    return jnp.swapaxes(out, 1, 2)

"""Flash attention as Pallas TPU kernels (forward + custom VJP).

The cross-view attention over a 16-frame chunk is the framework's dominant
FLOP consumer (SURVEY.md §3.1: the hot kernel is O((N·H/14·W/14)²) attention
inside ``model.inference``).  These kernels stream K/V blocks through VMEM
with the online-softmax recurrence so the [S, S] score matrix never
materialises in HBM:

  forward: grid = (batch·heads, q_blocks, k_blocks) — k innermost
  (sequential on TPU); running max / denominator / output accumulate in VMEM
  scratch and the output block + its log-sum-exp are written on the last k
  step.

  backward (flash-attention-2 style): the forward's log-sum-exp lets every
  probability be recomputed exactly per block — a dq kernel accumulating
  over k blocks and a dk/dv kernel accumulating over q blocks; the softmax
  Jacobian needs only the per-row ``D = rowsum(dO ∘ O)``.

Softmax runs in base 2 (log2(e) folded into the scale): exp lowers to
exp2+mul on the VPU, so base-2 skips a multiply per score element.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref,
    m_scr, acc_scr,
    *, head_dim: int, k_splits: int = 1,
):
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [bq, Dk] — pre-scaled by log2(e)/√D on the host, so the
    # matmul output is the base-2 logits directly (saves a [bq, bk] VPU mult).
    # When the sequence is not a block multiple, Dk = 128 > head_dim and the
    # extra columns carry the padding mask as a matmul bias: q has a
    # ones-column at head_dim, K has 0 there for valid keys and NEG_INF for
    # padded keys — the MXU contraction of 64 already costs a full 128-deep
    # pass, so the mask rides the systolic array for free (no VPU masking,
    # no per-block iota, no pipeline-breaking conditional).
    Dp = acc_scr.shape[-1]
    bk_rows = k_ref.shape[1]
    sub = bk_rows // k_splits

    # ``k_splits`` > 1 unrolls the online-softmax recurrence over sub-blocks
    # of the fetched K/V block.  The math is identical to running the k loop
    # at block size bk/k_splits; the point is scheduling: each sub-block's
    # QKᵀ has no data dependency on the previous sub-block's softmax, so
    # Mosaic can hide the VPU passes (max / exp2 / astype — the ~25% tax
    # this kernel pays at k_splits=1) behind the other sub-block's matmuls,
    # while keeping the per-grid-step constant costs of the LARGE block.
    for j in range(k_splits):
        k = k_ref[0, j * sub:(j + 1) * sub]  # [sub, Dk] (static slice)
        # [sub, Dp]: V columns 0..D-1, a ones-column at D, zeros beyond —
        # built on the VPU per block (cheap) instead of host-padding V,
        # which would double its HBM streaming traffic
        lane = jax.lax.broadcasted_iota(jnp.int32, (sub, Dp), 1)
        v_pad = jnp.pad(v_ref[0, j * sub:(j + 1) * sub],
                        ((0, 0), (0, Dp - head_dim)))
        v_ones = v_pad + (lane == head_dim).astype(v_pad.dtype)
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, sub] base-2 logits (mask included via the bias column)

        m_prev = m_scr[:, :1]  # [bq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)

        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)

        # V is padded to 128 lanes with a ones-column at `head_dim`: the
        # single MXU pass yields [p·V | rowsum(p)] — the softmax denominator
        # rides the otherwise-wasted lanes (D=64 < 128) instead of a
        # separate VPU reduce.  The denominator column obeys the same
        # rescale recurrence as the output.
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v_ones.dtype), v_ones,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(ki == n_k - 1)
    def _finalize():
        l_fin = jnp.maximum(acc_scr[:, head_dim:head_dim + 1], 1e-30)
        o_ref[0] = (acc_scr[:, :head_dim] / l_fin).astype(o_ref.dtype)
        # base-2 log-sum-exp per row: softmax_ij = exp2(s2_ij - lse2_i)
        # (stored lane-padded [bq, 8]: TPU block shapes need aligned minor dims)
        lse_ref[0] = jnp.broadcast_to(m_scr[:, :1] + jnp.log2(l_fin), lse_ref.shape[1:])


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fold(x, S, St, B, H, D, scale=None):
    if scale is not None:
        # pre-scale in f32 then round once — XLA fuses this into the
        # transpose/pad copy below, so it costs no extra HBM pass
        x = (x.astype(jnp.float32) * scale).astype(x.dtype)
    x = jnp.swapaxes(x, 1, 2).reshape(B * H, S, D)
    if St != S:
        x = jnp.pad(x, ((0, 0), (0, St - S), (0, 0)))
    return x


def _flash_forward(q, k, v, block_q, block_k, k_splits=1):
    B, S, H, D = q.shape
    scale2 = LOG2E / (D**0.5)
    bq = min(block_q, _round_up(S, 128))
    bk = min(block_k, _round_up(S, 128))
    while bk % (k_splits * 128) != 0:  # sub-blocks must stay lane-aligned
        k_splits //= 2
    k_splits = max(k_splits, 1)
    Sq = _round_up(S, bq)
    Sk = _round_up(S, bk)

    qf = _fold(q, S, Sq, B, H, D, scale=scale2)  # base-2 logit scale in q
    kf = _fold(k, S, Sk, B, H, D)
    vf = _fold(v, S, Sk, B, H, D)

    if Sk != S:
        # padding mask as a matmul bias column (see _fwd_kernel comment).
        # The bias-column trick is free only while D < 128 (the contraction
        # is 128-deep either way); at D = 128 it would double the QK/PV
        # matmul depth for one bias lane — all DA3 presets use D = 64, so
        # guard loudly rather than silently paying 2x.
        assert D < 128, (
            f"flash_attention: head_dim={D} >= 128 with an unaligned sequence "
            f"(S={S}) would double the matmul width for the padding-bias "
            "column; pad S to a block multiple or add an iota-mask path"
        )
        Dk = _round_up(D + 1, 128)
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, Dk - D)))
        qf = qf.at[:, :, D].set(1.0)
        kf = jnp.pad(kf, ((0, 0), (0, 0), (0, Dk - D)))
        kbias = jnp.where(jnp.arange(Sk) >= S, jnp.bfloat16(NEG_INF), 0.0)
        kf = kf.at[:, :, D].set(kbias[None].astype(kf.dtype))
    else:
        Dk = D

    grid = (B * H, Sq // bq, Sk // bk)
    Dp = _round_up(D + 1, 128)  # accumulator lanes: [p·V | rowsum(p) | 0…]
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, head_dim=D, k_splits=k_splits),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, Dk), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bk, Dk), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bk, D), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, D), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bq, 8), lambda b, qi, ki: (b, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Sq, 8), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            # default scoped-vmem cap is 16 MiB; the [bq, bk] f32 score
            # panels at the tuned block sizes need more (v5e has 128 MiB)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),  # running max (lane-replicated)
            pltpu.VMEM((bq, Dp), jnp.float32),  # output ∥ denominator accumulator
        ],
    )(qf, kf, vf)

    o = jnp.swapaxes(out[:, :S, :].reshape(B, H, S, D), 1, 2)
    # residuals hold the primal `o` (aliases the returned value) rather than
    # the folded copy, so no duplicate output-sized buffer lives to backward
    return o, (qf, kf, vf, o, lse)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(
    q_ref, k_ref, do_ref, v_ref, lse_ref, dvec_ref, dq_ref,
    dq_scr,
    *, scale: float,
):
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]  # pre-scaled by log2(e)/√D (forward residual)
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # no explicit padding mask: padded key columns carry NEG_INF in the bias
    # lane, so s = -1e30 there and p = exp2(s - lse) underflows to exactly 0
    # — and the valid lanes (0..D-1) of padded K rows are zero, so even the
    # k-side of dz·k is zero.  Both invariants depend on the hard NEG_INF
    # constant; a softer mask value would leave p > 0 here and break dq.
    p = jnp.exp2(s - lse_ref[0][:, :1])  # softmax

    dov = jax.lax.dot_general(  # dO · Vᵀ : [bq, bk]
        do_ref[0], v_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dz = p * (dov - dvec_ref[0][:, :1])  # softmax Jacobian (natural log)
    dq_scr[:] += jax.lax.dot_general(
        dz.astype(k.dtype), k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(ki == n_k - 1)
    def _fin():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, do_ref, v_ref, lse_ref, dvec_ref, dk_ref, dv_ref,
    dk_scr, dv_scr,
):
    qi = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]  # [bq, D] — pre-scaled by log2(e)/√D (forward residual)
    k = k_ref[0]  # [bk, D]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, bk] base-2 logits
    # no padding mask needed: padded q rows carry dO = 0 and D = 0 (zero
    # contribution), and the dk/dv rows of padded k positions are sliced
    # off after the kernel — p's value there never reaches a kept output
    p = jnp.exp2(s - lse_ref[0][:, :1])

    do = do_ref[0]  # [bq, D]
    dv_scr[:] += jax.lax.dot_general(  # pᵀ · dO : [bk, D]
        p.astype(do.dtype), do,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dov = jax.lax.dot_general(
        do, v_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dz = p * (dov - dvec_ref[0][:, :1])
    # dk = dzᵀ·q_orig·(1/√D); with q pre-scaled by log2(e)/√D the factor
    # becomes (1/√D)/(log2(e)/√D) = ln 2
    dk_scr[:] += jax.lax.dot_general(  # dzᵀ · q : [bk, D]
        dz.astype(q.dtype), q,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * LN2

    @pl.when(qi == n_q - 1)
    def _fin():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward(block_q, block_k, res, g):
    qf, kf, vf, o, lse = res
    BH, Sq, Dk = qf.shape  # Dk ≥ D when the forward added the bias column
    Sk = kf.shape[1]
    # infer original (B, S, H, D) from the cotangent
    B, S, H, D = g.shape
    scale = 1.0 / (D**0.5)
    bq = min(block_q, Sq)
    bk = min(block_k, Sk)

    dof = _fold(g.astype(qf.dtype), S, Sq, B, H, D)
    of = _fold(o, S, Sq, B, H, D)
    # D_i = rowsum(dO ∘ O): tiny elementwise pass outside the kernels
    # (lane-padded to [BH, Sq, 8] like lse, for TPU block alignment)
    dvec = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32), axis=-1)
    dvec = jnp.tile(dvec[..., None], (1, 1, 8))

    # q/k (and dq/dk) carry Dk lanes; dO/V/dV carry the true head dim
    qkspec = pl.BlockSpec((1, bq, Dk), lambda b, qi, ki: (b, qi, 0))
    kspec = pl.BlockSpec((1, bk, Dk), lambda b, qi, ki: (b, ki, 0))
    dspec = pl.BlockSpec((1, bq, D), lambda b, qi, ki: (b, qi, 0))
    vspec = pl.BlockSpec((1, bk, D), lambda b, qi, ki: (b, ki, 0))
    rowq = pl.BlockSpec((1, bq, 8), lambda b, qi, ki: (b, qi, 0))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        grid=(BH, Sq // bq, Sk // bk),
        in_specs=[qkspec, kspec, dspec, vspec, rowq, rowq],
        out_specs=qkspec,
        out_shape=jax.ShapeDtypeStruct((BH, Sq, Dk), qf.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        scratch_shapes=[pltpu.VMEM((bq, Dk), jnp.float32)],
    )(qf, kf, dof, vf, lse, dvec)

    # dk/dv: swap the roles — grid iterates k blocks, accumulates over q
    qspec2 = pl.BlockSpec((1, bq, Dk), lambda b, ki, qi: (b, qi, 0))
    kspec2 = pl.BlockSpec((1, bk, Dk), lambda b, ki, qi: (b, ki, 0))
    dspec2 = pl.BlockSpec((1, bq, D), lambda b, ki, qi: (b, qi, 0))
    vspec2 = pl.BlockSpec((1, bk, D), lambda b, ki, qi: (b, ki, 0))
    rowq2 = pl.BlockSpec((1, bq, 8), lambda b, ki, qi: (b, qi, 0))
    dk, dv = pl.pallas_call(
        _bwd_dkv_kernel,
        grid=(BH, Sk // bk, Sq // bq),
        in_specs=[qspec2, kspec2, dspec2, vspec2, rowq2, rowq2],
        out_specs=(kspec2, vspec2),
        out_shape=(
            jax.ShapeDtypeStruct((BH, Sk, Dk), kf.dtype),
            jax.ShapeDtypeStruct((BH, Sk, D), vf.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, Dk), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
    )(qf, kf, dof, vf, lse, dvec)

    def unfold(x):
        return jnp.swapaxes(x[:, :S, :D].reshape(B, H, S, D), 1, 2)

    return unfold(dq), unfold(dk), unfold(dv)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention(q, k, v, block_q, block_k, k_splits):
    o, _ = _flash_forward(q, k, v, block_q, block_k, k_splits)
    return o


def _fwd_rule(q, k, v, block_q, block_k, k_splits):
    return _flash_forward(q, k, v, block_q, block_k, k_splits)


def _bwd_rule(block_q, block_k, k_splits, res, g):
    return _flash_backward(block_q, block_k, res, g)


_flash_attention.defvjp(_fwd_rule, _bwd_rule)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "k_splits"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 1024,
    block_k: int = 2048,
    k_splits: int = 1,
) -> jax.Array:
    """Softmax(QKᵀ/√d)·V for ``[B, S, H, D]`` inputs (full attention).

    Differentiable (flash backward kernels via custom VJP).  Shapes are
    padded internally to block multiples; padded key columns are masked,
    padded query rows are sliced off.  ``k_splits`` unrolls the forward's
    online softmax over sub-blocks of each fetched K/V block to overlap
    VPU softmax passes with the MXU matmuls (see _fwd_kernel).
    """
    return _flash_attention(q, k, v, block_q, block_k, k_splits)

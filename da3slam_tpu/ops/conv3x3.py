"""Pallas 3×3 conv for the DPT output head's narrow-channel stages.

**MEASURED NEGATIVE — kept with its probe and tests, NOT wired into the
model** (round 4, tools/probe_conv3x3.py on a real v5e; 8-step chained
dispatch incl. a COUT→C backmap conv, so deltas are attributable to the
forward conv alone):

  ============================  =========  =========  ==================
  shape                         XLA        pallas     note
  ============================  =========  =========  ==================
  head2-small  504² 64→32       110.6 ms   173.2 ms   C=64 pads to 128
                                                      (half-dead depth)
  head2-large  504² 128→32      110.8 ms   175.4 ms   full-depth fold
  head1-large  288² 256→128     108.5 ms   152.0 ms   the BEST fold —
                                                      768-deep × 384-wide
                                                      = 100% MXU — still
                                                      loses (41 vs 58
                                                      TF/s eff.)
  ============================  =========  =========  ==================

Two findings: (a) the f32 tap-panel roundtrip through VMEM — write plus
three sublane-shifted, lane-sliced reads — costs more than the MXU width
it buys, the same materialization tax that sank the XLA-level shift-dot
rewrite (ROADMAP r3), now in VMEM instead of HBM; (b) the round-3 trace's
24 TF/s for these convs was an in-model fusion-context number — standalone,
XLA runs them at ~58 TF/s, leaving far less headroom than the trace
implied.  models/dpt.py therefore keeps ``lax.conv_general_dilated``.

Original motivation, and why it plausibly should have won: with 32-64
output channels the direct conv's MXU pass is only 32/128-64/128 lanes
wide, and the im2col alternatives XLA picks can't recover the waste (NCHW
dimension numbers −6%, shift-dot 2.4× WORSE — both measured negatives,
tools/probe_dpt_conv.py, ROADMAP r3).

This kernel reshapes the arithmetic so the MXU runs wide in BOTH dims
("dh-folded tap panel"):

  - contraction over (3 kernel rows × C_in): the LHS row for output pixel
    p is the 3 vertically-adjacent input pixels' channels, built as three
    row-shifted VMEM slices of the tile — [P, 3C]
  - output width over (3 kernel cols × C_out): one dot against the
    [3C, 3·C_out] folded kernel yields, per pixel, the contribution panel
    of all three horizontal taps — [P, 3·C_out] f32 in VMEM scratch
  - the horizontal reduction is then three SHIFTED slice-adds over the
    panel (out[p] = Σ_dw Y[p+dw, dw-th group]) — pure VPU, tile-local

MXU utilisation: head2 (C=64→32 at SMALL) 192/256-deep × 96/128-wide =
56% of peak vs the direct conv's 25% ceiling; the LARGE head1 shape
(256→128) folds to 768-deep × 384-wide = 100%.  Input streams HBM→VMEM
via manually double-buffered row-tile DMA (grid = (frame, row_tile)), so
each input byte moves once.

Width padding does the boundary masking for free: the input is zero-padded
by 1 pixel, so the panel rows of pad pixels are exactly zero and the two
garbage output columns (w ≥ W) are sliced off by the caller.

The kernel is correct (tests/test_conv3x3.py validates it against the XLA
conv in interpret mode and on device) — it is retained as the record of
the experiment, like the int8-attention and shift-dot precedents.  The
shapes it targets are the head convs of the reference's torch DA3 model
(SURVEY.md §2.5 — consumed via ``model.inference``, solver.py:163).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_hbm, w3_ref, b_ref, out_ref,
    xt, yt, sem,
    *, bh: int, W2: int, C: int, COUT: int, n_tiles: int, relu: bool,
):
    n = pl.program_id(0)
    i = pl.program_id(1)
    P = bh * W2

    def tile_dma(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(tile * bh, bh + 2)], xt.at[slot], sem.at[slot]
        )

    # double-buffered row-tile stream: tile i was prefetched by step i-1
    # (or by the warmup below at the frame's first step); start i+1 before
    # computing so the DMA rides under the dot
    @pl.when(i == 0)
    def _warmup():
        tile_dma(0, 0).start()

    slot = jax.lax.rem(i, 2)
    tile_dma(slot, i).wait()

    @pl.when(i + 1 < n_tiles)
    def _prefetch():
        tile_dma(jax.lax.rem(i + 1, 2), i + 1).start()

    x = xt[slot]  # [bh+2, W2, C]
    flat = x.reshape((bh + 2) * W2, C)
    # Σ_dh (row-shifted tile view) · (dh-th kernel fold): three accumulated
    # dots instead of one concatenated [P, 3C] LHS — the concat version
    # copies the tile 3x through the VPU before the MXU ever sees it
    # (measured 2x slower end-to-end)
    y = jax.lax.dot_general(
        flat[0:P], w3_ref[0:C],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for dh in (1, 2):
        y = y + jax.lax.dot_general(
            flat[dh * W2:dh * W2 + P], w3_ref[dh * C:(dh + 1) * C],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [P, 3·COUT]: per-pixel panel of the three horizontal-tap results
    yt[0:P] = y
    # ghost rows so the dw=1,2 shifted reads below stay in bounds; the
    # pixels that read them are the sliced-off garbage columns (w >= W)
    yt[P:P + 8] = jnp.zeros((8, yt.shape[1]), jnp.float32)

    out = (
        yt[0:P, 0:COUT]
        + yt[1:P + 1, COUT:2 * COUT]
        + yt[2:P + 2, 2 * COUT:3 * COUT]
        + b_ref[:]
    )
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0] = out.reshape(bh, W2, COUT).astype(out_ref.dtype)


def conv3x3_eligible(x: jax.Array, kernel: jax.Array, bh: int = 8) -> bool:
    """The kernel handles SAME-padded stride-1 3×3 convs whose height tiles
    evenly; VMEM bounds the row-tile width.  (The TPU-backend gate lives at
    the call site — models/dpt.py — so tests can run this in interpret
    mode on CPU.)"""
    if kernel.ndim != 4 or kernel.shape[:2] != (3, 3):
        return False
    N, H, W, C = x.shape
    COUT = kernel.shape[-1]
    tile_bytes = (bh + 2) * (W + 2) * C * x.dtype.itemsize
    panel_bytes = (bh * (W + 2) + 8) * 3 * COUT * 4
    return (
        H % bh == 0
        and H >= 2 * bh
        and kernel.shape[2] == C
        and 2 * tile_bytes + panel_bytes < 48 * 1024 * 1024
    )


@functools.partial(jax.jit, static_argnames=("relu", "bh", "interpret"))
def conv3x3_fused(
    kernel: jax.Array,
    bias: jax.Array,
    x: jax.Array,
    *,
    relu: bool = False,
    bh: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """SAME 3×3 stride-1 conv (+ optional fused ReLU) of ``[N, H, W, C]``
    with an HWIO ``[3, 3, C, COUT]`` kernel, as the tap-panel Pallas kernel.
    Accumulates f32, returns ``x.dtype``."""
    N, H, W, C = x.shape
    COUT = kernel.shape[-1]
    # Mosaic constrains manual HBM DMA slices to the memref tiling: the
    # second-to-last dim 8-aligned, the last dim 128-aligned — so the padded
    # width rounds to 8 (extra zero columns join the structural garbage
    # columns in the w >= W slice-off) and the channel dim rounds to 128
    # (matching zero rows in the folded kernel keep the math exact; the
    # padded contraction depth costs some MXU utilisation at C=64 but the
    # kernel still clears XLA's 25%-wide ceiling by ~3x)
    W2 = (W + 2 + 7) // 8 * 8
    Cp = (C + 127) // 128 * 128
    n_tiles = H // bh
    assert H % bh == 0, (H, bh)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, W2 - W - 1), (0, Cp - C)))
    # fold HWIO → [(dh, c), (dw, co)]
    kp = jnp.pad(kernel, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
    w3 = kp.transpose(0, 2, 1, 3).reshape(3 * Cp, 3 * COUT).astype(x.dtype)
    b = bias.reshape(1, COUT).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _kernel, bh=bh, W2=W2, C=Cp, COUT=COUT, n_tiles=n_tiles, relu=relu
        ),
        grid=(N, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM; manual DMA
            pl.BlockSpec((3 * Cp, 3 * COUT), lambda n, i: (0, 0)),
            pl.BlockSpec((1, COUT), lambda n, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, W2, COUT), lambda n, i: (n, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W2, COUT), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2, W2, Cp), x.dtype),
            pltpu.VMEM((bh * W2 + 8, 3 * COUT), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, w3, b)
    return out[:, :, :W, :]

"""Fully device-resident streaming SLAM pipeline: one compiled program.

The TPU-native re-expression of the reference's chunk loop (SURVEY.md §5.7,
BASELINE north star): a ``jax.lax.scan`` over fixed-shape chunk windows whose
carry holds the previous overlap frame's depth/conf/intrinsics and global
pose — preprocessing, model forward, depth-scale, ICP and pose chaining all
fuse into a single XLA executable, so the track-depth-align loop never
leaves the device.

Memory layout: the device holds the sequence ONCE as uint8 frames; each scan
step gathers its window's frames by index and normalises them on the fly
(materialising all float windows up front would cost
``chunk_size/(chunk_size-overlap) × 4``× the sequence size in HBM).

The tail window is re-anchored to keep shapes static (slam/chunks.py), which
widens its overlap with the previous window; the per-window ``anchor_idx``
passed through the scan keeps the alignment pairing physically correct.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from da3slam_tpu.models.config import ModelConfig
from da3slam_tpu.models.da3 import forward_fn
from da3slam_tpu.ops.resize import resize_normalize
from da3slam_tpu.slam.alignment import AlignmentConfig, align_chunk_single_overlap
from da3slam_tpu.slam.chunks import make_chunk_indices


class PipelineOutput(NamedTuple):
    depth: jax.Array  # [C, N, H, W]
    conf: jax.Array  # [C, N, H, W]
    extrinsics_global: jax.Array  # [C, N, 3, 4] w2c
    intrinsics: jax.Array  # [C, N, 3, 3]
    depth_scale: jax.Array  # [C]
    fitness: jax.Array  # [C]


def make_windows(
    n_frames: int, chunk_size: int, overlap: int
) -> tuple[np.ndarray, np.ndarray]:
    """Window gather indices ``[C, chunk_size]`` plus per-window anchor
    indices ``[C]`` — the position within window k of the frame that is
    window k-1's last frame (``overlap-1`` in steady state; larger for the
    re-anchored tail)."""
    ranges = make_chunk_indices(n_frames, chunk_size, overlap)
    idx = np.stack([np.arange(a, b) for a, b in ranges])
    anchors = np.zeros(len(ranges), np.int32)
    for k in range(1, len(ranges)):
        prev_last = ranges[k - 1][1] - 1
        anchors[k] = prev_last - ranges[k][0]
    return idx, anchors


def _align_step(carry, out, a_idx, is_first, align_config):
    """One window's alignment/anchoring against the running carry.

    Shared by the fused scan (``run_pipeline``) and the dp-sharded
    two-phase pipeline (``run_pipeline_dp``) so both paths compute the
    identical chain.
    """
    prev_depth, prev_conf, prev_K, prev_E_global = carry

    def align_branch(_):
        a = align_chunk_single_overlap(
            prev_depth=prev_depth,
            prev_conf=prev_conf,
            prev_K=prev_K,
            cur_depth=out["depth"],
            cur_conf=out["conf"],
            cur_K=out["intrinsics"],
            cur_extrinsics=out["extrinsics"],
            prev_overlap_global=prev_E_global,
            config=align_config,
            anchor_idx=a_idx,
        )
        return a.extrinsics_global, a.depth_scaled, a.depth_scale, a.fitness

    def first_branch(_):
        # first chunk defines the global frame (reference solver.py:206-211)
        return (
            out["extrinsics"],
            out["depth"],
            jnp.asarray(1.0, jnp.float32),
            jnp.asarray(1.0, jnp.float32),
        )

    ext_global, depth, s, fitness = jax.lax.cond(
        is_first, first_branch, align_branch, operand=None
    )
    new_carry = (
        depth[-1],
        out["conf"][-1],
        out["intrinsics"][-1],
        ext_global[-1],
    )
    emit = (depth, out["conf"], ext_global, out["intrinsics"], s, fitness)
    return new_carry, emit


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "align_config", "attn_impl", "dtype", "process_hw",
                     "spill_dtype"),
)
def run_pipeline(
    params: Any,
    frames: jax.Array,  # [T, H, W, 3] uint8 (or float) — device-resident once
    window_idx: jax.Array,  # [C, N] int32
    anchor_idx: jax.Array,  # [C] int32
    cfg: ModelConfig,
    align_config: AlignmentConfig = AlignmentConfig(),
    attn_impl: str = "auto",
    dtype=jnp.bfloat16,
    process_hw: tuple[int, int] | None = None,
    carry=None,
    spill_dtype=None,
) -> tuple[PipelineOutput, tuple]:
    """Scan the SLAM loop over all windows in one compiled program.

    ``carry`` threads segmented runs: pass the carry returned by the previous
    segment to continue a sequence (None starts fresh — the first window then
    defines the global frame).  Returns ``(outputs, final_carry)``.

    ``spill_dtype`` (e.g. ``jnp.float16``) casts the DENSE emitted maps —
    depth and conf, the [C, N, H, W] bulk — at the scan emit, halving both
    the stacked output buffer in HBM and any subsequent device→host spill.
    The alignment math itself (the carry) stays f32; poses/intrinsics/
    scales are tiny and stay f32.  f16's 10-bit mantissa bounds the depth
    error at ~0.05%, well under the model's own noise floor.
    """
    hw = process_hw if process_hw is not None else (frames.shape[1], frames.shape[2])
    fresh_start = carry is None

    def chunk_step(carry, xs):
        idx_row, a_idx, is_first = xs
        chunk_images = resize_normalize(jnp.take(frames, idx_row, axis=0), hw)
        out = forward_fn(params, chunk_images, cfg, ref_idx=0,
                         attn_impl=attn_impl, dtype=dtype)
        new_carry, (d, cf, ext, K, s, fit) = _align_step(
            carry, out, a_idx, is_first, align_config
        )
        if spill_dtype is not None:
            d, cf = d.astype(spill_dtype), cf.astype(spill_dtype)
        return new_carry, (d, cf, ext, K, s, fit)

    C = window_idx.shape[0]
    H, W = hw
    if fresh_start:
        carry = (
            jnp.zeros((H, W), jnp.float32),
            jnp.zeros((H, W), jnp.float32),
            jnp.eye(3, dtype=jnp.float32),
            jnp.eye(4, dtype=jnp.float32)[:3],
        )
    is_first = jnp.zeros(C, bool).at[0].set(fresh_start)
    final_carry, (depth, conf, ext, K, s, fit) = jax.lax.scan(
        chunk_step, carry, (window_idx, anchor_idx, is_first)
    )
    return PipelineOutput(depth, conf, ext, K, s, fit), final_carry


def run_pipeline_dp(
    params: Any,
    frames: jax.Array,
    window_idx: jax.Array,  # [C, N] int32
    anchor_idx: jax.Array,  # [C] int32
    cfg: ModelConfig,
    mesh,
    align_config: AlignmentConfig = AlignmentConfig(),
    attn_impl: str = "auto",
    dtype=jnp.bfloat16,
    process_hw: tuple[int, int] | None = None,
    carry=None,
) -> tuple[PipelineOutput, tuple]:
    """Multi-chip SLAM: window forwards sharded over the mesh's ``dp`` axis.

    The model forward of window k does not depend on window k-1's
    *alignment* (only the pose chain does), so the dominant cost — the
    16-frame DA3 forward — data-parallelises perfectly over windows:

      phase 1: windows split over the ``dp`` axis with ``shard_map``; each
               device runs the *sequential* per-window forward
               (``lax.map``) over its local windows.  Sequential-per-device
               keeps every kernel at the exact shape the fused scan uses
               (a vmap-batched Pallas flash call lowers ~3.5× slower),
               while devices run their window sets concurrently.
      phase 2: the sequential depth-scale/ICP/pose-chain scan over the
               (much smaller) forward outputs — identical math to
               ``run_pipeline``'s fused scan (shared ``_align_step``).

    Window counts that don't divide the dp size are padded with repeats of
    the last window (dropped again after phase 1).  On C chips this
    approaches a C× end-to-end speedup once the sequence has ≥ C windows
    per segment; single-device meshes degenerate to the fused path's
    arithmetic exactly.
    """
    hw = process_hw if process_hw is not None else (frames.shape[1], frames.shape[2])
    fresh_start = carry is None

    run = _dp_run_factory(mesh, hw, cfg, align_config, attn_impl, dtype)
    C = window_idx.shape[0]
    H, W = hw
    if fresh_start:
        carry = (
            jnp.zeros((H, W), jnp.float32),
            jnp.zeros((H, W), jnp.float32),
            jnp.eye(3, dtype=jnp.float32),
            jnp.eye(4, dtype=jnp.float32)[:3],
        )
    is_first = jnp.zeros(C, bool).at[0].set(fresh_start)

    # shard_map needs the window axis to divide dp: pad with repeats of the
    # last window, sliced off again inside the jitted runner
    dp = mesh.shape["dp"]
    pad = (-C) % dp
    widx = np.asarray(window_idx)
    if pad:
        widx = np.concatenate([widx, np.repeat(widx[-1:], pad, axis=0)])
    return run(params, frames, jnp.asarray(widx), jnp.asarray(anchor_idx),
               carry, is_first, C)


@functools.lru_cache(maxsize=None)
def _dp_run_factory(mesh, hw, cfg, align_config, attn_impl, dtype):
    """Jitted two-phase runner, cached per (mesh, geometry, config) so
    repeated segments reuse the compiled executable."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @functools.partial(jax.jit, static_argnames=("n_windows",))
    def run(params, frames, window_idx, anchor_idx, carry, is_first, n_windows):
        def local_forwards(params_, frames_, widx_local):
            # sequential over this device's windows: kernels keep the same
            # per-window shapes as the fused scan (no batched-Pallas path)
            def one_forward(idx_row):
                imgs = resize_normalize(jnp.take(frames_, idx_row, axis=0), hw)
                return forward_fn(params_, imgs, cfg, ref_idx=0,
                                  attn_impl=attn_impl, dtype=dtype)

            return jax.lax.map(one_forward, widx_local)

        outs = shard_map(
            local_forwards,
            mesh=mesh,
            in_specs=(P(), P(), P("dp")),
            out_specs=P("dp"),
            # the Pallas flash kernel's output ShapeDtypeStructs carry no
            # vma annotation, which trips the varying-axes checker on TPU
            check_vma=False,
        )(params, frames, window_idx)
        # drop the divisibility padding
        outs = jax.tree.map(lambda x: x[:n_windows], outs)

        def step(c, xs):
            out, a_idx, first = xs
            return _align_step(c, out, a_idx, first, align_config)

        final_carry, emits = jax.lax.scan(
            step, carry, (outs, anchor_idx, is_first)
        )
        return PipelineOutput(*emits), final_carry

    return run


class PPParams(NamedTuple):
    """Pipeline-parallel split of the full DA3 params (see ``split_params_pp``)."""

    stage_blocks: Any  # encoder blocks stacked [n_stages, per, ...], pp-sharded
    enc_rest: Any  # patch embed / norms / tokens — replicated
    heads: Any  # {"dpt": ..., "camera": ...} — replicated


def split_params_pp(params: Any, n_stages: int, mesh) -> PPParams:
    """Split full model params for ``run_pipeline_pp``.

    The encoder block stack goes stage-stacked and sharded over the mesh's
    ``pp`` axis (each device holds ``depth / n_stages`` blocks — the weight-
    memory win that makes the giant tier's 4.5 GiB shrink per chip); embeds
    and heads are tiny and stay replicated.  Do this ONCE per model and
    reuse across segments — it materialises a stacked copy of the blocks.
    """
    from da3slam_tpu.parallel.pp_forward import split_encoder_params

    stage_blocks, enc_rest = split_encoder_params(params["encoder"], n_stages, mesh)
    heads = {"dpt": params["dpt"], "camera": params["camera"]}
    return PPParams(stage_blocks, enc_rest, heads)


def run_pipeline_pp(
    params: Any,  # full params dict OR a pre-split PPParams
    frames: jax.Array,
    window_idx: jax.Array,  # [C, N] int32
    anchor_idx: jax.Array,  # [C] int32
    cfg: ModelConfig,
    mesh,
    align_config: AlignmentConfig = AlignmentConfig(),
    attn_impl: str = "auto",
    dtype=jnp.bfloat16,
    process_hw: tuple[int, int] | None = None,
    carry=None,
) -> tuple[PipelineOutput, tuple]:
    """Multi-chip SLAM with the encoder *pipeline*-parallel over stages.

    The realtime configuration for tiers that don't hit framerate on one
    chip (the giant: 12.9 FPS single-chip, tools/profile_giant.py).  Where
    ``run_pipeline_dp`` replicates the weights and shards windows, this
    path shards the *encoder depth* over the mesh's ``pp`` axis and feeds
    consecutive SLAM windows through the GPipe ring as microbatches
    (parallel/pp_forward.py) — the stages work on successive windows
    concurrently, so per-chip weight memory drops by the stage count and
    steady-state throughput approaches ``S ×`` the single-chip rate:

      FPS(S stages, C windows/dispatch) ≈ single_chip_FPS · S · C/(C+S−1)

    e.g. the giant on 4 chips at 12 windows/dispatch: 12.9 · 4 · 12/15 ≈
    41 FPS — above the 30 FPS line with room for ICI overhead.  The DPT/
    camera heads and the sequential depth-scale/ICP/pose-chain scan are
    <10% of the window cost and run after the ring (phase 2, identical
    math to ``run_pipeline`` via the shared ``_align_step``).

    ``params`` may be the full model dict (split per call — fine for tests)
    or a ``PPParams`` from ``split_params_pp`` (reuse across segments).
    """
    hw = process_hw if process_hw is not None else (frames.shape[1], frames.shape[2])
    n_stages = mesh.shape["pp"]
    if not isinstance(params, PPParams):
        params = split_params_pp(params, n_stages, mesh)
    fresh_start = carry is None
    H, W = hw
    if fresh_start:
        carry = (
            jnp.zeros((H, W), jnp.float32),
            jnp.zeros((H, W), jnp.float32),
            jnp.eye(3, dtype=jnp.float32),
            jnp.eye(4, dtype=jnp.float32)[:3],
        )
    C = window_idx.shape[0]
    is_first = jnp.zeros(C, bool).at[0].set(fresh_start)
    run = _pp_run_factory(mesh, hw, cfg, align_config, attn_impl, dtype)
    return run(params, frames, window_idx, anchor_idx, carry, is_first)


@functools.lru_cache(maxsize=None)
def _pp_run_factory(mesh, hw, cfg, align_config, attn_impl, dtype):
    """Jitted pp runner, cached per (mesh, geometry, config)."""
    from da3slam_tpu.models import camera as camera_mod
    from da3slam_tpu.models import dpt as dpt_mod
    from da3slam_tpu.parallel.pp_forward import make_pp_encode

    encode_pp = make_pp_encode(cfg, mesh, mesh.shape["pp"], attn_impl, dtype)
    grid = (hw[0] // cfg.patch_size, hw[1] // cfg.patch_size)

    @jax.jit
    def run(pp_params, frames, window_idx, anchor_idx, carry, is_first):
        stage_blocks, enc_rest, heads = pp_params
        # all windows' normalised images at once — the ring consumes them
        # as microbatches ([C, N, H, W, 3]; ~48 MB/window at 16×504² f32,
        # so segment long sequences via run_streaming_slam)
        imgs_mb = jax.vmap(
            lambda row: resize_normalize(jnp.take(frames, row, axis=0), hw)
        )(window_idx)
        taps, final = encode_pp(stage_blocks, enc_rest, imgs_mb)

        def head(taps_m, final_m):
            depth, conf, _rays = dpt_mod.apply_dpt(
                heads["dpt"], list(taps_m), grid, hw, cfg
            )
            ext, K = camera_mod.apply_camera_head(
                heads["camera"], final_m[:, 0, :], hw, 0
            )
            return {"depth": depth, "conf": conf,
                    "extrinsics": ext, "intrinsics": K}

        # sequential over windows: the head is <10% of the window cost and
        # lax.map keeps its conv intermediates at the fused scan's
        # per-window shapes instead of batching them [C, ...] in HBM
        outs = jax.lax.map(lambda tf: head(*tf), (taps, final))

        def step(c, xs):
            out, a_idx, first = xs
            return _align_step(c, out, a_idx, first, align_config)

        final_carry, emits = jax.lax.scan(
            step, carry, (outs, anchor_idx, is_first)
        )
        return PipelineOutput(*emits), final_carry

    return run


def run_pipeline_sp(
    params: Any,
    frames: jax.Array,
    window_idx: jax.Array,  # [C, N] int32
    anchor_idx: jax.Array,  # [C] int32
    cfg: ModelConfig,
    mesh,
    align_config: AlignmentConfig = AlignmentConfig(),
    attn_impl: str = "auto",  # accepted for signature parity; see note below
    dtype=jnp.bfloat16,
    process_hw: tuple[int, int] | None = None,
    carry=None,
) -> tuple[PipelineOutput, tuple]:
    """Multi-chip SLAM with each window's *view axis* sharded (sp).

    The latency-optimal sharding for tiers below realtime on one chip:
    where ``run_pipeline_pp`` pipelines windows (throughput ≈ S×, but a
    window's latency stays the full single-chip time), sp splits every
    window's 16 views across the mesh — patch embed, intra-view attention,
    MLPs and the DPT head are embarrassingly parallel over views; the
    quadratic cross-view term runs as ring attention over ICI
    (parallel/ring_attention.py).  Both throughput AND per-window latency
    scale ≈ S×: the giant's 1242 ms window → ~310 ms on 4 chips ≈ 51 FPS
    with the pose chain still sequential (it is <1% of the cost).  Weights
    are replicated (4.49 GiB f32 giant fits each v5e), so sp is the live-
    SLAM choice and pp the weight-memory-bound one.

    ``attn_impl`` is accepted for signature parity with the dp/pp paths
    but the sp forward fixes its own dispatch (intra-view local, cross-
    view ``ring:<axis>``).  ``N`` (chunk_size) must divide the sp axis.
    """
    hw = process_hw if process_hw is not None else (frames.shape[1], frames.shape[2])
    fresh_start = carry is None
    H, W = hw
    if fresh_start:
        carry = (
            jnp.zeros((H, W), jnp.float32),
            jnp.zeros((H, W), jnp.float32),
            jnp.eye(3, dtype=jnp.float32),
            jnp.eye(4, dtype=jnp.float32)[:3],
        )
    C = window_idx.shape[0]
    is_first = jnp.zeros(C, bool).at[0].set(fresh_start)
    axis = "sp" if "sp" in mesh.axis_names else mesh.axis_names[0]
    run = _sp_run_factory(mesh, axis, hw, cfg, align_config, dtype)
    return run(params, frames, window_idx, anchor_idx, carry, is_first)


@functools.lru_cache(maxsize=None)
def _sp_run_factory(mesh, axis, hw, cfg, align_config, dtype):
    """Jitted sp runner, cached per (mesh, geometry, config)."""
    from da3slam_tpu.parallel.sp_forward import make_sharded_forward

    sp_fwd = make_sharded_forward(cfg, mesh, axis=axis, dtype=dtype, jit=False)

    @jax.jit
    def run(params, frames, window_idx, anchor_idx, carry, is_first):
        def chunk_step(c, xs):
            idx_row, a_idx, first = xs
            imgs = resize_normalize(jnp.take(frames, idx_row, axis=0), hw)
            out = sp_fwd(params, imgs)
            return _align_step(c, out, a_idx, first, align_config)

        final_carry, emits = jax.lax.scan(
            chunk_step, carry, (window_idx, anchor_idx, is_first)
        )
        return PipelineOutput(*emits), final_carry

    return run


def run_streaming_slam(
    params: Any,
    frames,  # [T, H, W, 3] uint8 (numpy or device array)
    cfg: ModelConfig,
    chunk_size: int = 16,
    overlap: int = 1,
    process_hw: tuple[int, int] | None = None,
    align_config: AlignmentConfig = AlignmentConfig(),
    attn_impl: str = "auto",
    dtype=jnp.bfloat16,
    segment_windows: int | None = None,
    segment_spill: str = "host",
    spill_dtype=None,
    mesh=None,
    parallel: str = "dp",
) -> PipelineOutput:
    """Host convenience wrapper: window indexing + the scan pipeline.

    ``segment_windows`` bounds device memory for arbitrarily long sequences:
    the scan runs ``segment_windows`` windows at a time, keeping only each
    segment's frame slice in HBM and threading the carry between segments —
    results are identical to the single-scan path.

    ``segment_spill`` says where segment outputs accumulate: "host" (the
    default — per-segment dense outputs move off-device, the true
    bounded-HBM mode) or "device" (outputs stay as device arrays; use when
    the caller will immediately reduce them on-device, or to measure the
    compute path without the host link).

    ``spill_dtype`` (e.g. ``jnp.float16``) emits the dense depth/conf maps
    in a compact dtype straight from the scan — halving the per-segment
    HBM output buffer AND the device→host spill bytes (the host link is
    the bounded-HBM mode's bottleneck: depth+conf dominate the transfer
    at ~32 MB per 16-frame window in f32).  None keeps the bit-exact f32
    path.

    ``mesh`` switches to a multi-chip pipeline, chosen by ``parallel``:
    ``"dp"`` (``run_pipeline_dp``) shards window forwards over the mesh's
    ``dp`` axis — replicated weights, best throughput when the model fits
    one chip; ``"pp"`` (``run_pipeline_pp``) pipelines the encoder depth
    over the mesh's ``pp`` axis with windows as GPipe microbatches —
    weight memory shards by stage; ``"sp"`` (``run_pipeline_sp``) shards
    each window's view axis with ring cross-view attention — the latency-
    optimal live-SLAM configuration for below-realtime tiers.
    """
    if parallel not in ("dp", "pp", "sp"):
        raise ValueError(f"parallel must be 'dp', 'pp' or 'sp', got {parallel!r}")
    T = frames.shape[0]
    idx, anchors = make_windows(T, chunk_size, overlap)

    if mesh is not None and parallel == "pp":
        # split once; every segment reuses the stage-sharded weights
        params = split_params_pp(params, mesh.shape["pp"], mesh)

    def run_segment(seg_frames, seg_idx, seg_anchors, carry):
        if mesh is not None:
            runner = {"dp": run_pipeline_dp, "pp": run_pipeline_pp,
                      "sp": run_pipeline_sp}[parallel]
            out, c = runner(
                params, seg_frames, seg_idx, seg_anchors, cfg, mesh,
                align_config, attn_impl, dtype, process_hw, carry=carry,
            )
            if spill_dtype is not None:  # dp path: cast before the spill
                out = out._replace(depth=out.depth.astype(spill_dtype),
                                   conf=out.conf.astype(spill_dtype))
            return out, c
        return run_pipeline(
            params, seg_frames, seg_idx, seg_anchors, cfg,
            align_config, attn_impl, dtype, process_hw, carry=carry,
            spill_dtype=spill_dtype,
        )

    if segment_windows is None or segment_windows >= idx.shape[0]:
        out, _ = run_segment(
            jnp.asarray(frames), jnp.asarray(idx), jnp.asarray(anchors), None
        )
        return out

    if segment_spill not in ("host", "device"):
        raise ValueError(f"segment_spill must be 'host' or 'device', got {segment_spill!r}")
    on_device_frames = isinstance(frames, jax.Array)
    if not on_device_frames:
        frames = np.asarray(frames)

    starts = list(range(0, idx.shape[0], segment_windows))

    def stage(s0):
        """Segment's (frames, rebased idx, anchors) with frames staged in HBM.

        ``jax.device_put`` dispatches the upload asynchronously, so calling
        this for segment k+1 right after dispatching segment k's scan
        double-buffers: the host→device copy rides under the compute.
        """
        seg_idx = idx[s0 : s0 + segment_windows]
        f_lo, f_hi = int(seg_idx.min()), int(seg_idx.max()) + 1
        if on_device_frames:
            # already in HBM: slice device-side, no host round-trip
            seg_frames = jax.lax.slice_in_dim(frames, f_lo, f_hi, axis=0)
        else:
            seg_frames = jax.device_put(frames[f_lo:f_hi])
        return seg_frames, jnp.asarray(seg_idx - f_lo), jnp.asarray(
            anchors[s0 : s0 + segment_windows]
        )

    outputs = []
    carry = None
    staged = stage(starts[0])
    for k, s0 in enumerate(starts):
        seg_frames, seg_idx_dev, seg_anchors_dev = staged
        out, carry = run_segment(seg_frames, seg_idx_dev, seg_anchors_dev, carry)
        if k + 1 < len(starts):  # prefetch while this segment computes
            staged = stage(starts[k + 1])
        # the host fetch (spill) below is what blocks on the compute
        outputs.append(jax.tree.map(np.asarray, out) if segment_spill == "host" else out)
    cat = np.concatenate if segment_spill == "host" else jnp.concatenate
    return PipelineOutput(*[cat(parts) for parts in zip(*outputs)])

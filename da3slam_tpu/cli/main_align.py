"""Chunk-alignment demo CLI (reference main_align.py:74-130).

Splits the sequence into chunks, aligns each to the previous via the chosen
method, and reports per-chunk diagnostics; optionally renders the fused
cloud into the viewer and exports a merged PLY.  The reference hard-coded
its paths (main_align.py:71-72); here they are flags.  Note a deliberate
behavioral FIX vs the reference: its method dispatch ran ICP and then
unconditionally overwrote the result with the KD-tree Umeyama variant
regardless of the requested method (align_geometry.py:182-183); here
``--method`` selects exactly one registration path.
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Two-chunk alignment demo")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--model", default="small")
    p.add_argument("--chunk_size", type=int, default=4)
    p.add_argument("--overlap", type=int, default=1)
    p.add_argument("--method", default="icp", choices=["icp", "irls", "umeyama"])
    p.add_argument("--output_ply", default=None, help="write fused cloud here")
    p.add_argument("--process_res", type=int, default=504)
    p.add_argument("--headless", action="store_true")
    p.add_argument("--debug_color", action="store_true",
                   help="tint each chunk's points a distinct color (the "
                        "reference's chunk-alignment eyeball check)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from da3slam_tpu.core.geometry import backproject_depth
    from da3slam_tpu.inout import load_config, load_image_paths
    from da3slam_tpu.models import DepthAnything3
    from da3slam_tpu.slam import AlignmentConfig, align_chunk_single_overlap
    from da3slam_tpu.slam.chunks import make_chunk_indices

    if args.config:
        cfg = load_config(args.config)
        model_path = cfg.get("Weights", {}).get("DA3", args.model)
    else:
        model_path = args.model

    model = DepthAnything3.from_pretrained(model_path)
    paths = load_image_paths(args.image_dir)
    if not paths:
        raise SystemExit(f"no images in {args.image_dir}")
    ranges = make_chunk_indices(len(paths), args.chunk_size, args.overlap)
    chunks = [paths[a:b] for a, b in ranges]
    print(f"{len(paths)} frames → {len(chunks)} chunks of {args.chunk_size}")

    align_cfg = AlignmentConfig(method=args.method)
    viewer = None
    if not args.headless:
        try:
            from da3slam_tpu.viz.viewer import SLAMViewer

            viewer = SLAMViewer(port=8080)
        except ImportError:
            print("viser unavailable; headless")

    prev = model.inference(image=chunks[0], use_ray_pose=True, process_res=args.process_res)
    prev_ext_global = prev.extrinsics.astype(np.float64)
    all_pts, all_cols = [], []

    chunk_counter = [0]

    def accumulate(pred, ext_global):
        pts = np.asarray(
            backproject_depth(
                jnp.asarray(pred.depth), jnp.asarray(pred.intrinsics),
                jnp.asarray(ext_global, jnp.float32),
            )
        )
        keep = pred.conf >= 1.0
        colors = pred.processed_images
        if args.debug_color:
            from da3slam_tpu.viz.debug import apply_chunk_color_to_images_batch

            colors = apply_chunk_color_to_images_batch(colors, chunk_counter[0])
        chunk_counter[0] += 1
        all_pts.append(pts[keep])
        all_cols.append(colors[keep])
        if viewer is not None:
            for i in (0, len(pred.depth) - 1):  # first/last frame per chunk
                viewer.add_frame(pred.processed_images[i], pred.depth[i],
                                 pred.conf[i], ext_global[i], pred.intrinsics[i])

    accumulate(prev, prev_ext_global)
    prev_overlap_global = prev_ext_global[-1]

    for k in range(1, len(chunks)):
        cur = model.inference(image=chunks[k], use_ray_pose=True, process_res=args.process_res)
        # index within cur of the frame that IS prev's last frame: overlap-1
        # in steady state, larger for the re-anchored tail chunk — anchor 0
        # would register depth maps of different physical frames
        anchor = ranges[k - 1][1] - 1 - ranges[k][0]
        out = align_chunk_single_overlap(
            prev_depth=jnp.asarray(prev.depth[-1]),
            prev_conf=jnp.asarray(prev.conf[-1]),
            prev_K=jnp.asarray(prev.intrinsics[-1]),
            cur_depth=jnp.asarray(cur.depth),
            cur_conf=jnp.asarray(cur.conf),
            cur_K=jnp.asarray(cur.intrinsics),
            cur_extrinsics=jnp.asarray(cur.extrinsics),
            prev_overlap_global=jnp.asarray(prev_overlap_global, jnp.float32),
            config=align_cfg,
            anchor_idx=np.int32(anchor),
        )
        print(f"chunk {k}: s={float(out.depth_scale):.4f} "
              f"fitness={float(out.fitness):.4f} rmse={float(out.inlier_rmse):.5f}")
        cur_ext_global = np.asarray(out.extrinsics_global)
        cur.depth = np.asarray(out.depth_scaled)
        accumulate(cur, cur_ext_global)
        prev, prev_overlap_global = cur, cur_ext_global[-1]

    if args.output_ply:
        from da3slam_tpu.inout import write_ply

        pts = np.concatenate(all_pts)
        cols = np.concatenate(all_cols)
        write_ply(args.output_ply, pts, cols)
        print(f"fused cloud ({len(pts)} pts) → {args.output_ply}")

    if viewer is not None:
        viewer.keep_alive()


if __name__ == "__main__":
    main()

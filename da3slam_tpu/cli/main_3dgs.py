"""3D-Gaussian-Splatting export CLI.

The reference's ``main_3dgs.py`` is an unimplemented 5-line stub
(main_3dgs.py:1-5); this is the real thing: run the model over the sequence
chunks, stitch poses with the SLAM aligner, and write the fused scene as a
standard 3DGS ``.ply`` (plus optional GLB point cloud).
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Export a sequence as 3D gaussians")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--model", default="small")
    p.add_argument("--output", default="scene_3dgs.ply")
    p.add_argument("--glb", default=None, help="also write a GLB point cloud")
    p.add_argument("--chunk_size", type=int, default=8)
    p.add_argument("--stride", type=int, default=2)
    p.add_argument("--conf_threshold", type=float, default=1.0)
    p.add_argument("--process_res", type=int, default=504)
    p.add_argument("--refine_iters", type=int, default=0,
                   help="multi-view consistency refinement steps over the "
                        "splats (ops/splats.py): positions snap to the "
                        "fused geometry, colors to the observed pixels, "
                        "opacity fades for unsupported splats (0 = off)")
    p.add_argument("--train_iters", type=int, default=0,
                   help="appearance-grade 3DGS training steps through the "
                        "differentiable tile rasterizer (ops/rasterize.py): "
                        "every splat attribute (position, scale, rotation, "
                        "color, opacity) optimizes the rendered-vs-observed "
                        "photometric loss across all views (0 = off; runs "
                        "after --refine_iters if both are set)")
    p.add_argument("--densify_every", type=int, default=0,
                   help="during --train_iters, resample pruned splats into "
                        "under-reconstructed regions every N steps "
                        "(fixed-budget densification; 0 = off)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from da3slam_tpu.inout import load_config, load_image_paths
    from da3slam_tpu.inout.export3d import prediction_to_3dgs, export_glb
    from da3slam_tpu.models import DepthAnything3
    from da3slam_tpu.models.da3 import Prediction
    from da3slam_tpu.slam.chunks import run_chunked_alignment

    model_path = args.model
    if args.config:
        model_path = load_config(args.config).get("Weights", {}).get("DA3", args.model)

    model = DepthAnything3.from_pretrained(model_path)
    paths = load_image_paths(args.image_dir)
    if not paths:
        raise SystemExit(f"no images in {args.image_dir}")

    fused = run_chunked_alignment(
        model, paths, args.chunk_size, overlap=1,
        process_res=args.process_res, collect_images=True,
    )
    merged = Prediction(
        processed_images=fused["images"],
        depth=fused["depth"],
        conf=fused["conf"],
        extrinsics=fused["extrinsics_global"],
        intrinsics=fused["intrinsics"],
    )
    if args.refine_iters > 0 or args.train_iters > 0:
        from da3slam_tpu.inout.export3d import export_3dgs_ply, splats_from_prediction

        d = splats_from_prediction(
            merged, stride=args.stride, conf_threshold=args.conf_threshold
        )
        points = jnp.asarray(d["points"])
        colors = jnp.asarray(d["colors"])
        opacity = jnp.asarray(d["opacity"])
        scales = np.asarray(d["scales"])
        rotations = d["rotations"]
        if args.refine_iters > 0:
            from da3slam_tpu.ops.splats import refine_splats

            res = refine_splats(
                points, colors, opacity,
                jnp.asarray(merged.depth), jnp.asarray(merged.processed_images),
                jnp.asarray(merged.intrinsics), jnp.asarray(merged.extrinsics),
                iters=args.refine_iters,
            )
            points, colors, opacity = res.points, res.colors, res.opacity
            print(f"refined {args.refine_iters} iters "
                  f"(mean support {float(res.support.mean()):.2f})")
        if args.train_iters > 0:
            from da3slam_tpu.ops.splats import train_splats

            quats = (jnp.asarray(rotations) if rotations is not None
                     else jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]),
                                   (points.shape[0], 1)))
            hw = merged.depth.shape[1:3]
            res = train_splats(
                points, jnp.asarray(scales), quats, colors, opacity,
                jnp.asarray(merged.processed_images),
                jnp.asarray(merged.intrinsics), jnp.asarray(merged.extrinsics),
                tuple(int(x) for x in hw), iters=args.train_iters,
                densify_every=args.densify_every,
            )
            points, colors, opacity = res.points, res.colors, res.opacity
            scales, rotations = np.asarray(res.scales), np.asarray(res.quats)
            print(f"trained {args.train_iters} iters "
                  f"(photometric L1 {float(res.losses[0]):.4f} -> "
                  f"{float(res.losses[-1]):.4f})")
        export_3dgs_ply(
            args.output, np.asarray(points),
            np.asarray(colors), scales, np.asarray(opacity),
            rotations=rotations,
        )
        n = int(points.shape[0])
    else:
        n = prediction_to_3dgs(
            merged, args.output, stride=args.stride, conf_threshold=args.conf_threshold
        )
    print(f"wrote {n} gaussians to {args.output}")
    if args.glb:
        export_glb(merged, args.glb, stride=args.stride, conf_threshold=args.conf_threshold)
        print(f"wrote GLB point cloud to {args.glb}")


if __name__ == "__main__":
    main()

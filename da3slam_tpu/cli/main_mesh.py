"""TSDF-fused triangle-mesh export CLI.

The reference exports fused geometry only as concatenated point clouds
(da3_streaming.py:664-690); this adds the volumetric alternative: run the
model over the sequence, stitch poses with the SLAM aligner, TSDF-fuse all
depth frames on the device (ops/tsdf.py — one lax.scan, O(voxels) memory),
and extract a watertight-where-observed triangle mesh with marching
tetrahedra (inout/mesh.py).

    python -m da3slam_tpu.cli.main_mesh --image_dir frames/ \
        --output scene_mesh.ply [--resolution 192] [--conf_floor 1.0]
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Export a sequence as a TSDF mesh")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--model", default="small")
    p.add_argument("--output", default="scene_mesh.ply")
    p.add_argument("--chunk_size", type=int, default=8)
    p.add_argument("--process_res", type=int, default=504)
    p.add_argument("--resolution", type=int, default=192,
                   help="voxels along the longest scene axis")
    p.add_argument("--conf_floor", type=float, default=1.0,
                   help="confidence at/below this contributes zero weight")
    p.add_argument("--max_weight", type=float, default=64.0)
    p.add_argument("--color", action="store_true",
                   help="accumulate per-voxel colors and write per-vertex "
                   "colors into the mesh PLY")
    p.add_argument("--sparse", action="store_true",
                   help="block-sparse band-only fusion (ops/tsdf.py "
                   "integrate_frames_sparse): 5-10x faster at high "
                   "resolutions; skips free-space carving unless --carve")
    p.add_argument("--carve", action="store_true",
                   help="with --sparse: also carve free space in front of "
                   "occupied blocks, so spurious early surfaces that later "
                   "frames contradict get erased (dense always carves)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from da3slam_tpu.inout import load_config, load_image_paths
    from da3slam_tpu.inout.mesh import tsdf_to_mesh, write_mesh_ply
    from da3slam_tpu.models import DepthAnything3
    from da3slam_tpu.ops.tsdf import fuse_frames
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
        process_res=args.process_res, collect_images=args.color,
        # TSDF averaging is weighted — duplicated overlap frames would
        # double-weight the chunk seams
        dedup_overlap=True,
    )

    grid = fuse_frames(
        fused["depth"], fused["conf"], fused["intrinsics"],
        fused["extrinsics_global"],
        resolution=args.resolution,
        conf_floor=args.conf_floor,
        max_weight=args.max_weight,
        images=fused.get("images"),
        sparse=args.sparse,
        carve=args.carve,
    )
    verts, faces = tsdf_to_mesh(grid)
    if len(verts) == 0:
        raise SystemExit("TSDF produced an empty mesh — check --conf_floor "
                         "(no pixel cleared it?) and the depth scale")
    colors = None
    if args.color:
        from da3slam_tpu.ops.tsdf import vertex_colors

        colors = vertex_colors(grid, verts)
    from da3slam_tpu.inout.mesh import tsdf_vertex_normals

    write_mesh_ply(args.output, verts, faces, colors=colors,
                   normals=tsdf_vertex_normals(grid, verts))
    print(f"mesh: {len(verts)} vertices, {len(faces)} faces → {args.output}")


if __name__ == "__main__":
    main()

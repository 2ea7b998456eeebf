"""Long-sequence streaming CLI (reference utils/da3_streaming.py:880-927).

Same flags: --image_dir, --config, --output_dir.  Writes per-chunk PLYs, a
merged cloud, camera_poses.txt / intrinsic.txt / camera_poses.ply, then
cleans its temp spill.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Long-sequence streaming DA3-SLAM")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--output_dir", default="streaming_out")
    p.add_argument("--keep_temp", action="store_true",
                   help="keep the _tmp_results_* spill directories")
    p.add_argument("--traj_formats", default=None,
                   help="comma-separated interop trajectory exports beside "
                   "camera_poses.txt: tum,kitti")
    p.add_argument("--mesh", action="store_true",
                   help="also TSDF-fuse the sequence and write a colored "
                   "scene_mesh.ply (Model.mesh_resolution controls detail)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from da3slam_tpu.inout import load_config
    from da3slam_tpu.slam.streaming import DA3Streaming

    config = load_config(args.config) if args.config else {"Weights": {"DA3": "small"}}
    if args.keep_temp:
        config.setdefault("Model", {})["delete_temp_files"] = False
    if args.traj_formats:
        config.setdefault("Model", {})["traj_formats"] = [
            f.strip() for f in args.traj_formats.split(",") if f.strip()
        ]
    if args.mesh:
        config.setdefault("Model", {})["export_mesh"] = True

    streaming = DA3Streaming(args.image_dir, args.output_dir, config)
    streaming.run()
    streaming.close()


if __name__ == "__main__":
    main()

"""Full SLAM loop CLI (reference main_slam.py:9-52).

Same flags (--image_dir, --config); after the run the process stays alive
while a viewer is attached so the browser view survives (reference
main_slam.py:47-51), and the trajectory is exported if --output_dir is set.
"""

from __future__ import annotations

import argparse
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DA3-SLAM (TPU-native)")
    p.add_argument("--image_dir", required=True, help="directory of frames")
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--output_dir", default=None, help="export trajectory here")
    p.add_argument("--headless", action="store_true", help="disable the viewer")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from da3slam_tpu.inout import load_config
    from da3slam_tpu.slam import SLAMSolver

    config = load_config(args.config) if args.config else {
        "Weights": {"DA3": "small"},
        "Model": {"chunk_size": 15, "overlap_size": 1, "keyframe_interval": 1,
                  "sleep_between_chunk": 0, "port": 8080},
    }

    solver = SLAMSolver(args.image_dir, config, viewer=None if args.headless else "auto")
    solver.run()

    if args.output_dir:
        from da3slam_tpu.inout import save_camera_poses

        poses, intrs = solver.trajectory()
        save_camera_poses(args.output_dir, poses, intrs)
        print(f"Trajectory ({len(poses)} frames) exported to {args.output_dir}")

    if solver.viewer is not None:
        print("SLAM finished; viewer still running (ctrl-c to exit)")
        try:
            while True:
                time.sleep(1)
        except KeyboardInterrupt:
            pass


if __name__ == "__main__":
    main()

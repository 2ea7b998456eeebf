"""Trajectory evaluation CLI: ATE/RPE between two camera_poses.txt files.

    python -m da3slam_tpu.cli.evaluate --est out/camera_poses.txt \
        --gt gt/camera_poses.txt [--align sim3|se3|none] [--rpe_delta 1]
"""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="ATE/RPE trajectory evaluation")
    p.add_argument("--est", required=True, help="estimated camera_poses.txt")
    p.add_argument("--gt", required=True, help="ground-truth camera_poses.txt")
    p.add_argument("--align", default="sim3", choices=["sim3", "se3", "none"])
    p.add_argument("--rpe_delta", type=int, default=1)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from da3slam_tpu.inout.trajectory import load_camera_poses
    from da3slam_tpu.slam.evaluate import evaluate_trajectory

    est = load_camera_poses(args.est)
    gt = load_camera_poses(args.gt)
    res = evaluate_trajectory(est, gt, align=args.align, rpe_delta=args.rpe_delta)
    print(json.dumps(res._asdict(), indent=2))


if __name__ == "__main__":
    main()

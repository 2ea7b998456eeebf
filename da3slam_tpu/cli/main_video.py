"""One-shot video → SLAM driver.

The reference runs its pipeline as three separate commands (decode frames —
preprocess_video2frame.py, optional crop/brightness — preprocess_crop.py /
preprocess_brightness.py, then main_slam.py or da3_streaming.py over the
frame directory).  This CLI chains the same stages behind one command:

    python -m da3slam_tpu.cli.main_video --video clip.mp4 --output_dir out/ \
        [--config configs/config1.yaml] [--stride 2] [--crop c3vd2] \
        [--brightness] [--mode streaming|slam] [--traj_formats tum,kitti]

Stages write into <output_dir>/frames (and /cropped, /normalized when the
corresponding stages are enabled) so intermediate artifacts stay
inspectable, exactly as the three-command reference flow leaves them.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Video → DA3-SLAM in one command")
    p.add_argument("--video", required=True, help="input video file")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--config", default=None, help="YAML config (reference schema)")
    p.add_argument("--stride", type=int, default=1, help="frame sample stride")
    p.add_argument("--crop", default=None, metavar="PRESET",
                   help="ratio-square crop preset (uka1 / c3vd2) or a float ratio")
    p.add_argument("--brightness", action="store_true",
                   help="LAB/CLAHE brightness normalization pass")
    p.add_argument("--mode", default="streaming", choices=["streaming", "slam"],
                   help="streaming = disk-spill long-sequence pipeline (default); "
                   "slam = in-memory SLAMSolver with live viewer")
    p.add_argument("--traj_formats", default=None,
                   help="extra trajectory exports (streaming mode): tum,kitti")
    p.add_argument("--headless", action="store_true",
                   help="slam mode: no viewer")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    out_root = Path(args.output_dir)
    out_root.mkdir(parents=True, exist_ok=True)

    from da3slam_tpu.preprocess.host import (
        adjust_brightness_in_folder,
        crop_images_in_folder,
        video_to_frames,
    )

    frames_dir = out_root / "frames"
    n = video_to_frames(args.video, frames_dir, stride=args.stride)
    if n == 0:
        raise SystemExit(f"no frames decoded from {args.video}")
    image_dir = frames_dir

    if args.crop is not None:
        from da3slam_tpu.preprocess.host import CROP_PRESETS

        cropped = out_root / "cropped"
        try:
            ratio = float(args.crop)  # only the parse is inside the try —
            # wrapping the crop call would mask real crop errors by
            # re-running with dataset=<numeric string>
        except ValueError:
            ratio = None
        if ratio is not None:
            if not 0.0 < ratio <= 1.0:
                raise SystemExit(f"--crop ratio must be in (0, 1], got {ratio}")
            crop_images_in_folder(image_dir, cropped, ratio=ratio)
        else:
            if args.crop not in CROP_PRESETS:
                raise SystemExit(
                    f"unknown crop preset {args.crop!r}; available: "
                    f"{', '.join(sorted(CROP_PRESETS))} or a float ratio"
                )
            crop_images_in_folder(image_dir, cropped, dataset=args.crop)
        image_dir = cropped

    if args.brightness:
        normalized = out_root / "normalized"
        adjust_brightness_in_folder(image_dir, normalized)
        image_dir = normalized

    from da3slam_tpu.inout import load_config
    from da3slam_tpu.inout.trajectory import validate_extra_formats

    config = load_config(args.config) if args.config else {"Weights": {"DA3": "small"}}
    traj_formats = validate_extra_formats(
        f.strip() for f in (args.traj_formats or "").split(",") if f.strip()
    )

    if args.mode == "streaming":
        if traj_formats:
            config.setdefault("Model", {})["traj_formats"] = list(traj_formats)
        from da3slam_tpu.slam.streaming import DA3Streaming

        run_dir = out_root / "slam"
        streaming = DA3Streaming(str(image_dir), str(run_dir), config)
        streaming.run()
        streaming.close()
        print(f"outputs in {run_dir}")
    else:
        from da3slam_tpu.inout.trajectory import save_camera_poses
        from da3slam_tpu.slam.solver import SLAMSolver

        solver = SLAMSolver(
            str(image_dir), config, viewer=None if args.headless else "auto"
        )
        solver.run()
        poses, intrs = solver.trajectory()
        run_dir = out_root / "slam"
        save_camera_poses(run_dir, poses, intrs, extra_formats=traj_formats)
        print(f"Trajectory ({len(poses)} frames) exported to {run_dir}")


if __name__ == "__main__":
    main()

"""Preprocessing CLIs (reference preprocess_video2frame.py /
preprocess_crop.py / preprocess_brightness.py) under one entry point:

  python -m da3slam_tpu.cli.preprocess video2frame --video v.mp4 --output frames/
  python -m da3slam_tpu.cli.preprocess crop --input frames/ --output cropped/ --dataset uka1
  python -m da3slam_tpu.cli.preprocess brightness --input cropped/ --output norm/
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Frame-ingest preprocessing")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("video2frame", help="decode video to numbered JPEGs")
    v.add_argument("--video", required=True)
    v.add_argument("--output", required=True)
    v.add_argument("--stride", type=int, default=1)

    c = sub.add_parser("crop", help="ratio-square crop a folder")
    c.add_argument("--input", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--dataset", default="uka1", choices=["uka1", "c3vd2"])
    c.add_argument("--ratio", type=float, default=None)
    c.add_argument("--x_offset", type=int, default=None)

    b = sub.add_parser("brightness", help="LAB brightness normalisation")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--bright_threshold", type=float, default=230)
    b.add_argument("--dark_threshold", type=float, default=30)
    b.add_argument("--bright_reduction", type=float, default=0.7)
    b.add_argument("--dark_enhancement", type=float, default=1.5)
    b.add_argument("--clip_limit", type=float, default=2.0)
    b.add_argument("--grid_size", type=int, default=8)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from da3slam_tpu.preprocess import host

    if args.cmd == "video2frame":
        host.video_to_frames(args.video, args.output, args.stride)
    elif args.cmd == "crop":
        host.crop_images_in_folder(
            args.input, args.output, args.dataset, args.ratio, args.x_offset
        )
    elif args.cmd == "brightness":
        host.adjust_brightness_in_folder(
            args.input, args.output,
            bright_threshold=args.bright_threshold,
            dark_threshold=args.dark_threshold,
            bright_reduction=args.bright_reduction,
            dark_enhancement=args.dark_enhancement,
            clip_limit=args.clip_limit,
            grid_size=args.grid_size,
        )


if __name__ == "__main__":
    main()

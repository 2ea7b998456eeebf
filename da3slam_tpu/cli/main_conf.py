"""Confidence-map inspection CLI (reference main_conf.py:134-154).

One-chunk inference → per-frame confidence histograms on stdout, 3-panel
comparison PNGs, and an all-frames heatmap grid.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Confidence-map visualisation")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--model", default="small")
    p.add_argument("--chunk_size", type=int, default=8)
    p.add_argument("--output_dir", default="conf_viz")
    p.add_argument("--process_res", type=int, default=504)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from da3slam_tpu.inout import load_image_paths
    from da3slam_tpu.models import DepthAnything3
    from da3slam_tpu.viz.confidence import (
        create_confidence_comparison,
        create_overall_heatmap,
        print_conf_stats,
    )

    paths = load_image_paths(args.image_dir)[: args.chunk_size]
    if not paths:
        raise SystemExit(f"no images in {args.image_dir}")

    model = DepthAnything3.from_pretrained(args.model)
    pred = model.inference(image=paths, use_ray_pose=True, process_res=args.process_res)

    out = Path(args.output_dir)
    for i in range(len(paths)):
        print_conf_stats(pred.conf[i], i)
        create_confidence_comparison(
            pred.processed_images[i], pred.conf[i], out / f"comparison_{i:03d}.png"
        )
    create_overall_heatmap(pred.conf, out / "heatmap_grid.png")
    print(f"figures written to {out}/")


if __name__ == "__main__":
    main()

"""Minimal DA3 inference example (the reference's usage notebook,
utils/da3.ipynb cells 2-4, as a script).

Runs a chunk of frames through the model at the standard settings, prints
the prediction contract, visualises one depth map, and exports the scene.

    python examples/minimal_inference.py --image_dir frames/ [--model small]
"""

import argparse
import sys
from pathlib import Path

# allow running straight from a checkout without pip-installing the package
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--image_dir", required=True)
    p.add_argument("--model", default="small")
    p.add_argument("--n_frames", type=int, default=4)
    p.add_argument("--out", default="example_out")
    args = p.parse_args()

    import numpy as np

    from da3slam_tpu.inout import load_image_paths
    from da3slam_tpu.models import DepthAnything3

    paths = load_image_paths(args.image_dir)[: args.n_frames]
    model = DepthAnything3.from_pretrained(args.model)

    prediction = model.inference(
        image=paths,
        process_res=504,
        process_res_method="upper_bound_resize",
        export_dir=args.out,
        export_format="mini_npz",
    )

    print("prediction contract:")
    for name in ("processed_images", "depth", "conf", "extrinsics", "intrinsics"):
        arr = getattr(prediction, name)
        print(f"  {name:18s} {arr.shape} {arr.dtype}")
    d = prediction.depth[0]
    print(f"depth[0]: min {d.min():.3f}  median {np.median(d):.3f}  max {d.max():.3f}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].imshow(prediction.processed_images[0])
    axes[0].set_title("input")
    im = axes[1].imshow(d, cmap="turbo")
    axes[1].set_title("depth")
    fig.colorbar(im, ax=axes[1])
    for ax in axes:
        ax.axis("off")
    fig.savefig(f"{args.out}/depth_vis.png", dpi=110, bbox_inches="tight")
    print(f"wrote {args.out}/prediction.npz and {args.out}/depth_vis.png")


if __name__ == "__main__":
    main()

"""Probe the known-extrinsics conditioning path (the reference's
utils/da3_camara.py:21-151 experiment): run a chunk twice — free inference
vs conditioned on known poses with scale alignment — and report the depth
consistency between the two.

    python examples/extrinsics_conditioning.py --image_dir frames/
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
    p.add_argument("--process_res", type=int, default=504)
    args = p.parse_args()

    import numpy as np

    from da3slam_tpu.inout import load_image_paths
    from da3slam_tpu.models import DepthAnything3

    paths = load_image_paths(args.image_dir)[: args.n_frames]
    model = DepthAnything3.from_pretrained(args.model)

    # pass 1: free inference
    free = model.inference(image=paths, process_res=args.process_res)
    print("free inference extrinsics (translation norms):",
          np.linalg.norm(free.extrinsics[:, :, 3], axis=-1).round(4))

    # pass 2: condition on the first pass's poses, rescaled 2x — the model
    # output must adopt the provided poses and rescale depth to match
    known = free.extrinsics.copy()
    known[:, :, 3] *= 2.0
    cond = model.inference(
        image=paths,
        process_res=args.process_res,
        extrinsics=known,
        align_to_input_ext_scale=True,
    )
    print("conditioned extrinsics match input:",
          bool(np.allclose(cond.extrinsics, known)))
    ratio = np.median(cond.depth / np.maximum(free.depth, 1e-6))
    print(f"depth rescale factor (expect ~2.0): {ratio:.3f}")


if __name__ == "__main__":
    main()

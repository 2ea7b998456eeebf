"""Probe the real-model SLAMSolver end-to-end rate (VERDICT r4 next #1).

Times SLAMSolver.run() — JPEG decode through ImagePrefetcher overlapping
device compute, real DA3-SMALL forward, on-device alignment — over a
synthetic JPEG frame directory, with and without device-resident
predictions, to size the metric before it lands in bench.py.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_jpeg_dir(td: str, n_frames: int, hw=(504, 504)) -> str:
    from PIL import Image

    from da3slam_tpu.utils.synthetic import (
        default_intrinsics,
        make_trajectory,
        render_rgb_sequence,
    )

    frames = render_rgb_sequence(make_trajectory(n_frames), default_intrinsics(hw), hw)
    for i, f in enumerate(np.asarray(frames)):
        Image.fromarray(f).save(f"{td}/{i:06d}.jpg", quality=90)
    return td


def run_solver(image_dir: str, model, device_resident: bool, n_frames: int) -> float:
    from da3slam_tpu.slam import SLAMSolver

    config = {
        "Model": {
            "chunk_size": 16,
            "overlap_size": 1,
            "keyframe_interval": 1,
            "sleep_between_chunk": 0,
            "device_resident": device_resident,
        }
    }
    solver = SLAMSolver(image_dir, config, model=model, viewer=None)
    t0 = time.perf_counter()
    solver.run()
    dt = time.perf_counter() - t0
    return n_frames / dt


def main() -> None:
    from da3slam_tpu.models import DepthAnything3

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 106
    model = DepthAnything3.from_pretrained("small")
    with tempfile.TemporaryDirectory() as td:
        make_jpeg_dir(td, n_frames)
        # warmup run (compile) then timed
        for mode in (True, False):
            fps_warm = run_solver(td, model, mode, n_frames)
            fps = run_solver(td, model, mode, n_frames)
            print(f"device_resident={mode}: warm={fps_warm:.2f} timed={fps:.2f} FPS")


if __name__ == "__main__":
    main()

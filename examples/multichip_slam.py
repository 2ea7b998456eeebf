"""Multi-chip SLAM demo: window forwards data-parallel over a device mesh.

Runs the device-resident SLAM pipeline with its window forwards sharded
over the mesh's ``dp`` axis (``slam/pipeline.run_pipeline_dp``) and checks
the trajectory matches the single-stream scan.  On real hardware pass
nothing — it uses every visible chip; with no multi-chip hardware,
``--virtual 8`` simulates an 8-device mesh on CPU (same code path the
driver's ``dryrun_multichip`` validates).

    python examples/multichip_slam.py --virtual 8
    python examples/multichip_slam.py            # all real chips
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="simulate N CPU devices instead of real chips")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--chunk_size", type=int, default=4)
    args = ap.parse_args()

    if args.virtual:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from da3slam_tpu.models import DepthAnything3
    from da3slam_tpu.parallel import make_mesh
    from da3slam_tpu.slam.alignment import AlignmentConfig
    from da3slam_tpu.slam.pipeline import run_streaming_slam

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, tp=1)
    print(f"devices: {n_dev} × {jax.devices()[0].platform}, mesh dp={n_dev}")

    model = DepthAnything3.from_pretrained("tiny" if args.virtual else "small")
    rng = np.random.default_rng(0)
    base = rng.integers(40, 200, size=(56, 70, 3))
    frames = np.stack([
        np.clip(np.roll(base, i * 2, axis=1) + rng.integers(0, 20, (56, 70, 3)), 0, 255)
        for i in range(args.frames)
    ]).astype(np.uint8)

    kw = dict(chunk_size=args.chunk_size, overlap=1, process_hw=(56, 70),
              dtype=jnp.float32,
              align_config=AlignmentConfig(method="umeyama"))
    single = run_streaming_slam(model.params, frames, model.cfg, **kw)
    multi = run_streaming_slam(model.params, frames, model.cfg, mesh=mesh, **kw)

    err = np.abs(
        np.asarray(single.extrinsics_global) - np.asarray(multi.extrinsics_global)
    ).max()
    print(f"windows: {single.depth.shape[0]}, "
          f"max |Δpose| single vs {n_dev}-chip: {err:.2e}")
    assert err < 1e-3
    print("multi-chip SLAM OK")


if __name__ == "__main__":
    main()

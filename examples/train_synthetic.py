"""Fine-tuning demo: train the DA3 model on synthetic ground-truth depth.

Generates corner-room frames with exact depth/pose supervision, runs the
distributed train step (dp×tp mesh) for a few hundred steps, checkpoints
with orbax, restores, and reports the loss curve — the whole training
subsystem in one command.  Runs on whatever devices exist (one TPU chip, or
a virtual CPU mesh under XLA_FLAGS=--xla_force_host_platform_device_count=8).

    python examples/train_synthetic.py [--steps 200] [--tier tiny]
"""

import argparse
import sys
from pathlib import Path

# allow running straight from a checkout without pip-installing the package
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--tier", default="tiny")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--views", type=int, default=3)
    p.add_argument("--size", type=int, default=56)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--ckpt_dir", default=None)
    args = p.parse_args()

    import numpy as np

    from da3slam_tpu.models import get_preset
    from da3slam_tpu.parallel import make_mesh, make_train_step
    from da3slam_tpu.utils.synthetic import make_trajectory, render_depth

    cfg = get_preset(args.tier)
    mesh = make_mesh()
    print(f"mesh: {mesh.devices.shape} (dp, tp)")
    init_fn, step_fn, place_batch = make_train_step(cfg, mesh, learning_rate=args.lr)
    state = init_fn(seed=0)

    # synthetic supervision: camera trajectories through the corner room,
    # RGB = simple shading of depth (the model must learn shape-from-shading)
    H = W = args.size
    K = np.array([[W, 0, W / 2], [0, W, H / 2], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(0)

    def make_batch(seed):
        images = np.zeros((args.batch, args.views, H, W, 3), np.float32)
        depths = np.zeros((args.batch, args.views, H, W), np.float32)
        exts = np.zeros((args.batch, args.views, 3, 4), np.float32)
        for b in range(args.batch):
            traj = make_trajectory(args.views, seed=seed * 97 + b)
            E0 = np.vstack([traj[0], [0, 0, 0, 1]])
            for v in range(args.views):
                d = render_depth(traj[v], K, (H, W))
                depths[b, v] = d
                shade = 1.0 / d
                shade = (shade - shade.min()) / (np.ptp(shade) + 1e-6)
                images[b, v] = np.stack([shade] * 3, -1) * 2 - 1
                E = np.vstack([traj[v], [0, 0, 0, 1]]) @ np.linalg.inv(E0)
                exts[b, v] = E[:3]
        return {"images": images, "depth": depths, "extrinsics": exts}

    losses = []
    for step in range(args.steps):
        batch = place_batch(make_batch(step % 32))
        state, loss = step_fn(state, batch)
        losses.append(float(loss))
        if step % max(args.steps // 10, 1) == 0:
            print(f"step {step:4d}  loss {losses[-1]:.4f}")

    print(f"loss: first 10 avg {np.mean(losses[:10]):.4f} → "
          f"last 10 avg {np.mean(losses[-10:]):.4f}")

    if args.ckpt_dir:
        from da3slam_tpu.parallel.checkpoint import restore_train_state, save_train_state

        save_train_state(args.ckpt_dir, state)
        restored = restore_train_state(args.ckpt_dir, init_fn(seed=1))
        print(f"checkpoint roundtrip ok (step {int(restored.step)})")

    improved = np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.9
    print("TRAINING:", "PASS (loss decreased >10%)" if improved else "FAIL")
    raise SystemExit(0 if improved else 1)


if __name__ == "__main__":
    main()

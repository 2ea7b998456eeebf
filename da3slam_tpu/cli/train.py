"""Training CLI: fit / fine-tune a DA3 model with the parallel train steps.

    # data-parallel (windows sharded over dp), synthetic smoke data
    python -m da3slam_tpu.cli.train --preset tiny --mode dp --steps 50 \
        --batch 2 --views 4 --hw 56 56 --ckpt_dir runs/exp1 --ckpt_every 25

    # sequence-parallel (one window's views sharded, ring attention)
    python -m da3slam_tpu.cli.train --preset tiny --mode sp --views 4

    # pipeline-parallel (encoder stages sharded, GPipe microbatches)
    python -m da3slam_tpu.cli.train --preset tiny --mode pp --stages 2 \
        --batch 3 --views 2

    # resume from the latest checkpoint in --ckpt_dir
    python -m da3slam_tpu.cli.train ... --ckpt_dir runs/exp1 --resume

The reference has no training capability at all (SURVEY.md §4: no tests, no
training scripts — its model is a frozen pip import, reference solver.py:58);
this entry point surfaces the framework's native training subsystem
(parallel/train.py dp/sp/pp steps, parallel/checkpoint.py orbax state) the
way the inference CLIs surface the SLAM stack.

Data: ``--data DIR`` consumes ``.npz`` shards, each with ``images``
[B, N, H, W, 3] float32 (normalised), ``depth`` [B, N, H, W] and
``extrinsics`` [B, N, 3, 4], cycled per step.  Without ``--data`` a
synthetic batch (parallel/train.synthetic_batch) makes the CLI a
self-contained smoke/bring-up harness.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DA3 training (dp / sp / pp)")
    p.add_argument("--preset", default="tiny",
                   help="model preset (tiny/small/base/large/giant)")
    p.add_argument("--mode", default="dp", choices=["dp", "sp", "pp"],
                   help="parallelism: dp = windows sharded, sp = views "
                   "sharded + ring attention, pp = encoder stages + GPipe")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=2,
                   help="dp: windows per step; pp: GPipe microbatches per "
                   "step; sp trains one window per step (views sharded)")
    p.add_argument("--views", type=int, default=4, help="frames per window")
    p.add_argument("--hw", type=int, nargs=2, default=(56, 56),
                   metavar=("H", "W"))
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--devices", type=int, default=None,
                   help="mesh size (default: all visible devices for dp/sp; "
                   "--stages for pp)")
    p.add_argument("--tp", type=int, default=None,
                   help="dp mode: tensor-parallel axis size (make_mesh)")
    p.add_argument("--stages", type=int, default=None,
                   help="pp mode: pipeline stages (must divide model depth)")
    p.add_argument("--data", default=None,
                   help="directory of .npz shards (images/depth/extrinsics); "
                   "omit for synthetic smoke data")
    p.add_argument("--ckpt_dir", default=None,
                   help="orbax checkpoint directory (enables saving)")
    p.add_argument("--ckpt_every", type=int, default=100)
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint from --ckpt_dir")
    p.add_argument("--log_every", type=int, default=10)
    return p


def _mesh_for(args, jax, np):
    from jax.sharding import Mesh

    from da3slam_tpu.parallel import make_mesh

    devs = jax.devices()
    if args.mode == "dp":
        n = args.devices or len(devs)
        return make_mesh(n, tp=args.tp), None
    if args.mode == "sp":
        n = args.devices or len(devs)
        if args.views % n:
            raise SystemExit(
                f"--views {args.views} must divide by the sp mesh size {n}"
            )
        return Mesh(np.asarray(devs[:n]), ("sp",)), None
    n = args.stages or args.devices or len(devs)
    return Mesh(np.asarray(devs[:n]), ("pp",)), n


def _shape_batch(mode: str, batch: dict) -> dict:
    """Adapt a [B, N, ...] shard to the mode's step contract."""
    if mode == "dp":
        return batch
    if mode == "sp":  # one window per step: views are the parallel axis
        return {k: v[0] for k, v in batch.items()}
    # pp consumes microbatches of windows; extrinsics unused by its loss
    return {"images": batch["images"], "depth": batch["depth"]}


def _data_iter(args, cfg):
    import numpy as np

    from da3slam_tpu.parallel.train import synthetic_batch

    if args.data is None:
        def gen():
            step = 0
            while True:
                yield _shape_batch(
                    args.mode,
                    synthetic_batch(cfg, args.batch, args.views,
                                    tuple(args.hw), seed=args.seed + step),
                )
                step += 1
        return gen()

    shards = sorted(Path(args.data).glob("*.npz"))
    if not shards:
        raise SystemExit(f"--data {args.data}: no .npz shards found")

    def gen():
        while True:
            for f in shards:
                with np.load(f) as z:
                    batch = {k: np.asarray(z[k], np.float32)
                             for k in ("images", "depth", "extrinsics")}
                yield _shape_batch(args.mode, batch)
    return gen()


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    import jax
    import numpy as np

    from da3slam_tpu.models.config import get_preset
    from da3slam_tpu.parallel.checkpoint import (
        restore_train_state,
        save_train_state,
    )
    from da3slam_tpu.parallel.train import (
        make_pp_train_step,
        make_sp_train_step,
        make_train_step,
    )

    cfg = get_preset(args.preset)
    mesh, n_stages = _mesh_for(args, jax, np)
    if args.mode == "dp" and args.batch % mesh.shape["dp"]:
        raise SystemExit(
            f"--batch {args.batch} must divide by the dp mesh axis "
            f"{mesh.shape['dp']} (set --devices/--tp to shape the mesh)"
        )
    if args.mode == "dp":
        init_fn, step_fn, place = make_train_step(cfg, mesh,
                                                  learning_rate=args.lr)
    elif args.mode == "sp":
        init_fn, step_fn, place = make_sp_train_step(
            cfg, mesh, axis="sp", learning_rate=args.lr
        )
    else:
        init_fn, step_fn, place = make_pp_train_step(
            cfg, mesh, n_stages, learning_rate=args.lr
        )

    state = init_fn(seed=args.seed)
    ckpt_dir = Path(args.ckpt_dir) if args.ckpt_dir else None
    if args.resume:
        if ckpt_dir is None:
            raise SystemExit("--resume needs --ckpt_dir")
        latest = ckpt_dir / "latest"
        if not latest.exists():
            raise SystemExit(f"--resume: no checkpoint at {latest}")
        state = restore_train_state(latest, state)
        print(f"resumed step {int(state.step)} from {latest}", flush=True)

    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(json.dumps({
        "preset": args.preset, "mode": args.mode,
        "mesh": {k: int(v) for k, v in mesh.shape.items()},
        "params": int(n_params), "start_step": int(state.step),
    }), flush=True)

    data = _data_iter(args, cfg)
    t0 = time.perf_counter()
    losses = []
    start = int(state.step)
    for _ in range(start, args.steps):
        state, loss = step_fn(state, place(next(data)))
        step = int(state.step)
        losses.append(float(loss))
        if args.log_every and step % args.log_every == 0:
            dt = time.perf_counter() - t0
            print(json.dumps({
                "step": step, "loss": round(float(loss), 6),
                "steps_per_s": round((step - start) / max(dt, 1e-9), 3),
            }), flush=True)
        if ckpt_dir is not None and args.ckpt_every and \
                step % args.ckpt_every == 0:
            save_train_state(ckpt_dir / "latest", state)
            print(f"checkpoint @ step {step} -> {ckpt_dir/'latest'}",
                  flush=True)

    if ckpt_dir is not None and int(state.step) != start:
        save_train_state(ckpt_dir / "latest", state)
    if losses:
        print(json.dumps({
            "final_step": int(state.step),
            "final_loss": round(losses[-1], 6),
            "first_loss": round(losses[0], 6),
        }), flush=True)


if __name__ == "__main__":
    main()

"""Training checkpoint save / restore (orbax).

The reference only ever *reads* model checkpoints (SURVEY.md §5.4); the
training path here needs durable state: params + optimizer state + step,
written atomically with orbax so interrupted runs resume exactly.
"""

from __future__ import annotations

from pathlib import Path

import jax

from da3slam_tpu.parallel.train import TrainState


def save_train_state(path: str | Path, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_train_state(path: str | Path, template: TrainState) -> TrainState:
    """Restore into the structure (shapes/shardings) of ``template`` — build
    the template with the same config/mesh via ``make_train_step(...)[0]()``."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)

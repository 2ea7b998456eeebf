"""Device mesh, sharding rules, and the distributed train step.

The reference has no distributed execution at all (SURVEY.md §2.2); this
package supplies the TPU-native scaling story: a ``jax.sharding.Mesh`` with
``(dp, tp)`` axes, parameter/activation sharding rules for the DA3 model
(tensor parallelism over attention heads + MLP hidden, data parallelism over
chunk windows, sequence-sharded activations between blocks), ``pjit``
training steps (dp/tp and view-sharded sp) whose collectives ride ICI, ring
attention, and a GPipe pipeline-parallel encoder (``pp_forward``) whose
stage weights shard over a ``pp`` axis.  Multi-chip SLAM inference lives in
``slam/pipeline.run_pipeline_dp`` (window forwards over dp).
"""

from da3slam_tpu.parallel.mesh import make_mesh  # noqa: F401
from da3slam_tpu.parallel.sharding import param_shardings, batch_sharding  # noqa: F401
from da3slam_tpu.parallel.train import (  # noqa: F401
    TrainState,
    make_pp_train_step,
    make_sp_train_step,
    make_train_step,
    synthetic_batch,
)

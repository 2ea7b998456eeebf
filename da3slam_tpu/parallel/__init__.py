"""Device mesh, sharding rules, and the distributed train step.

The reference has no distributed execution at all (SURVEY.md §2.2); this
package supplies the TPU-native scaling story: a ``jax.sharding.Mesh`` with
``(dp, tp)`` axes, parameter/activation sharding rules for the DA3 model
(tensor parallelism over attention heads + MLP hidden, data parallelism over
chunk windows, sequence-sharded activations between blocks), and a ``pjit``
training step whose collectives ride ICI.
"""

from da3slam_tpu.parallel.mesh import make_mesh  # noqa: F401
from da3slam_tpu.parallel.sharding import param_shardings, batch_sharding  # noqa: F401
from da3slam_tpu.parallel.train import (  # noqa: F401
    TrainState,
    make_sp_train_step,
    make_train_step,
    synthetic_batch,
)

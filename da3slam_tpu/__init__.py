"""da3slam_tpu — a TPU-native dense-SLAM framework.

Re-implements the capabilities of the DA3-SLAM reference pipeline
(monocular dense SLAM driven by a DepthAnythingV3-style multi-view
transformer) as an idiomatic JAX / XLA / Pallas framework:

- ``core``      : SE(3)/Sim(3) algebra + pinhole geometry (pure JAX)
- ``models``    : the DA3 multi-view ViT (encoder, DPT depth head, camera head)
- ``ops``       : registration + alignment kernels (ICP, Umeyama, IRLS) and
                  Pallas TPU kernels (flash attention, fused preprocess)
- ``parallel``  : device mesh / sharding definitions and the pjit train step
- ``slam``      : chunked streaming orchestrators (solver, long-sequence
                  streaming, device-resident scan pipeline)
- ``inout``     : config / image / PLY / trajectory I/O
- ``viz``       : viser viewer + confidence visualisation
- ``cli``       : entry points mirroring the reference CLIs
"""

__version__ = "0.1.0"

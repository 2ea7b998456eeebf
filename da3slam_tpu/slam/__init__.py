"""SLAM orchestration: chunked streaming trackers over the DA3 model.

Two orchestrators mirror the reference's pair (SURVEY.md §1 L5):

- :class:`da3slam_tpu.slam.solver.SLAMSolver` — in-memory streaming with
  single-frame-overlap alignment and live viewer updates (reference
  solver.py).
- :class:`da3slam_tpu.slam.streaming.DA3Streaming` — disk-spilling
  long-sequence variant with Sim(3) accumulation and PLY/pose export
  (reference utils/da3_streaming.py).

Plus the TPU-native addition: :mod:`da3slam_tpu.slam.pipeline`, a fully
device-resident ``lax.scan`` over chunk windows (model forward + scale +
ICP + pose chaining in one compiled program) used for benchmarking and
offline throughput runs.
"""

from da3slam_tpu.slam.chunks import make_chunk_indices, make_image_chunks  # noqa: F401
from da3slam_tpu.slam.alignment import (  # noqa: F401
    align_chunk_single_overlap,
    chain_extrinsics,
    AlignmentConfig,
)
from da3slam_tpu.slam.solver import SLAMSolver  # noqa: F401

"""Mesh construction: ``(dp, tp)`` over whatever devices exist.

Single chip → trivial 1x1 mesh, so every code path is mesh-aware from the
start and multi-chip drops in without API change (SURVEY.md §5.8).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: int | None = None,
    tp: int | None = None,
    devices=None,
) -> Mesh:
    """Build a ``(dp, tp)`` mesh.

    ``tp`` defaults dp-major: 2-way tensor parallelism once there are ≥4
    devices (every DA3 tier's head count divides by 2), data parallelism
    over chunk windows takes the rest.  Pass ``tp`` explicitly for wider
    model sharding on the big tiers.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh(n_devices={n_devices}) but only {len(devices)} "
                f"devices are visible ({devices[0].platform}); a silently "
                "truncated mesh would validate nothing"
            )
        devices = devices[:n_devices]
    n = len(devices)
    if tp is None:
        tp = 2 if (n >= 4 and n % 2 == 0) else 1
    if n % tp != 0:
        raise ValueError(f"tp={tp} must divide device count {n}")
    dp = n // tp
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))

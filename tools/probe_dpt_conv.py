#!/usr/bin/env python
"""Probe: layout strategies for the DPT output-head convs at 504^2.

The r3 trace shows the head2 conv (3x3, 64->32 @ [16,504,504]) at 6.19 ms
(~24 TF/s — NHWC puts the 32 output channels on the 128-lane minor dim,
wasting 3/4 of the MXU) and head_out (1x1, 32->8) at 2.25 ms.  NCHW puts
PIXELS on lanes and channels on sublanes, so the conv's matmul runs at
full width regardless of channel count.

Configs (<=3 kernel compiles):
  1. NHWC conv chain head2+head_out (current)
  2. NCHW conv chain (transpose in, transpose out)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N, H, W = 16, 504, 504
C1, C2, C3 = 64, 32, 8
REPS = 3


def _force(x):
    float(np.asarray(x).ravel()[-1])


def timed(name, fn, *args):
    _force(fn(*args))
    best = np.inf
    for _ in range(REPS):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best * 1e3:8.2f} ms", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, H, W, C1)), jnp.bfloat16)
    k1 = jnp.asarray(rng.normal(size=(3, 3, C1, C2)) * 0.1, jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(size=(C2,)), jnp.bfloat16)
    k2 = jnp.asarray(rng.normal(size=(1, 1, C2, C3)) * 0.1, jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(size=(C3,)), jnp.bfloat16)

    @jax.jit
    def nhwc(x, k1, b1, k2, b2):
        y = jax.lax.conv_general_dilated(
            x, k1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b1
        y = jax.nn.relu(y)
        y = jax.lax.conv_general_dilated(
            y, k2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b2
        return y[:, :2, :2]

    @jax.jit
    def nchw(x, k1, b1, k2, b2):
        xc = jnp.transpose(x, (0, 3, 1, 2))
        y = jax.lax.conv_general_dilated(
            xc, jnp.transpose(k1, (3, 2, 0, 1)), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + b1[None, :, None, None]
        y = jax.nn.relu(y)
        y = jax.lax.conv_general_dilated(
            y, jnp.transpose(k2, (3, 2, 0, 1)), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + b2[None, :, None, None]
        return y[:, :, :2, :2]

    @jax.jit
    def shiftdot(x, k1, b1, k2, b2):
        # pixels-on-lanes: 3x3 conv = 9 shifted [C_in -> C_out] dots over a
        # [n, C, H*W] layout; output width = pixels (full MXU lanes), the
        # narrow C_out rides the sublane dim instead of wasting lanes
        xc = jnp.transpose(x, (0, 3, 1, 2))  # [n, C1, H, W]
        xp = jnp.pad(xc, ((0, 0), (0, 0), (1, 1), (1, 1)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                xs = jax.lax.slice(
                    xp, (0, 0, dy, dx), (N, C1, dy + H, dx + W)
                ).reshape(N, C1, H * W)
                w = k1[dy, dx]  # [C1, C2]
                d = jax.lax.dot_general(
                    w.T, xs, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [C2, n, H*W]
                acc = d if acc is None else acc + d
        y = jnp.transpose(acc, (1, 0, 2)) + b1[None, :, None].astype(jnp.float32)
        y = jax.nn.relu(y).astype(x.dtype)  # [n, C2, HW]
        o = jax.lax.dot_general(
            k2[0, 0].T, y, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C3, n, HW]
        o = jnp.transpose(o, (1, 0, 2)) + b2[None, :, None].astype(jnp.float32)
        return o.reshape(N, C3, H, W)[:, :, :2, :2].astype(x.dtype)

    a = timed("NHWC head2+head_out", nhwc, x, k1, b1, k2, b2)
    b = timed("NCHW head2+head_out", nchw, x, k1, b1, k2, b2)
    c = timed("shift-dot head2+head_out", shiftdot, x, k1, b1, k2, b2)
    # parity
    ya = np.asarray(nhwc(x, k1, b1, k2, b2), np.float32)
    yc = np.transpose(
        np.asarray(shiftdot(x, k1, b1, k2, b2), np.float32), (0, 2, 3, 1)
    )
    print("NHWC-vs-shiftdot max abs delta:", np.abs(ya - yc).max(), flush=True)


if __name__ == "__main__":
    main()

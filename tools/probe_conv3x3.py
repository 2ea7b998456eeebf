#!/usr/bin/env python
"""Tap-panel Pallas conv (ops/conv3x3.py) vs XLA at the DPT head shapes.

Isolated-dispatch numbers only bound the kernel itself — in-model the
fusion context dominates (ROADMAP r3 caveat), so the decision metric is
the whole-model probe (tools/profile_small.py / profile_large.py after the
dpt.py integration).  Chained in lax.scan per the verify-skill timing
discipline.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from da3slam_tpu.ops.conv3x3 import conv3x3_fused

SHAPES = [  # (label, N, H, W, C, COUT)
    ("head2-small", 16, 504, 504, 64, 32),
    ("head2-large", 16, 504, 504, 128, 32),
    ("head1-large", 16, 288, 288, 256, 128),
]


def _force(x):
    float(np.asarray(x).ravel()[-1])


def run(label, N, H, W, C, COUT, chain=8, reps=3):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, H, W, C)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, C, COUT)) * 0.1, jnp.float32)
    b = jnp.zeros((COUT,), jnp.float32)
    kb = jnp.asarray(rng.normal(size=(3, 3, COUT, C)) * 0.1, jnp.float32)
    flops = 2.0 * 9 * C * COUT * H * W * N * chain

    def xla_conv(x, k, b):
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(x.dtype)

    for name, fn in (
        ("xla", lambda x: xla_conv(x, k, b)),
        ("pallas", lambda x: conv3x3_fused(k, b, x)),
    ):
        @jax.jit
        def chained(x0, fn=fn):
            def body(c, _):
                y = fn(c)  # [N,H,W,COUT]
                # map back to C channels so the chain is shape-stable
                c2 = xla_conv(y, kb, jnp.zeros((C,), jnp.float32))
                return c2.astype(c.dtype), None

            c, _ = jax.lax.scan(body, x0, None, length=chain)
            return c

        try:
            out = chained(x)
            _force(out[0, 0, 0, -1])
            best = np.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                out = chained(x)
                _force(out[0, 0, 0, -1])
                best = min(best, time.perf_counter() - t0)
            # the chain includes the COUT->C back-projection conv; report
            # raw chain time and the fwd-conv TF/s ceiling-style number
            print(f"{label:12s} {name:6s} chain {best*1e3:8.2f} ms "
                  f"(~{flops/best/1e12:5.1f} TF/s incl. backmap)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label:12s} {name:6s} FAILED: {e!r}", flush=True)


def main():
    want = set(sys.argv[1:])
    for spec in SHAPES:
        if want and spec[0] not in want:
            continue
        run(*spec)


if __name__ == "__main__":
    main()

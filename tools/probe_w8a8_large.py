#!/usr/bin/env python
"""W8A8 e2e probe on the LARGE tier (VERDICT r3 item 6).

Measures the 16-frame LARGE window forward in bf16 vs the pre-quantized
int8 pipeline (ops/quant.py: activation quant fused into layernorm/GELU,
weights per-channel int8), plus the depth/pose parity delta between the two
on the same random-init weights.

One process, two jits, best-of-N (verify skill timing discipline).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N, H, W = 16, 504, 504
REPS = 4


def _force(out):
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[-1])


def timed(name, fn, *args):
    out = fn(*args)
    _force(out)
    best = np.inf
    for _ in range(REPS):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:16s} {best * 1e3:8.1f} ms  ({N / best:5.2f} FPS)", flush=True)
    return out, best


def main():
    from da3slam_tpu.models import DepthAnything3
    from da3slam_tpu.models.da3 import forward_fn

    tier = sys.argv[1] if len(sys.argv) > 1 else "large"
    model = DepthAnything3.from_pretrained(tier)
    qmodel = model.quantize()
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(N, H, W, 3)), jnp.float32)
    jax.block_until_ready(imgs)

    @jax.jit
    def full(params, images):
        # tiny output slices: fetching the full [16, 504, 504] depth map
        # through the dev tunnel costs ~0.4 s/rep of pure transport and
        # swamps the model time (the slice still depends on every output)
        out = forward_fn(params, images, model.cfg, dtype=jnp.bfloat16)
        return out["depth"][:, :2, :2], out["extrinsics"]

    @jax.jit
    def full_dense(params, images):
        out = forward_fn(params, images, model.cfg, dtype=jnp.bfloat16)
        return out["depth"], out["extrinsics"]

    _, t_f = timed(f"{tier} bf16", full, model.params, imgs)
    _, t_q = timed(f"{tier} w8a8", full, qmodel.params, imgs)
    print(f"speedup {t_f / t_q:.3f}x", flush=True)

    out_f = full_dense(model.params, imgs)
    out_q = full_dense(qmodel.params, imgs)
    d_f = np.asarray(out_f[0], np.float32)
    d_q = np.asarray(out_q[0], np.float32)
    rel = np.linalg.norm(d_q - d_f) / max(np.linalg.norm(d_f), 1e-9)
    corr = np.corrcoef(d_f.ravel(), d_q.ravel())[0, 1]
    e_f = np.asarray(out_f[1], np.float32)
    e_q = np.asarray(out_q[1], np.float32)
    print(f"depth parity: rel_l2={rel:.4f} corr={corr:.5f}  "
          f"pose max|Δ|={np.max(np.abs(e_q - e_f)):.4f}", flush=True)


if __name__ == "__main__":
    main()

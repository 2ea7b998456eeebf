#!/usr/bin/env python
"""DPT-head stage decomposition at the SMALL 16-frame hot shape.

The head measures 26.4 ms of the 124 ms full forward (tools/profile_small.py)
against a ~7 ms conv-FLOP roofline — find where it goes:
  (a) reassembly (projects + learned resizes + stage_rn convs)
  (b) + refinenet fusion (RCU convs + align-corners upsamples + out convs)
  (c) + output head (head1 @288^2, resize to 504^2, head2/head_out @504^2)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from da3slam_tpu.models import DepthAnything3
from da3slam_tpu.models import dpt, vit

N, H, W = 16, 504, 504
REPS = 4


def _force(out):
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[-1])


def timed(name, fn, *args):
    _force(fn(*args))
    best = np.inf
    for _ in range(REPS):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:22s} {best * 1e3:8.1f} ms", flush=True)
    return best


def main():
    model = DepthAnything3.from_pretrained("small")
    cfg = model.cfg
    hp = wp = H // cfg.patch_size
    S = 1 + cfg.num_register_tokens + hp * wp
    rng = np.random.default_rng(0)
    taps = [
        jnp.asarray(rng.normal(size=(N, S, cfg.embed_dim)), jnp.bfloat16)
        for _ in range(4)
    ]
    params = model.params["dpt"]
    n_prefix = 1 + cfg.num_register_tokens

    def reassemble(params, taps):
        scales = (4.0, 2.0, 1.0, 0.5)
        resize = params.get("resize")
        stages = []
        for k, tap in enumerate(taps):
            t = tap[:, n_prefix:, :]
            fmap = t.reshape(N, hp, wp, -1)
            fmap = dpt.conv2d(params["project"][k], fmap)
            if resize is not None:
                if k == 0:
                    fmap = dpt._deconv_exact(resize["r0"], fmap, 4)
                elif k == 1:
                    fmap = dpt._deconv_exact(resize["r1"], fmap, 2)
                elif k == 3:
                    fmap = dpt._conv_s2(resize["r3"], fmap)
            stages.append(dpt.conv2d(params["stage_rn"][k], fmap))
        return stages

    def fusion(params, stages):
        y = dpt._rcu(params["fusion"][3]["rcu2"], stages[3])
        for k in (2, 1, 0):
            y = dpt._resize_ac(y, stages[k].shape[1], stages[k].shape[2])
            y = dpt.conv2d(params["fusion"][k + 1]["out"], y)
            x = dpt._rcu(params["fusion"][k]["rcu1"], stages[k])
            y = dpt._rcu(params["fusion"][k]["rcu2"], y + x)
        y = dpt._resize_ac(y, 2 * stages[0].shape[1], 2 * stages[0].shape[2])
        return dpt.conv2d(params["fusion"][0]["out"], y)

    @jax.jit
    def stage_a(params, taps):
        return [s[:, :2, :2] for s in reassemble(params, taps)]

    @jax.jit
    def stage_b(params, taps):
        return fusion(params, reassemble(params, taps))[:, :2, :2]

    @jax.jit
    def stage_c(params, taps):
        d, c, r = dpt.apply_dpt(params, taps, (hp, wp), (H, W), cfg)
        return d[:, :2, :2]

    t_a = timed("reassemble+stage_rn", stage_a, params, taps)
    t_b = timed("+ fusion", stage_b, params, taps)
    t_c = timed("full head", stage_c, params, taps)
    print(f"fusion                {(t_b - t_a) * 1e3:8.1f} ms", flush=True)
    print(f"output head           {(t_c - t_b) * 1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()

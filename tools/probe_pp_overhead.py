"""Measure the pipeline-parallel machinery's fixed tax on the real chip.

The README's giant-on-4-chips realtime projection was pure arithmetic
(``single_chip × S × M/(M+S-1)``) with NO overhead term (VERDICT r4 weak
#2).  This probe measures that term: at S=1 the GPipe ring
(parallel/pp_forward.py) computes exactly what a sequential encoder scan
computes — same blocks, same order, same attention — so

    overhead = t_pp(S=1, M) / t_seq(M) − 1

isolates the pp machinery itself: stage-stacked parameter indexing, the
per-block ``lax.cond`` on a traced global index, where-gated tap writes,
dynamic microbatch indexing, and the (size-1) ppermute.  The ICI hop
cannot be measured on one chip; it is bounded analytically instead: the
per-tick payload is one microbatch's activations
(``N·S_tok·D`` bf16 ≈ 64 MB for giant at 16 views @504) over a v5e ICI
link (~45 GB/s/direction) ≈ 1.4 ms, against a ~310 ms 10-block giant
stage tick → <0.5%, folded into the same correction factor.

Usage:  python tools/probe_pp_overhead.py [preset] [M] [reps]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _force(a) -> None:
    float(np.asarray(a).ravel()[-1])


def main(preset: str = "giant", M: int = 4, reps: int = 2) -> None:
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from da3slam_tpu.models import vit
    from da3slam_tpu.models.config import get_preset
    from da3slam_tpu.parallel.pp_forward import (
        make_pp_encode,
        split_encoder_params,
    )

    cfg = get_preset(preset)
    N, res = 16, 504
    params = vit.init_encoder(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    images_mb = jnp.asarray(
        rng.normal(size=(M, N, res, res, 3)).astype(np.float32)
    )

    @jax.jit
    def seq(params, images_mb):
        def body(_, im):
            taps, final, _ = vit.encode(params, im, cfg, "auto", jnp.bfloat16)
            return None, (taps, final)

        _, (taps, final) = jax.lax.scan(body, None, images_mb)
        return taps, final

    def run(fn, *args):
        taps, final = fn(*args)
        _force(final[0, 0, -1, -1])  # warmup/compile
        t0 = time.perf_counter()
        for _ in range(reps):
            taps, final = fn(*args)
        _force(final[0, 0, -1, -1])
        return (time.perf_counter() - t0) / reps

    t_seq = run(seq, params, images_mb)
    print(f"sequential encoder  ({preset}, M={M}x{N}@{res}): "
          f"{t_seq * 1e3:.1f} ms", flush=True)

    mesh = Mesh(np.array(jax.devices()[:1]), ("pp",))
    encode_pp = make_pp_encode(cfg, mesh, attn_impl="auto", dtype=jnp.bfloat16)
    stage_params, rest = split_encoder_params(params, 1, mesh)
    t_pp = run(encode_pp, stage_params, rest, images_mb)
    oh = t_pp / t_seq - 1
    print(f"pp(S=1) encoder     ({preset}, M={M}x{N}@{res}): "
          f"{t_pp * 1e3:.1f} ms", flush=True)
    print(f"pp machinery overhead: {oh * 100:.1f}%  "
          f"(correction factor 1/(1+oh) = {1 / (1 + oh):.3f})", flush=True)


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "giant",
        int(sys.argv[2]) if len(sys.argv) > 2 else 4,
        int(sys.argv[3]) if len(sys.argv) > 3 else 2,
    )

"""W8A8 quantization (ops/quant.py + the encoder's quantized forward path).

The reference has no quantization (it runs torch autocast bf16/fp16,
da3_streaming.py:143-145); this is the TPU-native int8 pipeline gated on by
``DepthAnything3.quantize()``.  Tests pin (a) the quantizer math against a
dequantized oracle, (b) the pytree transform's structure, and (c) forward
parity between the quantized and float encoders on realistic activations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from da3slam_tpu.models import DepthAnything3, vit
from da3slam_tpu.models.da3 import forward_fn
from da3slam_tpu.ops.quant import (
    int8_gemm,
    layer_norm_quant,
    quantize_encoder_params,
    quantize_rows,
    quantize_weight,
)


class TestQuantizerMath:
    def test_quantize_rows_roundtrip(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(64, 96)) * rng.uniform(0.1, 10, (64, 1)))
        q, s = quantize_rows(x)
        assert q.dtype == jnp.int8
        err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
        # symmetric round-to-nearest: error ≤ scale/2 = amax/254 per element
        amax = np.max(np.abs(np.asarray(x)), axis=-1, keepdims=True)
        assert np.all(err <= amax / 254 + 1e-7)

    def test_quantize_weight_per_channel(self):
        rng = np.random.default_rng(1)
        w = rng.normal(size=(48, 32)) * rng.uniform(0.01, 5.0, size=(1, 32))
        wq = quantize_weight(jnp.asarray(w))
        deq = np.asarray(wq["w8"], np.float32) * np.asarray(wq["wscale"])
        col_amax = np.max(np.abs(w), axis=0)
        assert np.all(np.abs(deq - w) <= col_amax / 254 + 1e-7)

    def test_int8_gemm_matches_f32(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(128, 64)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(64, 80)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(80,)), jnp.float32)
        x8, xs = quantize_rows(x)
        out = int8_gemm(x8, xs, quantize_weight(w), b, out_dtype=jnp.float32)
        ref = x @ w + b
        # per-element quant noise ~1/127 relative on both sides, averaged
        # over the 64-deep contraction
        rel = np.linalg.norm(np.asarray(out - ref)) / np.linalg.norm(np.asarray(ref))
        assert rel < 0.02, rel

    def test_layer_norm_quant_matches_layer_norm(self):
        rng = np.random.default_rng(3)
        p = {
            "scale": jnp.asarray(rng.normal(size=(32,)) * 0.5 + 1.0, jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(32,)) * 0.1, jnp.float32),
        }
        x = jnp.asarray(rng.normal(size=(4, 16, 32)), jnp.float32)
        q, s = layer_norm_quant(p, x)
        ref = vit.layer_norm(p, x)
        deq = np.asarray(q, np.float32) * np.asarray(s)
        assert np.max(np.abs(deq - np.asarray(ref))) <= np.max(np.asarray(s)) / 2 + 1e-6


class TestQuantizedEncoder:
    @pytest.mark.parametrize("mlp_type", ["mlp", "swiglu"])
    def test_quantize_params_structure(self, mlp_type):
        model = DepthAnything3.from_pretrained("tiny")
        cfg = model.cfg.with_overrides(mlp_type=mlp_type)
        enc = vit.init_encoder(jax.random.PRNGKey(0), cfg)
        qenc = quantize_encoder_params(enc)
        for bp in qenc["blocks"]:
            assert "qkv_w" not in bp["attn"] and "qkv_q" in bp["attn"]
            assert bp["attn"]["qkv_q"]["w8"].dtype == jnp.int8
            assert "proj_w" in bp["attn"]  # out-projection stays float
            if mlp_type == "swiglu":
                assert {"wg_q", "wv_q", "w3_q"} <= set(bp["mlp"])
            else:
                assert {"w1_q", "w2_q"} <= set(bp["mlp"])
        # original tree untouched (pure transform)
        assert "qkv_w" in enc["blocks"][0]["attn"]

    @pytest.mark.parametrize("mlp_type", ["mlp", "swiglu"])
    def test_forward_parity(self, mlp_type):
        """Quantized vs float forward on the tiny preset: depth fields agree
        to quantization noise (random-init weights — the parity CLI covers
        real-checkpoint fidelity once weights are mountable)."""
        model = DepthAnything3.from_pretrained("tiny")
        if mlp_type == "swiglu":
            cfg = model.cfg.with_overrides(mlp_type="swiglu")
            from da3slam_tpu.models.da3 import init_params

            params = init_params(jax.random.PRNGKey(0), cfg)
            model = DepthAnything3(cfg, params)
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.normal(size=(2, 56, 56, 3)), jnp.float32)

        out_f = jax.jit(
            lambda p, x: forward_fn(p, x, model.cfg, dtype=jnp.float32)
        )(model.params, imgs)
        qmodel = model.quantize()
        out_q = jax.jit(
            lambda p, x: forward_fn(p, x, qmodel.cfg, dtype=jnp.float32)
        )(qmodel.params, imgs)

        d_f = np.asarray(out_f["depth"])
        d_q = np.asarray(out_q["depth"])
        rel = np.linalg.norm(d_q - d_f) / max(np.linalg.norm(d_f), 1e-9)
        assert rel < 0.05, f"depth relative error {rel}"
        # pose head consumes the encoder's camera token — same tolerance class
        np.testing.assert_allclose(
            np.asarray(out_q["extrinsics"]),
            np.asarray(out_f["extrinsics"]),
            atol=0.05,
        )

    def test_quantize_rejects_unknown_scheme(self):
        model = DepthAnything3.from_pretrained("tiny")
        with pytest.raises(ValueError):
            model.quantize("w4a16")


class TestQuantComposesWithPP:
    @pytest.mark.parametrize("mlp_type", ["mlp", "swiglu"])
    def test_pp_encode_on_quantized_blocks(self, mlp_type):
        """The giant's realtime configuration composes pp x W8A8: stage-
        stacked QUANTIZED blocks through the GPipe ring must match the
        sequential quantized encoder (the structural dispatch in vit._block
        survives the stage stacking/unstacking)."""
        from jax.sharding import Mesh

        from da3slam_tpu.models.config import get_preset
        from da3slam_tpu.parallel.pp_forward import (
            make_pp_encode,
            split_encoder_params,
        )

        cfg = get_preset("tiny").with_overrides(mlp_type=mlp_type)
        enc = vit.init_encoder(jax.random.PRNGKey(0), cfg)
        qenc = quantize_encoder_params(enc)
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.normal(size=(3, 2, 28, 28, 3)), jnp.float32)

        def seq_one(im):
            taps, final, _ = vit.encode(qenc, im, cfg, attn_impl="xla")
            return jnp.stack(taps), final

        taps_seq, final_seq = jax.vmap(seq_one)(imgs)

        mesh = Mesh(np.asarray(jax.devices()[:2]), ("pp",))
        stage_params, rest = split_encoder_params(qenc, 2, mesh)
        encode_pp = make_pp_encode(cfg, mesh, 2)
        taps_pp, final_pp = encode_pp(stage_params, rest, imgs)

        np.testing.assert_allclose(np.asarray(final_pp), np.asarray(final_seq),
                                   atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(taps_pp), np.asarray(taps_seq),
                                   atol=2e-5, rtol=2e-5)

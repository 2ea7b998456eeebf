"""Golden-output regression tests (SURVEY.md §4: "golden-parity tests of the
JAX DA3 forward vs. saved reference activations").

Until real DA3 checkpoints are importable, the golden file pins OUR tiny
model at seed 0 on fixed inputs, guarding the whole numeric stack (init →
encoder → heads → inference plumbing) against silent behavioral drift
across refactors.  Regenerate deliberately (see tests/golden/README) when a
change is *supposed* to alter the numerics, and say so in the commit.
"""

import numpy as np
import pytest

from da3slam_tpu.models import DepthAnything3

GOLDEN = "tests/golden/tiny_seed0.npz"


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


class TestGoldenParity:
    def test_forward_matches_golden(self, golden):
        model = DepthAnything3.from_pretrained("tiny", seed=0)
        pred = model.inference(image=golden["images"], process_res=70)
        np.testing.assert_allclose(
            pred.depth[:, ::4, ::4], golden["depth"], atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            pred.conf[:, ::4, ::4], golden["conf"], atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(pred.extrinsics, golden["extrinsics"], atol=1e-5)
        np.testing.assert_allclose(pred.intrinsics, golden["intrinsics"], atol=1e-4)


class TestGoldenParitySwiGLU:
    """Same guard for the SwiGLU FFN path (the giant tier's flavour),
    pinned at tiny dims — catches silent drift in the gate/value/w3
    arithmetic that the plain-MLP golden cannot see."""

    def test_forward_matches_golden(self):
        import jax

        from da3slam_tpu.models import get_preset
        from da3slam_tpu.models.da3 import init_params

        g = np.load("tests/golden/tiny_swiglu_seed0.npz")
        cfg = get_preset("tiny").with_overrides(mlp_type="swiglu")
        model = DepthAnything3(cfg, init_params(jax.random.PRNGKey(0), cfg))
        pred = model.inference(image=g["images"], process_res=70)
        np.testing.assert_allclose(
            pred.depth[:, ::4, ::4], g["depth"], atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            pred.conf[:, ::4, ::4], g["conf"], atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(pred.extrinsics, g["extrinsics"], atol=1e-5)

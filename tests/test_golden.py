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

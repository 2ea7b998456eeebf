"""Test-suite aliases for the synthetic ground-truth world
(da3slam_tpu/utils/synthetic.py)."""

from da3slam_tpu.utils.synthetic import (  # noqa: F401
    PLANES,
    SyntheticDA3 as FakeDA3,
    make_synthetic_image_dir as make_fake_image_dir,
    make_trajectory,
    render_depth,
)

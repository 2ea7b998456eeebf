"""Command-line entry points mirroring the reference CLIs (SURVEY.md §1 L6):

- ``python -m da3slam_tpu.cli.main_slam``  — the full streaming SLAM loop
- ``python -m da3slam_tpu.cli.main_align`` — chunk-alignment demo
- ``python -m da3slam_tpu.cli.main_conf``  — confidence-map inspection
- ``python -m da3slam_tpu.cli.main_3dgs``  — 3D-Gaussian-Splatting export
- ``python -m da3slam_tpu.cli.streaming``  — long-sequence disk-spill run
"""

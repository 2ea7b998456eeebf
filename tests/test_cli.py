"""CLI + export tests, driven through the argparse mains with the tiny model."""

import json

import numpy as np
import pytest
from PIL import Image

from da3slam_tpu.inout.ply import read_ply


@pytest.fixture()
def image_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "frames"
    d.mkdir()
    base = rng.integers(40, 200, size=(56, 70, 3))
    for i in range(9):
        f = np.clip(np.roll(base, i * 3, axis=1) + rng.integers(0, 25, (56, 70, 3)), 0, 255)
        Image.fromarray(f.astype(np.uint8)).save(d / f"{i:06d}.png")
    return d


@pytest.fixture()
def tiny_config(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        "Weights:\n  DA3: tiny\n"
        "Model:\n  chunk_size: 4\n  overlap_size: 1\n  keyframe_interval: 1\n"
        "  sleep_between_chunk: 0\n  port: 8099\n"
    )
    return p


class TestMainSlam:
    @pytest.mark.slow
    def test_end_to_end_with_export(self, image_dir, tiny_config, tmp_path):
        from da3slam_tpu.cli.main_slam import main

        out = tmp_path / "out"
        main([
            "--image_dir", str(image_dir), "--config", str(tiny_config),
            "--output_dir", str(out), "--headless",
        ])
        assert (out / "camera_poses.txt").exists()
        assert (out / "intrinsic.txt").exists()
        rows = (out / "camera_poses.txt").read_text().strip().split("\n")
        # 9 frames, chunks [0-4),[3-7) + flushed tail [5-9): ALL frames
        # exported (the reference dropped the unaligned tail, solver.py
        # tail-flush fix)
        assert len(rows) == 9
        assert len(rows[0].split()) == 16


class TestMainAlign:
    @pytest.mark.slow  # heavy: see --durations trim, round 3
    def test_chunks_align_and_ply(self, image_dir, tmp_path):
        from da3slam_tpu.cli.main_align import main

        ply = tmp_path / "fused.ply"
        main([
            "--image_dir", str(image_dir), "--model", "tiny",
            "--chunk_size", "4", "--method", "icp", "--process_res", "70",
            "--output_ply", str(ply), "--headless",
        ])
        pts, cols = read_ply(ply)
        assert pts.shape[0] > 1000
        assert cols is not None


class TestMainConf:
    def test_writes_figures(self, image_dir, tmp_path):
        from da3slam_tpu.cli.main_conf import main

        out = tmp_path / "viz"
        main([
            "--image_dir", str(image_dir), "--model", "tiny",
            "--chunk_size", "3", "--output_dir", str(out), "--process_res", "70",
        ])
        assert (out / "heatmap_grid.png").exists()
        assert (out / "comparison_000.png").exists()
        assert (out / "comparison_002.png").exists()


class TestMain3DGS:
    def test_exports_gaussians_and_glb(self, image_dir, tmp_path):
        from da3slam_tpu.cli.main_3dgs import main

        out = tmp_path / "scene.ply"
        glb = tmp_path / "scene.glb"
        main([
            "--image_dir", str(image_dir), "--model", "tiny",
            "--chunk_size", "4", "--output", str(out), "--glb", str(glb),
            "--process_res", "70",
        ])
        # 3DGS layout check
        header = out.read_bytes()[:600].decode("ascii", "ignore")
        for prop in ["f_dc_0", "opacity", "scale_0", "rot_3"]:
            assert f"property float {prop}" in header
        # GLB magic + parses
        blob = glb.read_bytes()
        assert blob[:4] == b"glTF"
        import json, struct

        jlen = struct.unpack("<I", blob[12:16])[0]
        gltf = json.loads(blob[20 : 20 + jlen])
        assert gltf["meshes"][0]["primitives"][0]["mode"] == 0  # POINTS
        n = gltf["accessors"][0]["count"]
        assert n > 1000

    def test_refine_iters_path(self, image_dir, tmp_path):
        """--refine_iters routes through ops/splats.refine_splats and still
        writes a valid 3DGS PLY."""
        from da3slam_tpu.cli.main_3dgs import main

        out = tmp_path / "scene_refined.ply"
        main([
            "--image_dir", str(image_dir), "--model", "tiny",
            "--chunk_size", "4", "--output", str(out),
            "--process_res", "70", "--stride", "4", "--refine_iters", "5",
        ])
        header = out.read_bytes()[:600].decode("ascii", "ignore")
        for prop in ["f_dc_0", "opacity", "scale_0", "rot_3"]:
            assert f"property float {prop}" in header

    def test_train_iters_path(self, image_dir, tmp_path):
        """--train_iters routes through the differentiable rasterizer
        (ops/splats.train_splats) and writes a PLY whose rotations/scales
        are the TRAINED ones (anisotropic, unit quats)."""
        import numpy as np

        from da3slam_tpu.cli.main_3dgs import main

        out = tmp_path / "scene_trained.ply"
        main([
            "--image_dir", str(image_dir), "--model", "tiny",
            "--chunk_size", "4", "--output", str(out),
            "--process_res", "70", "--stride", "6", "--train_iters", "4",
        ])
        header = out.read_bytes()[:600].decode("ascii", "ignore")
        for prop in ["f_dc_0", "opacity", "scale_0", "rot_3"]:
            assert f"property float {prop}" in header
        # parse back: quats stored on the trained path must be finite units
        blob = out.read_bytes()
        end = blob.index(b"end_header\n") + len(b"end_header\n")
        head = blob[:end].decode("ascii")
        n = int(next(l.split()[2] for l in head.splitlines()
                     if l.startswith("element vertex")))
        n_props = sum(1 for l in head.splitlines() if l.startswith("property"))
        data = np.frombuffer(blob[end:], "<f4", count=n * n_props).reshape(n, n_props)
        q = data[:, 13:17]  # rot_0..3 (see inout/export3d._GS_FIELDS)
        assert np.isfinite(q).all()
        norms = np.linalg.norm(q, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)


class TestMainVideo:
    """One-shot video → SLAM driver.  This image has no ffmpeg backend, so
    the decode stage is monkeypatched to synthesize frames; everything
    downstream (crop → brightness → streaming SLAM → exports) runs real."""

    def _fake_decoder(self):
        rng = np.random.default_rng(0)
        base = rng.integers(40, 200, size=(56, 70, 3))

        def fake(video_path, output_dir, stride=1, quality=95):
            from pathlib import Path

            out = Path(output_dir)
            out.mkdir(parents=True, exist_ok=True)
            n = 0
            for i in range(0, 10, stride):
                f = np.clip(
                    np.roll(base, i * 3, axis=1)
                    + rng.integers(0, 25, (56, 70, 3)),
                    0, 255,
                )
                Image.fromarray(f.astype(np.uint8)).save(out / f"{n:06d}.jpg")
                n += 1
            return n

        return fake

    def test_full_chain_streaming(self, tmp_path, monkeypatch):
        import da3slam_tpu.preprocess.host as host
        from da3slam_tpu.cli import main_video

        monkeypatch.setattr(host, "video_to_frames", self._fake_decoder())
        cfg = tmp_path / "cfg.yaml"
        cfg.write_text(
            "Weights:\n  DA3: tiny\n"
            "Model:\n  chunk_size: 5\n  overlap: 2\n  process_res: 56\n"
        )
        out = tmp_path / "run"
        main_video.main([
            "--video", "fake.mp4", "--output_dir", str(out),
            "--config", str(cfg), "--stride", "2",
            "--crop", "0.9", "--brightness",
            "--traj_formats", "tum",
        ])
        assert (out / "frames" / "000000.jpg").exists()
        assert (out / "cropped").is_dir() and (out / "normalized").is_dir()
        assert (out / "slam" / "camera_poses.txt").exists()
        assert (out / "slam" / "camera_poses_tum.txt").exists()
        assert (out / "slam" / "combined_pcd.ply").exists()

    def test_slam_mode_headless(self, tmp_path, monkeypatch):
        import da3slam_tpu.preprocess.host as host
        from da3slam_tpu.cli import main_video

        monkeypatch.setattr(host, "video_to_frames", self._fake_decoder())
        cfg = tmp_path / "cfg.yaml"
        cfg.write_text(
            "Weights:\n  DA3: tiny\n"
            "Model:\n  chunk_size: 4\n  overlap_size: 1\n  process_res: 56\n"
            "  keyframe_interval: 1\n  sleep_between_chunk: 0\n"
        )
        out = tmp_path / "run"
        main_video.main([
            "--video", "fake.mp4", "--output_dir", str(out),
            "--config", str(cfg), "--mode", "slam", "--headless",
        ])
        assert (out / "slam" / "camera_poses.txt").exists()


class TestTrainCLI:
    """cli/train.py — the training subsystem's user-facing entry point."""

    def test_dp_train_and_resume(self, tmp_path, capsys):
        from da3slam_tpu.cli.train import main

        ckpt = tmp_path / "run1"
        main(["--preset", "tiny", "--mode", "dp", "--steps", "4",
              "--batch", "2", "--views", "2", "--hw", "28", "28",
              "--devices", "2", "--tp", "1",
              "--ckpt_dir", str(ckpt), "--ckpt_every", "2",
              "--log_every", "1"])
        out = capsys.readouterr().out
        lines = [json.loads(l) for l in out.splitlines()
                 if l.startswith("{")]
        final = [l for l in lines if "final_step" in l][0]
        assert final["final_step"] == 4
        assert np.isfinite(final["final_loss"])
        assert (ckpt / "latest").exists()

        # resume continues from the saved step, not from scratch
        main(["--preset", "tiny", "--mode", "dp", "--steps", "6",
              "--batch", "2", "--views", "2", "--hw", "28", "28",
              "--devices", "2", "--tp", "1",
              "--ckpt_dir", str(ckpt), "--ckpt_every", "100",
              "--resume", "--log_every", "0"])
        out = capsys.readouterr().out
        assert "resumed step 4" in out
        lines = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
        final = [l for l in lines if "final_step" in l][0]
        assert final["final_step"] == 6

    def test_sp_and_pp_modes_smoke(self, capsys):
        from da3slam_tpu.cli.train import main

        main(["--preset", "tiny", "--mode", "sp", "--steps", "2",
              "--views", "4", "--hw", "28", "28", "--devices", "2",
              "--log_every", "1"])
        out = capsys.readouterr().out
        assert '"mode": "sp"' in out
        final = [json.loads(l) for l in out.splitlines()
                 if l.startswith("{") and "final_step" in l][0]
        assert np.isfinite(final["final_loss"])

        main(["--preset", "tiny", "--mode", "pp", "--stages", "2",
              "--steps", "2", "--batch", "3", "--views", "2",
              "--hw", "28", "28", "--log_every", "1"])
        out = capsys.readouterr().out
        assert '"mode": "pp"' in out
        final = [json.loads(l) for l in out.splitlines()
                 if l.startswith("{") and "final_step" in l][0]
        assert np.isfinite(final["final_loss"])

    def test_npz_data_shards(self, tmp_path, capsys):
        from da3slam_tpu.cli.train import main

        rng = np.random.default_rng(0)
        for i in range(2):
            np.savez(tmp_path / f"shard_{i}.npz",
                     images=rng.normal(size=(2, 2, 28, 28, 3)).astype("float32"),
                     depth=rng.uniform(0.5, 3.0, size=(2, 2, 28, 28)).astype("float32"),
                     extrinsics=np.tile(np.eye(4, dtype="float32")[:3],
                                        (2, 2, 1, 1)))
        main(["--preset", "tiny", "--mode", "dp", "--steps", "3",
              "--devices", "2", "--tp", "1",
              "--data", str(tmp_path), "--hw", "28", "28",
              "--log_every", "1"])
        out = capsys.readouterr().out
        final = [json.loads(l) for l in out.splitlines()
                 if l.startswith("{") and "final_step" in l][0]
        assert final["final_step"] == 3

import numpy as np
from PIL import Image

from da3slam_tpu.inout.prefetch import ImagePrefetcher


def make_frames(tmp_path, n=10):
    rng = np.random.default_rng(0)
    paths = []
    arrays = []
    for i in range(n):
        a = rng.integers(0, 255, (24, 32, 3)).astype(np.uint8)
        p = tmp_path / f"{i:04d}.png"
        Image.fromarray(a).save(p)
        paths.append(str(p))
        arrays.append(a)
    return paths, arrays


class TestImagePrefetcher:
    def test_batches_match_direct_decode(self, tmp_path):
        paths, arrays = make_frames(tmp_path)
        pf = ImagePrefetcher(paths, lookahead=4)
        try:
            b1 = pf.get_batch(paths[0:4])
            b2 = pf.get_batch(paths[3:7])  # overlapping window
            b3 = pf.get_batch(paths[6:10])
        finally:
            pf.close()
        np.testing.assert_array_equal(b1, np.stack(arrays[0:4]))
        np.testing.assert_array_equal(b2, np.stack(arrays[3:7]))
        np.testing.assert_array_equal(b3, np.stack(arrays[6:10]))

    def test_out_of_window_request_decodes_inline(self, tmp_path):
        paths, arrays = make_frames(tmp_path)
        pf = ImagePrefetcher(paths, lookahead=2)
        try:
            batch = pf.get_batch(paths[7:9])  # far ahead of prefetch cursor
        finally:
            pf.close()
        np.testing.assert_array_equal(batch, np.stack(arrays[7:9]))

    def test_close_idempotent(self, tmp_path):
        paths, _ = make_frames(tmp_path, 3)
        pf = ImagePrefetcher(paths)
        pf.close()
        pf.close()

    def test_solver_uses_prefetch_with_real_model(self, tmp_path):
        from da3slam_tpu.models import DepthAnything3
        from da3slam_tpu.slam import SLAMSolver

        paths, _ = make_frames(tmp_path, 6)
        model = DepthAnything3.from_pretrained("tiny")
        cfg = {"Model": {"chunk_size": 3, "overlap_size": 1,
                         "keyframe_interval": 1, "sleep_between_chunk": 0}}
        solver = SLAMSolver(str(tmp_path), cfg, model=model, viewer=None)
        assert solver.prefetch is True
        solver.run()
        # chunks [0-3), [2-5), plus the re-anchored tail window [3-6)
        # covering frame 5 (step=2 leaves one trailing frame)
        assert len(solver.results) == 3
        assert solver.results[-1]["dedup_skip"] == 2
        assert solver._prefetcher is None  # closed after run

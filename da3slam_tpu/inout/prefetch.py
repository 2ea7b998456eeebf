"""Background image decoding — host/device pipelining for the SLAM loop.

The reference decodes each chunk's images synchronously inside
``model.inference`` and then sleeps between chunks (solver.py:226);
SURVEY.md §7.3.5 flags overlap of host ingest with device compute as a
requirement for real-time rates.  ``ImagePrefetcher`` walks the frame list
in a daemon thread, decoding ahead of the consumer into a bounded cache, so
JPEG decode overlaps with the previous chunk's device work.
"""

from __future__ import annotations

import threading
from collections import OrderedDict

import numpy as np


class ImagePrefetcher:
    def __init__(self, paths: list[str], lookahead: int = 32):
        self.paths = list(paths)
        self.lookahead = lookahead
        self._cache: OrderedDict[str, np.ndarray] = OrderedDict()
        self._cursor = 0  # consumer position (frames before this can be evicted)
        self._next = 0  # worker position (frames below this are decoded)
        self._cond = threading.Condition()
        self._stop = False
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _decode(self, path: str) -> np.ndarray:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))

    def _worker(self) -> None:
        i = 0
        while True:
            with self._cond:
                while not self._stop and (
                    i >= len(self.paths) or i - self._cursor >= self.lookahead
                ):
                    if i >= len(self.paths):
                        return
                    self._cond.wait(timeout=0.2)
                if self._stop:
                    return
                path = self.paths[i]
            frame = self._decode(path)
            with self._cond:
                self._cache[path] = frame
                self._next = i + 1  # worker progress: frames < _next are done
                self._cond.notify_all()
            i += 1

    def get_batch(self, paths: list[str]) -> np.ndarray:
        """Fetch decoded frames: waits for the background thread when the
        frame is inside the prefetch window (avoids double-decoding the
        frames the worker is just finishing), decodes inline otherwise."""
        out = []
        for p in paths:
            # wait only for frames AHEAD of the cursor within the lookahead
            # window — those the worker is guaranteed to reach; evicted
            # (behind-cursor) or out-of-window frames decode inline
            try:
                idx = self.paths.index(p)
            except ValueError:
                idx = -1
            with self._cond:
                frame = self._cache.get(p)
                # the worker WILL produce idx iff it hasn't passed it yet and
                # it lies inside the lookahead window; anything else (evicted,
                # out of window, unknown path) decodes inline
                while (
                    frame is None
                    and self._next <= idx < self._cursor + self.lookahead
                    and not self._stop
                    and self._thread.is_alive()
                ):
                    self._cond.wait(timeout=0.1)
                    frame = self._cache.get(p)
            out.append(frame if frame is not None else self._decode(p))
        # advance the cursor and evict consumed frames
        with self._cond:
            try:
                last_idx = self.paths.index(paths[-1])
                self._cursor = max(self._cursor, last_idx)
            except ValueError:
                pass
            for p in paths[:-1]:  # keep the overlap frame cached
                self._cache.pop(p, None)
            self._cond.notify_all()
        return np.stack(out)

    def close(self) -> None:
        with self._cond:
            self._stop = True
            self._cond.notify_all()
        self._thread.join(timeout=1.0)

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
    def __init__(
        self,
        paths: list[str],
        lookahead: int = 32,
        workers: int = 4,
        stage_chunks: list[list[str]] | None = None,
        stage_ahead: int = 2,
    ):
        self.paths = list(paths)
        self.lookahead = lookahead
        self._cache: OrderedDict[str, np.ndarray] = OrderedDict()
        self._cursor = 0  # consumer position (frames before this can be evicted)
        self._next = 0  # next index a worker will CLAIM
        self._pending: set[int] = set()  # claimed, decode in flight
        self._cond = threading.Condition()
        self._stop = False
        # device staging: when the consumer's chunk partition is known
        # upfront (the SLAM solver computes it from the keyframe list),
        # ``stage_next()`` — called by the consumer right after it has
        # DISPATCHED a chunk's device work — stacks the next decoded chunk
        # and starts its host→device upload, so the 12 MB/chunk image
        # upload overlaps the previous chunk's (already queued) device
        # compute instead of serialising at the next dispatch.  Through the
        # dev tunnel (~40 MB/s) that upload is ~300 ms/chunk — the single
        # largest term in the solver's steady-state loop without staging.
        # Staging runs on the CALLER's thread: a background JAX thread
        # deadlocks the axon tunnel client when it races a main-thread
        # compile (observed; co-located runtimes tolerate it, the dev
        # tunnel does not), and main-thread staging gives the same overlap
        # because the device queue is already full when stage_next runs.
        self.stage_ahead = stage_ahead
        self._stage_chunks = (
            [list(c) for c in stage_chunks] if stage_chunks else None
        )
        self._stage_keys = (
            {tuple(c): k for k, c in enumerate(self._stage_chunks)}
            if self._stage_chunks
            else {}
        )
        self._staged: dict[tuple, object] = {}
        self._stage_pos = 0  # next partition index stage_next() will upload
        # several decode workers: PIL's JPEG decode releases the GIL in C,
        # so threads scale it — single-threaded decode (~110 FPS at 504^2)
        # would otherwise cap the pipelined solver below the device rate
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(max(1, workers))
        ]
        for t in self._threads:
            t.start()

    def _decode(self, path: str) -> np.ndarray:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))

    def _worker(self) -> None:
        while True:
            with self._cond:
                while not self._stop and (
                    self._next >= len(self.paths)
                    or self._next - self._cursor >= self.lookahead
                ):
                    if self._next >= len(self.paths):
                        return
                    self._cond.wait(timeout=0.2)
                if self._stop:
                    return
                i = self._next  # claim the next undecoded index
                self._next = i + 1
                self._pending.add(i)
                path = self.paths[i]
            frame = self._decode(path)
            with self._cond:
                self._cache[path] = frame
                self._pending.discard(i)
                self._cond.notify_all()

    def _wait_for_frame(self, path: str) -> np.ndarray:
        """Block until the decode workers produce ``path`` (when they will),
        else decode inline.  Shared by the stager thread; never evicts."""
        try:
            idx = self.paths.index(path)
        except ValueError:
            idx = -1
        with self._cond:
            frame = self._cache.get(path)
            while (
                frame is None
                and not self._stop
                and (
                    self._next <= idx < self._cursor + self.lookahead
                    or idx in self._pending
                )
                and any(t.is_alive() for t in self._threads)
            ):
                self._cond.wait(timeout=0.1)
                frame = self._cache.get(path)
        return frame if frame is not None else self._decode(path)

    def _stage_chunk(self, pos: int):
        """Stack partition chunk ``pos`` (waiting on its decodes) and start
        its host→device upload; returns the (uploading) device array."""
        import jax

        chunk = self._stage_chunks[pos]
        frames = [self._wait_for_frame(p) for p in chunk]
        batch = jax.device_put(np.stack(frames))
        self._staged[tuple(chunk)] = batch
        return batch

    def stage_next(self) -> bool:
        """Upload the next not-yet-staged partition chunk (caller's thread).

        The SLAM solver calls this immediately after dispatching a chunk's
        forward + alignment: the device queue is full, so the upload of the
        NEXT chunk's images proceeds concurrently with that compute.  Keeps
        at most ``stage_ahead`` chunks resident beyond the consumer.
        Returns False when the partition is exhausted or staging is off.
        """
        if self._stage_chunks is None or self._stage_pos >= len(self._stage_chunks):
            return False
        if len(self._staged) >= self.stage_ahead:
            return False
        self._stage_chunk(self._stage_pos)
        self._stage_pos += 1
        return True

    def get_batch(self, paths: list[str]) -> np.ndarray:
        """Fetch decoded frames: waits for the background thread when the
        frame is inside the prefetch window (avoids double-decoding the
        frames the worker is just finishing), decodes inline otherwise.

        When the batch is one the stager pre-uploaded, returns the DEVICE
        array (its transfer started up to ``stage_ahead`` chunks ago) —
        the consumer's jit dispatch then reads it with zero upload cost.
        """
        key = tuple(paths)
        pos = self._stage_keys.get(key)
        if pos is not None:
            batch = self._staged.pop(key, None)
            if batch is None:
                # not staged ahead (first chunk, or consumer outran
                # stage_next): stack + upload it now, same thread
                batch = self._stage_chunk(pos)
                self._staged.pop(key, None)
            self._stage_pos = max(self._stage_pos, pos + 1)
            with self._cond:
                # evict consumed host frames, keep the overlap frame
                for p in paths[:-1]:
                    self._cache.pop(p, None)
                try:
                    last_idx = self.paths.index(paths[-1])
                    self._cursor = max(self._cursor, last_idx)
                except ValueError:
                    pass
                self._cond.notify_all()
            return batch
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
                def will_come():
                    # a worker will produce idx iff it is unclaimed inside
                    # the lookahead window, or its decode is in flight
                    return (
                        self._next <= idx < self._cursor + self.lookahead
                        or idx in self._pending
                    )

                while (
                    frame is None
                    and will_come()
                    and not self._stop
                    and any(t.is_alive() for t in self._threads)
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
        for t in self._threads:
            t.join(timeout=1.0)
        self._staged.clear()

"""Generic sequence-processing engine: the functional analog of the
reference's one reusable "map over frames" machine.

Reference: src/core/processing.c — ``generic_seq_args`` + hooks
(processing.h:7-65), ``generic_sequence_worker`` (:14-193): filtering
criterion → index mapping → per-frame read/hook/save → finalize;
cancellation via ``get_thread_run()`` polled in every loop (:91).

Here: frames stream through a chunked executor; the device does chunk
work, the host overlaps the next chunk's reads; cancellation is a
callback checked between chunks (P7 in SURVEY §2.9). No shared globals,
no locks — results are returned, not appended under a mutex.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Any, Callable, List, Optional

from siriltpu.core.frame import Frame
from siriltpu.utils.hostmem import relieve_map_pressure


class CancelledError(Exception):
    pass


@dataclass
class SequenceEngine:
    """Chunked map-over-frames with prefetch and cancellation."""

    chunk: int = 8
    cancel_check: Optional[Callable[[], bool]] = None
    progress: Optional[Callable[[int, int], None]] = None

    def _check(self):
        if self.cancel_check and self.cancel_check():
            raise CancelledError()

    def map_frames(self, seq, image_hook: Callable[[int, Frame], Any],
                   *, filter_fn: Optional[Callable[[int], bool]] = None,
                   save_hook: Optional[Callable[[int, Any], None]] = None,
                   async_save: bool = False,
                   stats: Optional[dict] = None) -> List[Any]:
        """generic_sequence_worker: apply image_hook to every selected
        frame, with one-chunk read-ahead on a host thread.

        ``async_save`` moves save_hook calls onto a single writer
        thread fed by a small bounded queue (FIFO — write order is
        preserved), so host write-back (SER/FITS encode + the
        device→host fetch inside it) overlaps the next frames' device
        compute — the reference's P5 loader/writer pattern
        (ser.c:671-683) at engine scope. Writer exceptions re-raise at
        the end. ``stats`` (a dict) accumulates wall/read/compute/save
        seconds so callers can report the overlap (read_s + compute_s +
        save_s > wall_s when the threads actually ran concurrently)."""
        import time

        indices = [i for i in range(seq.number)
                   if (filter_fn(i) if filter_fn else seq.imgparam[i].incl)]
        results: List[Any] = []
        st = stats if stats is not None else {}
        st.setdefault("read_s", 0.0)
        st.setdefault("compute_s", 0.0)
        st.setdefault("save_s", 0.0)
        t_wall = time.perf_counter()

        def read_chunk(start):
            t0 = time.perf_counter()
            out = [(i, seq.read_frame(i))
                   for i in indices[start : start + self.chunk]]
            st["read_s"] += time.perf_counter() - t0
            return out

        import queue

        writer_q: Optional[queue.Queue] = None
        writer_t: Optional[threading.Thread] = None
        writer_err: List[BaseException] = []
        if async_save and save_hook is not None:
            writer_q = queue.Queue(maxsize=max(2 * self.chunk, 4))

            def _writer():
                while True:
                    item = writer_q.get()
                    if item is None:
                        return
                    t0 = time.perf_counter()
                    try:
                        save_hook(*item)
                    except BaseException as e:  # re-raised at join
                        writer_err.append(e)
                        return
                    finally:
                        st["save_s"] += time.perf_counter() - t0

            writer_t = threading.Thread(target=_writer, daemon=True)
            writer_t.start()

        try:
            pending = read_chunk(0)
            pos = 0
            while pending:
                self._check()
                # prefetch the next chunk while processing this one
                nxt: List = []
                t = threading.Thread(
                    target=lambda: nxt.extend(read_chunk(pos + self.chunk)))
                t.start()
                for i, frame in pending:
                    self._check()
                    if writer_err:
                        raise writer_err[0]
                    t0 = time.perf_counter()
                    out = image_hook(i, frame)
                    st["compute_s"] += time.perf_counter() - t0
                    results.append(out)
                    if save_hook:
                        if writer_q is not None:
                            writer_q.put((i, out))
                        else:
                            t0 = time.perf_counter()
                            save_hook(i, out)
                            st["save_s"] += time.perf_counter() - t0
                    if self.progress:
                        self.progress(len(results), len(indices))
                t.join()
                pos += self.chunk
                pending = nxt
                # long campaigns compile many distinct programs; purge
                # jax's executable caches before the process nears the
                # kernel's mapping limit (utils.hostmem)
                relieve_map_pressure()
        finally:
            if writer_t is not None:
                # a dead writer (error) never drains a full queue —
                # poll instead of blocking so shutdown cannot deadlock
                while writer_t.is_alive():
                    try:
                        writer_q.put(None, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                writer_t.join()
        if writer_err:
            raise writer_err[0]
        st["wall_s"] = time.perf_counter() - t_wall
        return results


__all__ = ["SequenceEngine", "CancelledError"]

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
                   save_hook: Optional[Callable[[int, Any], None]] = None
                   ) -> List[Any]:
        """generic_sequence_worker: apply image_hook to every selected
        frame, with one-chunk read-ahead on a host thread."""
        indices = [i for i in range(seq.number)
                   if (filter_fn(i) if filter_fn else seq.imgparam[i].incl)]
        results: List[Any] = []

        def read_chunk(start):
            return [(i, seq.read_frame(i))
                    for i in indices[start : start + self.chunk]]

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
                out = image_hook(i, frame)
                results.append(out)
                if save_hook:
                    save_hook(i, out)
                if self.progress:
                    self.progress(len(results), len(indices))
            t.join()
            pos += self.chunk
            pending = nxt
            # long campaigns compile many distinct programs; purge jax's
            # executable caches before the process nears the kernel's
            # mapping limit (see utils.hostmem.relieve_map_pressure)
            relieve_map_pressure()
        return results


__all__ = ["SequenceEngine", "CancelledError"]

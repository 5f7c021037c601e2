"""Background-thread iterator prefetch (double buffering).

Overlaps host-side work — image decode/tokenize in training
(data_proc_group.py:447's 8 DataLoader workers), per-slide h5 feature reads
in cohort sweeps (detection_utils.py:12-36's serial loop) — with device
compute. Depth 2 keeps exactly one item in flight.
"""

from __future__ import annotations


class Prefetcher:
    """Iterate ``iterable`` on a daemon thread, buffering ``depth`` items;
    exceptions from the producer re-raise in the consumer."""

    def __init__(self, iterable, depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._sentinel = object()
        self._err = None

        def worker():
            try:
                for item in iterable:
                    self._q.put(item)
            except BaseException as e:  # propagate to the consumer
                self._err = e
            finally:
                self._q.put(self._sentinel)

        self._thread = threading.Thread(target=worker, daemon=True,
                                        name="keep-tpu-prefetch")
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._sentinel:
                if self._err is not None:
                    raise self._err
                return
            yield item

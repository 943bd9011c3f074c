"""Bounded background prefetch: overlap host data work with device compute.

The reference hides IO latency with an asyncio event-loop thread +
bounded channel (lib/data_utils/nested_async.py:199-258,
async_utils.py:368-493). For a JAX input pipeline the same effect comes
from a worker thread feeding a bounded queue, optionally pushing batches to
device (``jax.device_put``) so the transfer also overlaps compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional


class PrefetchIterator:
    """Iterate ``source`` on a daemon thread, ``max_prefetch`` items ahead.

    Exceptions in the worker re-raise at the consuming site; closing the
    iterator (or dropping it) stops the worker promptly (the bounded queue
    is drained with a sentinel protocol, mirroring AsyncToSyncChannel's
    close semantics).
    """

    _DONE = object()

    def __init__(
        self,
        source: Iterable,
        max_prefetch: int = 2,
        transform: Optional[Callable] = None,
    ):
        self._q: queue.Queue = queue.Queue(maxsize=max_prefetch)
        self._stop = threading.Event()
        self._exc: Optional[BaseException] = None
        self._transform = transform

        def worker():
            try:
                for item in source:
                    if self._stop.is_set():
                        return
                    if self._transform is not None:
                        item = self._transform(item)
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:  # noqa: BLE001 - reraised at consumer
                self._exc = e
            finally:
                while not self._stop.is_set():
                    try:
                        self._q.put(self._DONE, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return item

    def close(self) -> None:
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __del__(self):  # best-effort cleanup
        self.close()

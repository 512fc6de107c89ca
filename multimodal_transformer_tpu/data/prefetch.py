"""Host->device prefetch pipeline.

The reference moves data to the device synchronously per batch inside the
train loop (reference MFT/train.py:124-130) — the host blocks while each
batch transfers.  Here a background thread stages the next `depth` batches
onto the device (jax.device_put is async: it returns immediately and the
transfer overlaps with the current step's compute), so the accelerator never
waits on host CSV->numpy->HBM movement.  This is the BASELINE.json
"prefetching pipeline feeding device-resident buffers" component.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax

from .batching import Batch


class DevicePrefetcher:
    """Wraps a Batch iterator; yields (batch, device_tree) with `depth`
    batches staged ahead on device.

    put_fn: Batch -> device pytree (e.g. Engine._device_batch).  Exceptions
    in the worker propagate to the consumer.
    """

    _SENTINEL = object()

    def __init__(self, batches: Iterable[Batch], put_fn: Callable,
                 depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()

        def worker():
            try:
                for b in batches:
                    staged = (b, put_fn(b))
                    while not self._stop.is_set():
                        try:
                            self._q.put(staged, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return  # consumer abandoned; drop staged buffers
            except BaseException as e:  # propagate to consumer
                self._err = e
            finally:
                # must not drop the sentinel (consumer would block forever);
                # retry until space or the consumer closed us
                while not self._stop.is_set():
                    try:
                        self._q.put(self._SENTINEL, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self) -> None:
        """Unblock the worker and drop staged device buffers.  Call when
        abandoning iteration early (e.g. an exception mid-epoch) so the
        queued batches don't stay pinned in HBM."""
        self._stop.set()
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break

    def __iter__(self) -> Iterator:
        try:
            while True:
                item = self._q.get()
                if item is self._SENTINEL:
                    if self._err is not None:
                        raise self._err
                    return
                yield item
        finally:
            self.close()

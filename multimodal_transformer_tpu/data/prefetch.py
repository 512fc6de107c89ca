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

        def worker():
            try:
                for b in batches:
                    self._q.put((b, put_fn(b)))
            except BaseException as e:  # propagate to consumer
                self._err = e
            finally:
                self._q.put(self._SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is self._SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item

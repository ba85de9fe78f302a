"""Background batch prefetching for the training loop.

The reference's hot loop (``train/vector_field_nerf_train.py:161-260``)
assembles each ray batch on the host serially with the optimizer step. On a
remote-attached TPU that serialization is the dominant throughput loss:
device compute is ~22 ms/step while host assembly + packing + the
host→device transfer add tens of milliseconds between dispatches.

``Prefetcher`` runs the (iterator → feed_fn) chain in one worker thread a
fixed depth ahead of the consumer, so batch ``k+1`` is assembled, packed and
shipped while the device executes step ``k``. A single worker preserves the
iterator's order and RNG determinism exactly; numpy and ``jax.device_put``
release the GIL for the bulk of the work.

Used by the per-step dispatch path (``device.steps_per_dispatch = 1``); the
default scan path instead packs K batches into one tensor per dispatch
(``parallel/train_step.make_scan_train_step``).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

_SENTINEL = object()


class Prefetcher:
    """Iterate ``feed_fn(item)`` for items of ``iterable``, computed ahead
    in a background thread (bounded by ``depth`` in-flight results)."""

    def __init__(self, iterable: Iterable, feed_fn: Callable[[Any], Any],
                 depth: int = 2) -> None:
        self._queue: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._iterable = iterable
        self._feed_fn = feed_fn
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self) -> None:
        try:
            for item in self._iterable:
                self._queue.put(self._feed_fn(item))
            self._queue.put(_SENTINEL)
        except BaseException as exc:  # propagated to the consumer
            self._queue.put(exc)

    def __iter__(self) -> Iterator[Any]:
        while True:
            item = self._queue.get()
            if item is _SENTINEL:
                self._thread.join()
                return
            if isinstance(item, BaseException):
                self._thread.join()
                raise item
            yield item

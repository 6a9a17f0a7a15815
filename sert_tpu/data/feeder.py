"""Device feed: double-buffered host->device batch pipeline.

The reference overlapped multiprocessing batch construction with Theano
device compute (SURVEY.md section 4.2). The TPU-native equivalent: a small
background thread stages the next host batch onto the device (optionally with
an explicit ``NamedSharding`` for data-parallel meshes) while the current
step runs — JAX dispatch is async, so depth-2 prefetch suffices to keep the
chip busy.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import jax


class PrefetchFeeder:
    """Wrap a host batch iterator; yields device-resident batches.

    ``put_fn`` maps a host batch to device arrays (default ``jax.device_put``;
    pass a sharded put for pjit meshes). Exceptions in the worker propagate to
    the consumer. ``deterministic=True`` bypasses the thread entirely (test
    mode, SURVEY.md section 6 "race detection").
    """

    _SENTINEL = object()

    def __init__(
        self,
        batches: Iterator[Any],
        put_fn: Optional[Callable[[Any], Any]] = None,
        depth: int = 2,
        deterministic: bool = False,
    ):
        self._batches = batches
        self._put = put_fn if put_fn is not None else jax.device_put
        self._deterministic = deterministic
        if not deterministic:
            self._q: queue.Queue = queue.Queue(maxsize=depth)
            self._err: Optional[BaseException] = None
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()

    def _worker(self) -> None:
        try:
            for b in self._batches:
                self._q.put(self._put(b))
        except BaseException as e:  # propagate to consumer
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self) -> Iterator[Any]:
        if self._deterministic:
            for b in self._batches:
                yield self._put(b)
            return
        while True:
            item = self._q.get()
            if item is self._SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item

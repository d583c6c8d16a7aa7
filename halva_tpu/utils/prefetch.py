"""Background batch prefetching.

The reference leans on torch DataLoader workers (dataloader_num_workers=8,
src/hallava_7b.sh:65); here a daemon thread keeps a small queue of
host-prepared batches ahead of the device so PIL decode + tokenization
overlap with the TPU step. (Device transfer stays on the main thread —
jax dispatch is not thread-safe across streams on all backends.)
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class Prefetcher:
    """Wrap an iterator of host batches with a lookahead thread."""

    def __init__(self, it: Iterable[T], depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None

        def worker():
            try:
                for item in it:
                    self._q.put(item)
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(_SENTINEL)

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def __iter__(self) -> Iterator[T]:
        return self

    def __next__(self) -> T:
        item = self._q.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(it: Iterable[T], depth: int = 2) -> Iterator[T]:
    return Prefetcher(it, depth)

"""Host->device input prefetching.

For datasets that don't fit in HBM (or are synthesized per batch, like
moving-MNIST video), the host pipeline overlaps with device compute by
running the generator in a background thread and keeping a small queue of
batches already transferred to the device.  For HBM-resident datasets use
``data.ondevice`` instead (no host in the loop at all).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import jax.numpy as jnp

_SENTINEL = object()


def prefetch_to_device(iterator: Iterator, size: int = 2,
                       sharding=None) -> Iterator:
    """Wrap a host batch iterator: batches are converted/transferred on a
    background thread, ``size`` deep.  Exceptions propagate to the consumer.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)

    def put(item):
        def xfer(x):
            if sharding is not None:
                return jax.device_put(x, sharding)
            return jnp.asarray(x)

        return jax.tree.map(xfer, item)

    stop = threading.Event()

    def worker():
        try:
            for item in iterator:
                converted = put(item)
                # bounded put that gives up once the consumer is gone,
                # so abandoning the iterator can't pin device buffers
                while not stop.is_set():
                    try:
                        q.put(converted, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except Exception as e:  # surfaced on the consuming side
            if not stop.is_set():
                q.put(e)
        finally:
            # the sentinel must actually arrive or the consumer hangs at
            # end-of-epoch; block (bounded) unless the consumer is gone
            while not stop.is_set():
                try:
                    q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        # consumer closed/abandoned the generator: release the worker and
        # drop any queued device buffers
        stop.set()
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break

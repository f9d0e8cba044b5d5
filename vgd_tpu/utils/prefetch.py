"""Host -> device input prefetching.

The reference overlaps input with compute via DataLoader worker processes +
pin_memory (dataset_code.py:176). The TPU-native equivalent: JAX dispatch is
asynchronous, so keeping N batches in flight on the device while the host
prepares the next ones hides the H2D copy behind the compiled step.
"""
from __future__ import annotations

import collections
from typing import Iterator

import jax


def device_prefetch(iterator: Iterator, size: int = 2, sharding=None):
    """Yield device-resident batches, keeping ``size`` transfers in flight."""
    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()

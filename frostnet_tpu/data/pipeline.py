"""Host->device input pipeline with background prefetch.

Replaces torch's DataLoader worker pool (SURVEY.md §2.6 last row): a worker
thread keeps N batches in flight — batch k+1 is staged onto the devices
(sharded over the mesh 'dp' axis) while batch k trains, so the fake-quant
conv fwd/bwd is the only TPU hot-loop cost (BASELINE.json north star).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def prefetch_to_device(
    it: Iterable,
    mesh: Optional[Mesh] = None,
    size: int = 2,
    axis: str = "dp",
) -> Iterator:
    """Iterate ``it`` (dicts of numpy arrays), staging batches on device."""
    sharding = None
    if mesh is not None and mesh.size > 1:
        sharding = NamedSharding(mesh, P(axis))

    def place(batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def worker():
        try:
            for batch in it:
                q.put(place(batch))
        except Exception as e:  # surface loader errors in the consumer
            q.put(e)
        q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, Exception):
            raise item
        yield item

"""Multi-host input pipeline: per-host sharding + async device prefetch.

The reference's per-GPU torch DataLoader generalizes here to per-host
loaders feeding one *global* batch (SURVEY.md §5 "distributed communication
backend"): each host loads only its slice of every global batch, places it
on its local devices with the global ``('data', ...)`` sharding, and a
background thread keeps ``prefetch`` batches in flight so host IO overlaps
device compute.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def host_slice(global_batch: Dict[str, np.ndarray], process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Slice a global batch to this host's shard (contiguous split on dim 0)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    out = {}
    for k, v in global_batch.items():
        n = len(v)
        per = n // pc
        out[k] = v[pi * per:(pi + 1) * per]
    return out


def shard_batch_to_mesh(mesh: Mesh, batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Place host-local arrays with the global ('data', ...) sharding.

    Single-process: a plain sharded device_put. Multi-process: uses
    ``make_array_from_process_local_data`` so each host contributes its
    slice of the global array.
    """
    out = {}
    for k, v in batch.items():
        spec = P("data", *([None] * (np.ndim(v) - 1)))
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() > 1:
            out[k] = jax.make_array_from_process_local_data(sharding, np.asarray(v))
        else:
            out[k] = jax.device_put(np.asarray(v), sharding)
    return out


class PrefetchIterator:
    """Wrap a host batch iterator with background loading + device placement."""

    def __init__(self, it: Iterator[Dict[str, np.ndarray]], mesh: Optional[Mesh] = None,
                 prefetch: int = 2):
        self._it = it
        self.mesh = mesh
        self._q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))
        self._done = object()
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self) -> None:
        try:
            for batch in self._it:
                if self.mesh is not None:
                    batch = shard_batch_to_mesh(self.mesh, batch)
                else:
                    batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}
                self._q.put(batch)
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            raise StopIteration
        return item


def prefetch_to_mesh(loader, mesh: Optional[Mesh] = None, prefetch: int = 2,
                     per_host: bool = False) -> PrefetchIterator:
    """Iterate a DataLoader with device prefetch; optionally slice each
    batch to this host first (multi-host)."""
    def gen():
        for batch in loader:
            yield host_slice(batch) if per_host else batch

    return PrefetchIterator(gen(), mesh=mesh, prefetch=prefetch)

"""Host fetch that works for multi-process (globally sharded) arrays
and saturates slow accelerator links.

In a jax.distributed run, cell-sharded arrays span devices of several
processes; `np.asarray` on such an array raises. `host_fetch` all-
gathers the global value in that case (each process ends with the full
array — the result-boundary semantics of the reference's single-node
API).

Large single-process fetches stream CONCURRENTLY: measured on the
remote-TPU tunnel, one device->host stream moves an incompressible
54 MB array at ~0.4-23 MB/s depending on conditions, while four
concurrent row-chunk fetches sustain ~28-41 MB/s — up to ~67x faster
in the worst window. Values are exact (chunking is row slicing).
VIREO_FETCH_STREAMS tunes the stream count (default 4; <=1 disables).
"""

import os

import numpy as np
import jax

__all__ = ["host_fetch"]

_MIN_PARALLEL_BYTES = 2 << 20


def host_fetch(x):
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    if not isinstance(x, jax.Array) or x.ndim == 0:
        return np.asarray(x)
    streams = int(os.environ.get("VIREO_FETCH_STREAMS", 4))
    nbytes = x.size * np.dtype(x.dtype).itemsize
    if streams <= 1 or nbytes < _MIN_PARALLEL_BYTES \
            or x.shape[0] < streams:
        return np.asarray(x)
    from concurrent.futures import ThreadPoolExecutor
    bounds = np.linspace(0, x.shape[0], streams + 1).astype(int)
    slices = [x[lo:hi] for lo, hi in zip(bounds[:-1], bounds[1:])
              if hi > lo]
    with ThreadPoolExecutor(len(slices)) as ex:
        parts = list(ex.map(np.asarray, slices))
    return np.concatenate(parts, axis=0)

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

__all__ = ["host_fetch", "host_put"]

_MIN_PARALLEL_BYTES = 2 << 20


def host_put(x, dtype=None):
    """device_put for large HOST arrays that saturates slow links the
    same way `host_fetch` does for downloads: split on the leading
    axis into concurrent streams, concatenate on device. Measured on
    the remote-TPU tunnel: ONE upload stream moves incompressible
    int8 at as low as ~1-6 MB/s while four concurrent chunk uploads
    sustain hundreds of MB/s — the difference between a ~75 s and a
    ~5 s warm phase on the 96 MB placement payload.
    VIREO_PUT_STREAMS tunes the count (default 4; <=1 disables)."""
    x = np.asarray(x)
    if dtype is not None:
        x = x.astype(dtype, copy=False)
    streams = int(os.environ.get("VIREO_PUT_STREAMS", 4))
    if streams <= 1 or x.nbytes < _MIN_PARALLEL_BYTES \
            or x.ndim == 0 or x.shape[0] < streams:
        return jax.device_put(x)
    import jax.numpy as jnp
    from concurrent.futures import ThreadPoolExecutor
    bounds = np.linspace(0, x.shape[0], streams + 1).astype(int)
    chunks = [x[lo:hi] for lo, hi in zip(bounds[:-1], bounds[1:])
              if hi > lo]
    with ThreadPoolExecutor(len(chunks)) as ex:
        parts = list(ex.map(jax.device_put, chunks))
    return jnp.concatenate(parts, axis=0)


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

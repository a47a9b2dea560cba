"""Host fetch that works for multi-process (globally sharded) arrays.

In a jax.distributed run, cell-sharded arrays span devices of several
processes; `np.asarray` on such an array raises. `host_fetch` all-
gathers the global value in that case (each process ends with the full
array — the result-boundary semantics of the reference's single-node
API) and is a plain `np.asarray` otherwise.
"""

import numpy as np
import jax

__all__ = ["host_fetch"]


def host_fetch(x):
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)

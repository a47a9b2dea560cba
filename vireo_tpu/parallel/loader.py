"""Multi-host input pipeline: each process loads only its cell range.

Generalizes the reference's manual `--cellRange` sharding
(vireo.py:77-78,136-142) to a pod: process p of P owns cells
[p*C/P, (p+1)*C/P) of the global matrix, reads/filters only that slice
on its host, and the global device array is assembled with
`make_array_from_process_local_data` — no host ever materializes the
full pool.
"""

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import CELL_AXIS

__all__ = ["process_cell_range", "load_cellSNP_sharded",
           "dense_counts_from_local"]


def process_cell_range(n_cell, process_id=None, n_processes=None):
    """The [lo, hi) cell range owned by this process (equal blocks,
    remainder padded onto the last process like build_cell_sharded_coo)."""
    pid = jax.process_index() if process_id is None else process_id
    n_proc = jax.process_count() if n_processes is None else n_processes
    c_local = -(-n_cell // n_proc)
    lo = pid * c_local
    hi = min(lo + c_local, n_cell)
    return lo, hi, c_local


def load_cellSNP_sharded(dir_name, process_id=None, n_processes=None):
    """Read a cellSNP folder keeping only this process's cell columns.

    Returns (cell_dat, (lo, hi, c_local, n_cell_global)): the AD/DP
    CSC matrices are the local slice; variants/samples are sliced to
    match. Uses the native mtx reader when available.
    """
    from ..io.matrices import read_cellSNP

    cell_dat = read_cellSNP(dir_name)
    n_cell = cell_dat["AD"].shape[1]
    lo, hi, c_local = process_cell_range(n_cell, process_id, n_processes)
    cell_dat["AD"] = cell_dat["AD"][:, lo:hi]
    cell_dat["DP"] = cell_dat["DP"][:, lo:hi]
    cell_dat["samples"] = cell_dat["samples"][lo:hi]
    return cell_dat, (lo, hi, c_local, n_cell)


def dense_counts_from_local(mesh, AD_local, DP_local, meta,
                            dtype=np.int8):
    """Assemble the global cell-sharded DenseCounts from per-process
    local column slices (each zero-padded to the equal block size
    c_local; padded cells carry zero counts and are inert in the EM).

    `meta` is the tuple returned by load_cellSNP_sharded. The mesh's
    device order must follow process order (jax.devices() default).
    """
    import jax.numpy as jnp
    from ..ops.counts import DenseCounts

    lo, hi, c_local, n_cell = meta
    n_var = AD_local.shape[0]

    def to_dense(M):
        d = np.asarray(M.todense() if hasattr(M, "todense") else M)
        out = np.zeros((n_var, c_local), dtype)
        out[:, :hi - lo] = np.minimum(d, 127).astype(dtype)
        return out

    sharding = NamedSharding(mesh, P(None, CELL_AXIS))
    local_ad, local_dp = to_dense(AD_local), to_dense(DP_local)
    if jax.process_count() > 1:
        global_shape = (n_var, c_local * jax.process_count())
        ad = jax.make_array_from_process_local_data(
            sharding, local_ad, global_shape)
        dp = jax.make_array_from_process_local_data(
            sharding, local_dp, global_shape)
    else:
        ad = jax.device_put(jnp.asarray(local_ad), sharding)
        dp = jax.device_put(jnp.asarray(local_dp), sharding)
    return DenseCounts(ad, dp)

"""Mosaic capability probe for a Pallas COO kernel (VERDICT r2 #2).

The COO fallback's floor is the per-nnz W-row gather (~4 ns/nnz via
XLA's gather, benchmarks/coo_micro.py). A Pallas kernel can only beat
it if Mosaic gives us one of:

  A. a vectorized `jnp.take` from a VMEM-resident W inside the kernel
     (gather served at VMEM latency instead of XLA's gather unit), or
  B. fast scalar accumulate-stores into a VMEM scratch tile
     (dense-tile-on-the-fly materialization followed by an MXU matmul).

This probe measures both primitives in isolation on the real chip and
prints one JSON line per result; the decision (build the kernel vs
document the descope) follows from these numbers in
benchmarks/RESULTS.md.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("VIREO_COMPILE_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
from vireo_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

K = 16
BLK = 2048          # entries per grid step (as (16, 128) index tiles)


def timed(fn, *args, n=3):
    out = fn(*args)
    float(jnp.sum(out))
    best = np.inf
    for _ in range(n):
        t = time.time()
        float(jnp.sum(fn(*args)))
        best = min(best, time.time() - t)
    return best


# --- probe A: vectorized take from VMEM-resident W ------------------

def _gather_kernel(idx_ref, val_ref, w_ref, out_ref):
    i = pl.program_id(0)
    idx = idx_ref[:].reshape(-1)                  # (BLK,)
    vals = val_ref[:].reshape(-1, 1)
    g = jnp.take(w_ref[:], idx, axis=0)           # (BLK, K)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.sum(g * vals, axis=0, keepdims=True)


def probe_gather(nnz, C):
    rng = np.random.RandomState(0)
    n_blk = nnz // BLK
    idx = jnp.asarray(
        rng.randint(0, C, size=(n_blk * 16, 128)).astype(np.int32))
    val = jnp.asarray(rng.rand(n_blk * 16, 128).astype(np.float32))
    W = jnp.asarray(rng.rand(C, K).astype(np.float32))

    f = jax.jit(pl.pallas_call(
        _gather_kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((16, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whole W resident
        ],
        out_specs=pl.BlockSpec((1, K), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, K), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    ))
    dt = timed(f, idx, val, W)
    return dt


# --- probe B: scalar accumulate-stores into VMEM scratch ------------

def _scatter_kernel(r_ref, c_ref, v_ref, out_ref, scratch):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        scratch[:] = jnp.zeros_like(scratch)

    def body(m, _):
        scratch[r_ref[0, m], c_ref[0, m]] += v_ref[0, m]
        return 0

    jax.lax.fori_loop(0, BLK, body, 0)
    out_ref[:] = scratch[:]


def probe_scatter(nnz):
    rng = np.random.RandomState(0)
    n_blk = nnz // BLK
    r = jnp.asarray(rng.randint(0, 8, size=(1, n_blk * BLK)).astype(
        np.int32))
    c = jnp.asarray(rng.randint(0, 128, size=(1, n_blk * BLK)).astype(
        np.int32))
    v = jnp.asarray(rng.rand(1, n_blk * BLK).astype(np.float32))

    f = jax.jit(pl.pallas_call(
        _scatter_kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((1, BLK), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BLK), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BLK), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    ))
    dt = timed(f, r, c, v)
    return dt


# --- XLA baseline: the same gather via jnp.take ---------------------

def probe_xla_take(nnz, C):
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, C, size=nnz).astype(np.int32))
    val = jnp.asarray(rng.rand(nnz).astype(np.float32))
    W = jnp.asarray(rng.rand(C, K).astype(np.float32))

    @jax.jit
    def f(idx, val, W):
        return jnp.sum(jnp.take(W, idx, axis=0) * val[:, None], axis=0)

    return timed(f, idx, val, W)


def main():
    nnz = int(os.environ.get("PB_NNZ", 4_194_304))
    C = int(os.environ.get("PB_CELLS", 100_000))
    results = {"nnz": nnz, "backend": jax.default_backend()}
    for name, fn in [("xla_take", lambda: probe_xla_take(nnz, C)),
                     ("pallas_vmem_gather", lambda: probe_gather(nnz, C)),
                     ("pallas_scalar_scatter", lambda: probe_scatter(nnz)),
                     ("pallas_lane_gather", lambda: probe_lane_gather(nnz, C))]:
        try:
            dt = fn()
            results[name + "_s"] = round(dt, 5)
            results[name + "_ns_per_nnz"] = round(1e9 * dt / nnz, 3)
        except Exception as e:  # capability failures are a RESULT here
            first = (str(e).splitlines() or [""])[0]
            results[name + "_error"] = "%s: %s" % (
                type(e).__name__, first[:200])
        print(json.dumps({k: v for k, v in results.items()
                          if k.startswith(name) or k in ("nnz", "backend")}))
    print(json.dumps(results))


# --- probe C: lane-axis take_along_axis from a (K, C) resident W ----

def _lane_gather_kernel(idx_ref, val_ref, wt_ref, out_ref):
    i = pl.program_id(0)
    idx = idx_ref[:].reshape(1, -1)               # (1, BLK)
    idx = jnp.broadcast_to(idx, (wt_ref.shape[0], idx.shape[1]))
    g = jnp.take_along_axis(wt_ref[:], idx, axis=1)   # (K, BLK)
    vals = val_ref[:].reshape(1, -1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.sum(g * vals, axis=1, keepdims=True)


def probe_lane_gather(nnz, C):
    rng = np.random.RandomState(0)
    n_blk = nnz // BLK
    idx = jnp.asarray(
        rng.randint(0, C, size=(n_blk * 16, 128)).astype(np.int32))
    val = jnp.asarray(rng.rand(n_blk * 16, 128).astype(np.float32))
    WT = jnp.asarray(rng.rand(K, C).astype(np.float32))

    f = jax.jit(pl.pallas_call(
        _lane_gather_kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((16, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # (K, C) resident
        ],
        out_specs=pl.BlockSpec((K, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, 1), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    ))
    return timed(f, idx, val, WT)


if __name__ == "__main__":
    main()

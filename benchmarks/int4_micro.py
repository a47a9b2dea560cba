"""Microbenchmark: what binds the dense EM matmuls at K=16 — HBM or MXU?

And: can 4-bit nibble-packed counts (two counts per uint8 byte,
unpacked in VMEM by a Pallas kernel) beat the int8 rung?

Timed at the north-star contraction shape (30k x 100k @ 100k x 16) on
the real chip. The diagnostic: if the loop is HBM-bound, bf16 counts
(2 B) take ~2x the int8 (1 B) time; if MXU-bound (K=16 output lanes),
the times match. jnp.int4 itself is unusable in this JAX build (the
sub-byte cast recurses into jit on every backend), hence manual packing.

Run: VIREO_COMPILE_CACHE=.jax_cache python benchmarks/int4_micro.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "VIREO_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
from vireo_tpu.utils.platform import apply_platform_env  # noqa: E402
apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

V = int(os.environ.get("MB_VARS", 30_000))
C = int(os.environ.get("MB_CELLS", 100_000))
K = int(os.environ.get("MB_K", 16))
ITERS = int(os.environ.get("MB_ITERS", 30))


@functools.partial(jax.jit, static_argnames=("n", "transposed"))
def mm_loop(x, w, n, transposed=False):
    """n chained matmuls; the weight carries a tiny dependence on the
    previous output so nothing is hoisted out of the loop."""
    def body(i, carry):
        w, acc = carry
        xb = x.astype(jnp.bfloat16)
        if transposed:
            out = jax.lax.dot_general(
                xb, w.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            out = jnp.dot(xb, w.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        s = jnp.sum(out) * 1e-30
        return (w + s, acc + s)

    return jax.lax.fori_loop(0, n, body, (w, jnp.float32(0)))[1]


# ---- packed-nibble Pallas matmul: S = unpack(P) @ W -------------------
# P (V, C//2) uint8; byte j of row v holds counts for cells (2j, 2j+1)
# in (low, high) nibbles. W is pre-split by cell parity outside the
# kernel, so no interleave is needed in VMEM:
#   S = lo(P) @ W[0::2] + hi(P) @ W[1::2]

def _packed_mm_kernel(p_ref, we_ref, wo_ref, o_ref):
    # Mosaic supports neither int8 shifts nor uint8->bf16 casts on this
    # chip; the int32 roundtrip is the verified unpack sequence.
    p = p_ref[:].astype(jnp.int32)
    lo = (p & 0xF).astype(jnp.bfloat16)            # cells 0,2,4,...
    hi = ((p >> 4) & 0xF).astype(jnp.bfloat16)     # cells 1,3,5,...
    acc = jnp.dot(lo, we_ref[:], preferred_element_type=jnp.float32)
    acc += jnp.dot(hi, wo_ref[:], preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("block_v", "block_c"))
def packed_mm(p, we, wo, block_v=1024, block_c=2048):
    Vp, Ch = p.shape
    grid = (Vp // block_v, Ch // block_c)
    return pl.pallas_call(
        _packed_mm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_v, block_c), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, K), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, K), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_v, K), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Vp, K), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Vp * 2 * Ch * K, bytes_accessed=Vp * Ch + Vp * K * 4,
            transcendentals=0),
    )(p, we, wo)


@functools.partial(jax.jit, static_argnames=("n",))
def packed_loop(p, we, wo, n):
    def body(i, carry):
        we, acc = carry
        out = packed_mm(p, we, wo)
        s = jnp.sum(out) * 1e-30
        return (we + s, acc + s)
    return jax.lax.fori_loop(0, n, body, (we, jnp.float32(0)))[1]


def timeit(fn):
    float(fn())                       # compile + warm
    t0 = time.perf_counter()
    float(fn())                       # fetch forces full execution
    return (time.perf_counter() - t0) / ITERS


def main():
    w = jax.random.normal(jax.random.key(1), (C, K), jnp.float32)
    wa = jax.random.normal(jax.random.key(2), (V, K), jnp.float32)

    @jax.jit
    def make_x8():
        return jax.random.randint(jax.random.key(0), (V, C), 0, 13,
                                  dtype=jnp.int8)
    x8 = make_x8()
    jax.block_until_ready((x8, w, wa))

    if os.environ.get("MB_DTYPES", "1") == "1":
        t = timeit(lambda: mm_loop(x8, w, ITERS))
        tt = timeit(lambda: mm_loop(x8, wa, ITERS, transposed=True))
        print("int8  fwd %6.2f ms   T %6.2f ms   (per matmul, /%d)"
              % (t * 1e3, tt * 1e3, ITERS), flush=True)

        # bf16 counts (2 B/count): the HBM-vs-MXU diagnostic — ~2x int8
        # time means HBM-bound, ~equal means MXU-bound at K=16
        xb = jax.jit(lambda x: x.astype(jnp.bfloat16))(x8)
        jax.block_until_ready(xb)
        t = timeit(lambda: mm_loop(xb, w, ITERS))
        tt = timeit(lambda: mm_loop(xb, wa, ITERS, transposed=True))
        print("bf16  fwd %6.2f ms   T %6.2f ms" % (t * 1e3, tt * 1e3),
              flush=True)
        del xb

    # --- packed nibbles (stored int8: Mosaic has no uint8 casts)
    BV, BC = 1024, 2048
    Vp = -(-V // BV) * BV
    Ch = -(-(C // 2) // BC) * BC

    @jax.jit
    def pack(x):
        lo = x[:, 0::2].astype(jnp.int32)
        hi = x[:, 1::2].astype(jnp.int32)
        v = lo | (hi << 4)
        v = jnp.where(v > 127, v - 256, v).astype(jnp.int8)
        return jnp.pad(v, ((0, Vp - V), (0, Ch - C // 2)))

    p = pack(x8)
    we = jnp.pad(w[0::2], ((0, Ch - C // 2), (0, 0)))
    wo = jnp.pad(w[1::2], ((0, Ch - C // 2), (0, 0)))
    jax.block_until_ready((p, we, wo))
    # correctness first
    ref = jnp.dot(x8.astype(jnp.bfloat16)[:256], w.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    got = packed_mm(p, we, wo)[:256]
    err = float(jnp.max(jnp.abs(ref - got)))
    print("packed_mm max err vs int8 path: %.3g" % err, flush=True)
    for bv, bc in ((1024, 2048), (512, 4096), (2048, 1024), (256, 8192)):
        try:
            t = timeit(lambda: packed_loop(p, we, wo, ITERS))
            print("pack4 fwd %6.2f ms   (block %dx%d)"
                  % (t * 1e3, bv, bc), flush=True)
        except Exception as e:
            print("pack4 block %dx%d failed: %s" % (bv, bc, repr(e)[:120]),
                  flush=True)
        break  # block sweep only when tuning: MB_SWEEP=1
    stats = jax.devices()[0].memory_stats() or {}
    print("bytes_in_use %.2f GiB" % (stats.get("bytes_in_use", 0) / 2**30))


if __name__ == "__main__":
    main()

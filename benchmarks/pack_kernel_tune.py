"""Packed-nibble matmul kernel tuning: where do the ~2.5x vs the HBM
roofline go, and which variant closes the gap?

The int4_micro diagnostic (2026-08-21, v5e) measured one
(30k x 100k) @ (100k x 16) matmul at 4.89 ms int8 (HBM-bound: bf16 is
1.8x) and 5.16 ms packed — but the packed read is 1.5 GB, whose HBM
bound is ~1.9 ms. Variants timed here:

- base:      the production kernel's int32-roundtrip unpack, 2 dots
- nounpack:  control — dot the raw packed bytes (wrong values, right
             byte traffic) to isolate unpack cost from dot+HBM cost
- f32unpack: unpack via one int8->f32 cast + floor-division algebra
             (fewer VPU passes than the int32 &/>> roundtrip)
- blocks:    block-size sweep of the best variant

Run: python benchmarks/pack_kernel_tune.py   (tunnel TPU)
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


def unpack_base(p):
    q = p.astype(jnp.int32)
    return (q & 0xF).astype(jnp.bfloat16), ((q >> 4) & 0xF).astype(
        jnp.bfloat16)


def unpack_f32(p):
    # one widening cast; int8 bytes holding uint8 bit patterns are
    # negative when the high nibble >= 8 -> add 256 first
    q = p.astype(jnp.float32)
    q = jnp.where(q < 0, q + 256.0, q)
    hi = jnp.floor(q * (1.0 / 16.0))
    lo = q - 16.0 * hi
    return lo.astype(jnp.bfloat16), hi.astype(jnp.bfloat16)


def make_kernel(unpack):
    def kernel(p_ref, we_ref, wo_ref, o_ref):
        lo, hi = unpack(p_ref[:])
        acc = jnp.dot(lo, we_ref[:], preferred_element_type=jnp.float32)
        acc += jnp.dot(hi, wo_ref[:], preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(1) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += acc
    return kernel


def nounpack_kernel(p_ref, we_ref, wo_ref, o_ref):
    x = p_ref[:].astype(jnp.bfloat16)       # wrong values, right bytes
    acc = jnp.dot(x, we_ref[:], preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[:] += acc


def build(kernel, block_v, block_c, Vp, Ch):
    grid = (Vp // block_v, Ch // block_c)

    @jax.jit
    def run(p, we, wo):
        return pl.pallas_call(
            kernel,
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
                flops=2 * Vp * 2 * Ch * K,
                bytes_accessed=Vp * Ch + Vp * K * 4,
                transcendentals=0),
        )(p, we, wo)
    return run


def loop(run, p, we, wo, n):
    @functools.partial(jax.jit, static_argnames=("n",))
    def go(p, we, wo, n):
        def body(i, carry):
            we, acc = carry
            out = run(p, we, wo)
            s = jnp.sum(out) * 1e-30
            return (we + s, acc + s)
        return jax.lax.fori_loop(0, n, body, (we, jnp.float32(0)))[1]
    return lambda: go(p, we, wo, n)


def timeit(fn):
    float(fn())
    t0 = time.perf_counter()
    float(fn())
    return (time.perf_counter() - t0) / ITERS


def main():
    w = jax.random.normal(jax.random.key(1), (C, K), jnp.float32)

    @jax.jit
    def make():
        x8 = jax.random.randint(jax.random.key(0), (V, C), 0, 13,
                                dtype=jnp.int8)
        lo = x8[:, 0::2].astype(jnp.int32)
        hi = x8[:, 1::2].astype(jnp.int32)
        v = lo | (hi << 4)
        v = jnp.where(v > 127, v - 256, v).astype(jnp.int8)
        return x8, v

    x8, p_raw = make()
    jax.block_until_ready((x8, p_raw, w))
    ref = None

    for bv, bc in ((1024, 2048), (512, 4096), (256, 8192), (2048, 2048),
                   (512, 8192), (256, 16384), (1024, 4096)):
        Vp = -(-V // bv) * bv
        Ch = -(-(C // 2) // bc) * bc

        @jax.jit
        def padded(p, we_w, wo_w):
            return (jnp.pad(p, ((0, Vp - V), (0, Ch - C // 2))),
                    jnp.pad(we_w, ((0, Ch - C // 2), (0, 0))),
                    jnp.pad(wo_w, ((0, Ch - C // 2), (0, 0))))

        p, we, wo = padded(p_raw, w[0::2], w[1::2])
        jax.block_until_ready((p, we, wo))

        row = ["block %5dx%-5d:" % (bv, bc)]
        for name, kern in (("base", make_kernel(unpack_base)),
                           ("f32u", make_kernel(unpack_f32)),
                           ("noup", nounpack_kernel)):
            try:
                run = build(kern, bv, bc, Vp, Ch)
                if name != "noup":
                    got = run(p, we, wo)[:V]
                    if ref is None:
                        ref = jnp.dot(
                            x8.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                    err = float(jnp.max(jnp.abs(got - ref)))
                    assert err < 1.0, (name, err)
                t = timeit(loop(run, p, we, wo, ITERS))
                row.append("%s %6.2f ms" % (name, t * 1e3))
            except Exception as e:
                row.append("%s FAIL(%s)" % (name, repr(e)[:60]))
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()

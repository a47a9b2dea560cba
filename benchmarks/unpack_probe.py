"""Probe which nibble-unpack sequences Mosaic supports on this chip.

Small shapes; each candidate kernel unpacks an int8 byte (two 4-bit
counts) into two bf16 planes and checks correctness against numpy.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VIREO_COMPILE_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
from vireo_tpu.utils.platform import apply_platform_env  # noqa: E402
apply_platform_env()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def run(name, kernel, p):
    try:
        lo, hi = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct(p.shape, jnp.bfloat16),
                       jax.ShapeDtypeStruct(p.shape, jnp.bfloat16)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
        )(p)
        pn = np.asarray(p).astype(np.uint8)
        ok_lo = np.array_equal(np.asarray(lo, np.float32), pn & 15)
        ok_hi = np.array_equal(np.asarray(hi, np.float32), pn >> 4)
        print("%-28s lo_ok=%s hi_ok=%s" % (name, ok_lo, ok_hi), flush=True)
    except Exception as e:
        print("%-28s FAILED: %s" % (name, repr(e)[:140]), flush=True)


def k_int8_ops(p_ref, lo_ref, hi_ref):
    p = p_ref[:]
    lo_ref[:] = (p & jnp.int8(15)).astype(jnp.bfloat16)
    hi_ref[:] = ((p >> jnp.int8(4)) & jnp.int8(15)).astype(jnp.bfloat16)


def k_int32_ops(p_ref, lo_ref, hi_ref):
    p = p_ref[:].astype(jnp.int32)
    lo_ref[:] = (p & 15).astype(jnp.bfloat16)
    hi_ref[:] = ((p >> 4) & 15).astype(jnp.bfloat16)


def k_bitcast_int4(p_ref, lo_ref, hi_ref):
    x4 = pltpu.bitcast(p_ref[:], jnp.int4)      # (R, 2C) int4?
    xb = x4.astype(jnp.bfloat16)
    lo_ref[:] = xb[:, 0::2]
    hi_ref[:] = xb[:, 1::2]
    # mask negatives: int4 is signed; values <= 15 may read as negative
    lo_ref[:] = jnp.where(lo_ref[:] < 0, lo_ref[:] + 16, lo_ref[:])
    hi_ref[:] = jnp.where(hi_ref[:] < 0, hi_ref[:] + 16, hi_ref[:])


def main():
    rng = np.random.RandomState(0)
    p = jnp.asarray(rng.randint(0, 256, size=(256, 512)).astype(np.uint8)
                    .view(np.int8))
    run("int8 shift/and", k_int8_ops, p)
    run("int32 roundtrip", k_int32_ops, p)
    run("bitcast->int4", k_bitcast_int4, p)


if __name__ == "__main__":
    main()

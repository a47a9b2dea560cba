"""Microbenchmark: MXU cost of skinny matmuls vs output orientation.

The fused EM kernel (ops/pallas_em.py) is MXU-bound at K=16 donors
because every matmul has K in the 128-lane output dim (12.5% lane
utilization). This measures whether Mosaic/XLA charge less when the
skinny dim sits on sublanes (M) instead of lanes (N), i.e. whether
restructuring the kernel around transposed outputs would pay.

Run: VIREO_PLATFORM=tpu python benchmarks/mxu_orientation.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

plat = os.environ.get("VIREO_PLATFORM")
if plat:
    jax.config.update("jax_platforms", plat)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))


def time_op(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    V, C, K = 30720, 4096, 16
    rng = np.random.RandomState(0)
    ad8 = jnp.asarray(rng.randint(0, 100, (V, C)), jnp.int8)
    adb = ad8.astype(jnp.bfloat16)
    idb = jnp.asarray(rng.rand(C, K), jnp.bfloat16)
    idbT = idb.T.copy()
    Wb = jnp.asarray(rng.rand(V, K), jnp.bfloat16)
    WbT = Wb.T.copy()

    f32 = jnp.float32
    cases = {
        # M-step stats orientation: K on lanes vs sublanes
        "S=(V,C)@(C,K)  K-lanes": jax.jit(
            lambda a, w: jnp.dot(a, w, preferred_element_type=f32)),
        "S=(K,C)@(C,V)  K-sublanes": jax.jit(
            lambda a, w: jnp.dot(w, a.T, preferred_element_type=f32)),
        # E-step orientation (contract over V)
        "L=(C,V)@(V,K)  K-lanes": jax.jit(
            lambda a, w: jnp.dot(a.T, w, preferred_element_type=f32)),
        "L=(K,V)@(V,C)  K-sublanes": jax.jit(
            lambda a, w: jnp.dot(w.T, a, preferred_element_type=f32)),
        # full-lane control (K=128)
        "ctrl (V,C)@(C,128)": jax.jit(
            lambda a, w: jnp.dot(
                a, jnp.tile(w, (1, 8)), preferred_element_type=f32)),
    }
    args = {
        "S=(V,C)@(C,K)  K-lanes": (adb, idb),
        "S=(K,C)@(C,V)  K-sublanes": (adb, idbT),
        "L=(C,V)@(V,K)  K-lanes": (adb, Wb),
        "L=(K,V)@(V,C)  K-sublanes": (adb, WbT),
        "ctrl (V,C)@(C,128)": (adb, idb),
    }
    useful = 2.0 * V * C * K
    print(f"device={jax.devices()[0]}  V={V} C={C} K={K} "
          f"useful={useful/1e9:.1f} GFLOP")
    for name, fn in cases.items():
        dt = time_op(fn, *args[name])
        scale = 8.0 if name.startswith("ctrl") else 1.0
        print(f"{name:30s} {dt*1e3:7.3f} ms  "
              f"{useful*scale/dt/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()

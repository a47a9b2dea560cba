"""Microbenchmark: MXU cost of skinny matmuls vs output orientation.

The fused EM kernel (ops/pallas_em.py) is MXU-bound at K=16 donors
because every matmul has K in the 128-lane output dim (12.5% lane
utilization). This measures whether the cost drops when the skinny dim
sits on sublanes (M) instead of lanes (N), i.e. whether restructuring
the kernel around transposed outputs would pay.

Methodology: each case runs N matmuls inside ONE compiled fori_loop,
with the small operand varying per iteration and the output reduced to
a scalar accumulator — so nothing can be hoisted, deduplicated, or
cached by the remote-execution service, and the big operand must be
re-read from HBM every iteration. (Per-dispatch wall timing over the
tunnel measured 7 TB/s "bandwidth" — i.e. it times the RPC pipeline,
not the device.)

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/mxu_orientation.py
"""

import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("VIREO_COMPILE_CACHE", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))

from vireo_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

V, C, K = 30720, 4096, 16
f32 = jnp.float32


def loop(case, a, w, n):
    """n matmuls of flavor `case` with w perturbed per iteration."""
    def body(i, acc):
        wi = w + i.astype(w.dtype) * jnp.asarray(1e-6, w.dtype)
        if case == "S_Klanes":        # (V,C)@(C,K)
            out = jnp.dot(a, wi, preferred_element_type=f32)
        elif case == "S_Ksublanes":   # (K,C)@(C,V)
            out = jnp.dot(wi, a.T, preferred_element_type=f32)
        elif case == "L_Klanes":      # (C,V)@(V,K)
            out = jnp.dot(a.T, wi, preferred_element_type=f32)
        elif case == "L_Ksublanes":   # (K,V)@(V,C)
            out = jnp.dot(wi, a, preferred_element_type=f32)
        elif case == "ctrl128":       # (V,C)@(C,128)
            out = jnp.dot(a, jnp.tile(wi, (1, 8)),
                          preferred_element_type=f32)
        return acc + jnp.sum(out)

    return jax.lax.fori_loop(0, n, body, jnp.zeros((), f32))


loop_jit = partial(jax.jit, static_argnames=("case",))(loop)


def _timed(case, a, w, n):
    t0 = time.time()
    float(loop_jit(case, a, w, n))
    return time.time() - t0


def measure(case, a, w, n_long=24, n_short=4):
    _timed(case, a, w, n_short)                     # compile + warm
    _timed(case, a, w, n_long)
    t_short = min(_timed(case, a, w, n_short) for _ in range(2))
    t_long = min(_timed(case, a, w, n_long) for _ in range(2))
    return (t_long - t_short) / (n_long - n_short)


def main():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randint(0, 100, (V, C)), jnp.bfloat16)
    shapes = {"S_Klanes": (C, K), "S_Ksublanes": (K, C),
              "L_Klanes": (V, K), "L_Ksublanes": (K, V),
              "ctrl128": (C, K)}
    useful = 2.0 * V * C * K
    hbm = a.size * a.dtype.itemsize
    print(f"device={jax.devices()[0]}  V={V} C={C} K={K} "
          f"useful={useful/1e9:.1f} GFLOP  big-operand={hbm/2**20:.0f} MiB")
    only = os.environ.get("MXU_CASES")
    for case, wshape in shapes.items():
        if only and case not in only.split(","):
            continue
        w = jnp.asarray(rng.rand(*wshape), jnp.bfloat16)
        t0 = time.time()
        dt = measure(case, a, w)
        scale = 8.0 if case == "ctrl128" else 1.0
        print(f"{case:12s} {dt*1e3:7.3f} ms/matmul  "
              f"{useful*scale/dt/1e12:6.1f} TFLOP/s  "
              f"{hbm/dt/2**30:7.1f} GiB/s  (case total {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()

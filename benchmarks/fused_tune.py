"""Tune the fused single-pass EM kernel's cell_block at full scale.

The fused kernel reads half the HBM bytes of the unfused path
(6 GB/iter vs 12 GB at 30k x 100k int8) but measured 23.7 ms/iter vs
16.1 ms unfused (benchmarks/RESULTS.md). The MXU-orientation
microbenchmark showed plain XLA skinny-K matmuls reach the HBM roofline
(~800 GiB/s) in every orientation, so the gap is kernel structure —
block size / pipelining — not intrinsic lane waste. Sweep cell_block.

Run: PYTHONPATH=.:/root/.axon_site python -u benchmarks/fused_tune.py
Env: FT_BLOCKS=128,256,512  FT_ITERS=20
"""

import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("VIREO_COMPILE_CACHE", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))

from vireo_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax.numpy as jnp  # noqa: E402
from vireo_tpu.sim.synth import synth_pool_dense_device  # noqa: E402
from vireo_tpu.models.vireo import (VireoConfig, init_state,  # noqa: E402
                                    default_priors, run_em_iters_n)
from vireo_tpu.models.vireo_fused import (prepare_fused,  # noqa: E402
                                          run_fused_iters_n)


def timed(fn, n):
    t0 = time.time()
    _, elbo = fn(n)
    e = float(elbo)
    return time.time() - t0, e


def per_iter(fn, n_iters=20, n_short=2):
    timed(fn, 1)                                   # compile
    t_short = min(timed(fn, n_short)[0] for _ in range(3))
    t_long, elbo = timed(fn, n_short + n_iters)
    t_long = min(t_long, timed(fn, n_short + n_iters)[0])
    dt = (t_long - t_short) / n_iters
    if dt <= 0:
        dt = t_long / (n_short + n_iters)
    return dt, elbo


def main():
    n_var, n_cell, n_donor = 30_000, 100_000, 16
    n_iters = int(os.environ.get("FT_ITERS", 20))
    blocks = [int(b) for b in
              os.environ.get("FT_BLOCKS", "128,256,512").split(",")]

    d = synth_pool_dense_device(n_var=n_var, n_cell=n_cell,
                                n_donor=n_donor, doublet_rate=0.08,
                                density=0.01, seed=0)
    counts = d["counts"]
    jax.block_until_ready(counts.ad)
    cfg = VireoConfig(n_var=n_var, n_cell=n_cell, n_donor=n_donor)
    rng = np.random.RandomState(1)
    state = init_state(cfg, rng=rng, dtype=jnp.float32)
    priors = default_priors(cfg, dtype=jnp.float32)
    print(f"device={jax.devices()[0]} {n_var}x{n_cell}x{n_donor}",
          flush=True)

    dt, elbo = per_iter(
        lambda n: run_em_iters_n(counts, state, priors, cfg, n), n_iters)
    print(f"unfused dense-int8      {dt*1e3:7.2f} ms/iter "
          f"(elbo {elbo:.1f})", flush=True)

    for cb in blocks:
        data = prepare_fused(counts, cell_block=cb)
        try:
            dt, elbo = per_iter(
                lambda n: run_fused_iters_n(data, state, priors, cfg, n,
                                            cell_block=cb), n_iters)
            print(f"fused cell_block={cb:<5d}  {dt*1e3:7.2f} ms/iter "
                  f"(elbo {elbo:.1f})", flush=True)
        except Exception as e:  # VMEM overflow etc.
            print(f"fused cell_block={cb:<5d}  FAILED: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()

"""Benchmark: EM iterations/s on a large synthetic pool, TPU vs CPU vireo.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "iter/s", "vs_baseline": N}

Workload (BASELINE.json north star): 100k cells x 30k SNPs x 16 donors,
~1% density. The baseline is the reference NumPy/SciPy implementation
(/root/reference) timed on the same matrices on this host's CPU.

Env knobs:
  BENCH_CELLS, BENCH_VARS, BENCH_DONORS, BENCH_ITERS — workload size
  BENCH_SKIP_CPU=1       — reuse cached CPU baseline if present
  VIREO_PLATFORM         — override JAX platform
"""

import json
import os
import sys
import time

import numpy as np


def tpu_rate(n_var, n_cell, n_donor, n_iters, seed=1):
    """Time the jitted EM loop on the accelerator.

    The pool is generated ON DEVICE (statistically identical to the CPU
    baseline's pool; no multi-GB transfer over a possibly slow link)
    into the dense-int8 MXU layout when it fits in HBM, else padded COO.
    The device's call/fetch latency is amortized by running all
    iterations inside one compiled fori_loop with a traced trip count
    and subtracting a short-loop timing.
    """
    # persistent local compile cache: the remote-compile service can
    # take minutes for a fresh computation; cached binaries load in ~1s.
    # setdefault keeps a user-set VIREO_COMPILE_CACHE in charge.
    os.environ.setdefault(
        "VIREO_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    from vireo_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    from vireo_tpu.sim.synth import (synth_pool_counts,
                                     synth_pool_dense_device)
    from vireo_tpu.ops.counts import sparse_counts
    from vireo_tpu.models.vireo import (VireoConfig, init_state,
                                        default_priors, run_em_iters_n)

    t0 = time.time()
    n_elems = n_var * n_cell
    hbm_budget = float(os.environ.get("BENCH_HBM_GB", 11.0)) * 2 ** 30
    use_dense = (2 * n_elems) < hbm_budget
    if use_dense:
        d = synth_pool_dense_device(n_var=n_var, n_cell=n_cell,
                                    n_donor=n_donor, doublet_rate=0.08,
                                    density=0.01, seed=0)
        counts = d["counts"]
        jax.block_until_ready(counts.ad)
    else:
        d = synth_pool_counts(n_var=n_var, n_cell=n_cell,
                              n_donor=n_donor, doublet_rate=0.08,
                              density=0.01, seed=0)
        counts = sparse_counts(d["AD"], d["DP"], dtype=jnp.float32)
    cfg = VireoConfig(n_var=n_var, n_cell=n_cell, n_donor=n_donor)
    rng = np.random.RandomState(seed)
    state = init_state(cfg, rng=rng, dtype=jnp.float32)
    priors = default_priors(cfg, dtype=jnp.float32)

    # fused single-pass kernel: reads half the HBM bytes but pays MXU
    # lane waste at K=16; slower than the roofline-bound unfused path
    # for a single model (see benchmarks/RESULTS.md) — opt-in.
    fused = use_dense and os.environ.get("BENCH_FUSED", "0") == "1"
    if fused:
        from vireo_tpu.models.vireo_fused import (prepare_fused,
                                                  run_fused_iters_n)
        data = prepare_fused(counts)
    t_build = time.time() - t0

    def run(n):
        t0 = time.time()
        if fused:
            st, elbo = run_fused_iters_n(data, state, priors, cfg, n)
        else:
            st, elbo = run_em_iters_n(counts, state, priors, cfg, n)
        e = float(elbo)  # forces execution + result fetch
        return time.time() - t0, e

    t_compile, _ = run(1)
    # The device sits behind a remote tunnel whose RPC latency can
    # hiccup by whole seconds; take the min over repeats so one slow
    # round-trip cannot corrupt (or even negate) the subtraction.
    n_short = 2
    t_short = min(run(n_short)[0] for _ in range(3))
    t_long, elbo = run(n_short + n_iters)
    t_long = min(t_long, run(n_short + n_iters)[0])
    per_iter = (t_long - t_short) / n_iters
    if per_iter <= 0:  # calibration still noisier than the long run
        per_iter = t_long / (n_short + n_iters)
        print("[bench] WARNING: short-loop calibration exceeded the "
              "long run; falling back to the conservative whole-run "
              "rate (includes dispatch overhead)", file=sys.stderr)
    dev = jax.devices()[0]
    layout = ("fused_int8" if fused
              else ("dense_int8" if use_dense else "coo"))
    print(f"[bench] device={dev} layout={layout}"
          f" build={t_build:.1f}s compile={t_compile:.1f}s"
          f" per_iter={per_iter*1000:.2f}ms elbo={elbo:.1f}",
          file=sys.stderr)
    return 1.0 / per_iter


def cpu_reference_rate(AD, DP, n_donor, n_iters=3, seed=1):
    sys.path.insert(0, "/root/reference")
    from vireoSNP.utils.vireo_model import Vireo as RefVireo

    np.random.seed(seed)
    model = RefVireo(n_cell=AD.shape[1], n_var=AD.shape[0],
                     n_donor=n_donor)
    model.set_prior()
    AD = AD.tocsc()
    DP = DP.tocsc()
    # one warm iteration (allocations, BLAS warmup)
    model.update_theta_size(AD, DP)
    t0 = time.time()
    for _ in range(n_iters):
        model.update_theta_size(AD, DP)
        model.update_GT_prob(AD, DP)
        logLik_ID = model.update_ID_prob(AD, DP)
        model.get_ELBO(logLik_ID)
    dt = time.time() - t0
    print(f"[bench] CPU reference: {n_iters} iters in {dt:.2f}s",
          file=sys.stderr)
    return n_iters / dt


def main():
    n_cell = int(os.environ.get("BENCH_CELLS", 100_000))
    n_var = int(os.environ.get("BENCH_VARS", 30_000))
    n_donor = int(os.environ.get("BENCH_DONORS", 16))
    n_iters = int(os.environ.get("BENCH_ITERS", 30))

    cache = f"/tmp/vireo_cpu_baseline_{n_var}x{n_cell}x{n_donor}.json"
    repo_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks",
                              f"cpu_baseline_{n_var}x{n_cell}x{n_donor}.json")
    cpu = None
    for c in (cache, repo_cache):
        if cpu is None and os.path.exists(c):
            cpu = json.load(open(c))["iters_per_s"]
    if cpu is None or os.environ.get("BENCH_FORCE_CPU") == "1":
        from vireo_tpu.sim.synth import synth_pool_counts
        t0 = time.time()
        data = synth_pool_counts(n_var=n_var, n_cell=n_cell,
                                 n_donor=n_donor, doublet_rate=0.08,
                                 density=0.01, seed=0)
        print(f"[bench] synth pool {n_var}x{n_cell}x{n_donor} "
              f"nnz={data['DP'].nnz} gen={time.time()-t0:.1f}s",
              file=sys.stderr)
        cpu = cpu_reference_rate(data["AD"], data["DP"], n_donor)
        json.dump({"iters_per_s": cpu}, open(cache, "w"))
        del data

    tpu = tpu_rate(n_var, n_cell, n_donor, n_iters)

    print(json.dumps({
        "metric": f"em_iters_per_s_{n_var//1000}kvar_x_"
                  f"{n_cell//1000}kcell_x_{n_donor}donor",
        "value": round(tpu, 3),
        "unit": "iter/s",
        "vs_baseline": round(tpu / cpu, 2),
    }))


if __name__ == "__main__":
    main()

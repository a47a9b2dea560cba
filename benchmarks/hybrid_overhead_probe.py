"""Where does the hybrid rung's per-iteration overhead come from?

Times em_step on (a) the full HybridCounts, (b) its int8 base alone,
(c) base + residual with the residual contraction results discarded —
separating the residual COO work from program-structure effects.
Prints one JSON line.
"""

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


def main():
    import scipy.sparse as sp
    from vireo_tpu.ops.counts import counts_from_scipy, HybridCounts
    from vireo_tpu.models.vireo import (VireoConfig, init_state,
                                        default_priors, em_step)

    V, C, K = 30_000, 100_000, 16
    iters = 20
    rng = np.random.RandomState(0)
    nnz = int(V * C * 0.01)
    rows = rng.randint(0, V, size=nnz)
    cols = rng.randint(0, C, size=nnz)
    dp = rng.poisson(3.0, size=nnz) + 1
    hot = rng.rand(nnz) < 0.002
    dp = dp + hot * rng.randint(200, 2000, size=nnz)
    ad = rng.binomial(dp, 0.4)
    DP = sp.csr_matrix((dp.astype(np.float64), (rows, cols)),
                       shape=(V, C))
    AD = sp.csr_matrix((ad.astype(np.float64), (rows, cols)),
                       shape=(V, C))
    DP.sum_duplicates()
    AD.sum_duplicates()

    counts = counts_from_scipy(AD, DP, verbose=True)
    assert isinstance(counts, HybridCounts)
    jax.block_until_ready(counts.base.ad)

    cfg = VireoConfig(n_var=V, n_cell=C, n_donor=K)
    state = init_state(cfg, rng=np.random.RandomState(1),
                       dtype=jnp.float32)
    priors = default_priors(cfg, dtype=jnp.float32)

    def loop(cts):
        @jax.jit
        def run(cts, state):
            def body(i, st):
                st, _, _ = em_step(cts, st, priors, cfg,
                                   update_theta=True)
                return st
            return jax.lax.fori_loop(0, iters, body, state)

        out = run(cts, state)
        jax.block_until_ready(out.id_prob)
        best = np.inf
        for _ in range(2):
            t0 = time.time()
            jax.block_until_ready(run(cts, state).id_prob)
            best = min(best, time.time() - t0)
        return 1e3 * best / iters

    results = {
        "hybrid_ms": round(loop(counts), 2),
        "base_only_ms": round(loop(counts.base), 2),
    }
    results["residual_overhead_ms"] = round(
        results["hybrid_ms"] - results["base_only_ms"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Flagship end-to-end run: the FULL vireo_wrap pipeline (multi-init
warm restarts -> best-ELBO refit -> doublet detection) on a synthetic
100k-cell x 30k-variant x 16-donor pool, on the real accelerator, with
accuracy against the simulator's ground truth.

This is the production configuration the reference runs via
multiprocessing (vireo_wrap.py:64-105,150-156), executed here as
batched/jitted device calls. Prints one JSON line.

Usage: python benchmarks/e2e_100k.py      (tunnel TPU by default;
       VIREO_PLATFORM=cpu for a small CPU smoke run)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("VIREO_COMPILE_CACHE", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    from vireo_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax

    from vireo_tpu.sim.synth import synth_pool_dense_device
    from vireo_tpu.engine.wrap import vireo_wrap

    n_var = int(os.environ.get("E2E_VARS", 30_000))
    n_cell = int(os.environ.get("E2E_CELLS", 100_000))
    n_donor = int(os.environ.get("E2E_DONORS", 16))
    n_init = int(os.environ.get("E2E_INIT", 20))
    # unseeded by default — the production default, which draws the
    # warm-restart inits on device (no ~250 MB host upload). Set
    # E2E_SEED for the reference-RNG-parity host-init path.
    seed = os.environ.get("E2E_SEED")
    seed = int(seed) if seed else None
    doublet_rate = 0.08

    t0 = time.time()
    d = synth_pool_dense_device(n_var=n_var, n_cell=n_cell,
                                n_donor=n_donor,
                                doublet_rate=doublet_rate,
                                density=0.01, seed=0)
    jax.block_until_ready(d["counts"].ad)
    t_gen = time.time() - t0

    t0 = time.time()
    res = vireo_wrap(d["counts"], n_donor=n_donor, n_init=n_init,
                     random_seed=seed, check_doublet=True, verbose=False,
                     checkpoint_dir=os.environ.get("E2E_CHECKPOINT_DIR"),
                     timing=os.environ.get("VIREO_TIMING") == "1" or None)
    t_fit = time.time() - t0

    # accuracy vs ground truth (donor labels are permuted: align by
    # majority vote over confident singlets)
    ID_prob = res["ID_prob"]
    doublet_prob = res["doublet_prob"]
    pred = np.argmax(ID_prob, axis=1)
    prob_max = ID_prob.max(axis=1)
    prob_dbl = doublet_prob.max(axis=1)
    is_doublet_true = d["donor2"] >= 0
    called_doublet = prob_dbl >= 0.9

    from scipy.optimize import linear_sum_assignment
    C = np.zeros((n_donor, n_donor))
    singlets = ~is_doublet_true
    for t in range(n_donor):
        m = singlets & (d["donor"] == t)
        for p in range(n_donor):
            C[t, p] = np.sum(pred[m] == p)
    ti, pi = linear_sum_assignment(-C)
    remap = np.empty(n_donor, np.int64)
    remap[pi] = ti
    pred_t = remap[pred]

    conf = singlets & (prob_max >= 0.9) & ~called_doublet
    singlet_acc = float(np.mean(pred_t[conf] == d["donor"][conf]))
    assigned_frac = float(np.mean(conf[singlets]))
    doublet_recall = float(np.mean(called_doublet[is_doublet_true]))
    doublet_fpr = float(np.mean(called_doublet[singlets]))

    payload = {
        "metric": "e2e_wrap_100k",
        "value": round(t_fit, 2),
        "unit": "s",
        "workload": "%dx%dx%d, n_init=%d, doublets=%.0f%%" % (
            n_var, n_cell, n_donor, n_init, 100 * doublet_rate),
        "seeded": seed is not None,
        "device_mt": os.environ.get("VIREO_DEVICE_MT", "auto"),
        "gen_s": round(t_gen, 2),
        "singlet_accuracy": round(singlet_acc, 5),
        "singlet_assigned_frac": round(assigned_frac, 4),
        "doublet_recall": round(doublet_recall, 4),
        "doublet_fpr": round(doublet_fpr, 4),
        "elbo": float(res["LB_doublet"]),
    }
    print(json.dumps(payload))
    # artifact of record (claims in RESULTS.md must trace to a file)
    out = os.environ.get("E2E_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()

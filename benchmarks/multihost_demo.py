"""True multi-process (multi-"host") run of the sharded EM fit.

Launches N worker processes on this machine (each with its own set of
virtual CPU devices) that form one jax.distributed job, build a global
cell-sharded mesh spanning all processes, and run the shard_map COO
fit with cross-process collectives (gloo on CPU; on TPU pods the same
code rides ICI/DCN). Verifies the multi-process ELBO equals the
single-process one.

This exercises exactly the code path a TPU pod uses —
`initialize_distributed` + `make_mesh` + `sharded_fit_vb` — with DCN
emulated by localhost TCP.

Usage:  python benchmarks/multihost_demo.py [n_processes]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(pid, nproc):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    import numpy as np
    from vireo_tpu.parallel.mesh import (initialize_distributed, make_mesh,
                                         build_cell_sharded_coo,
                                         sharded_fit_vb)
    from vireo_tpu.models.vireo import (VireoConfig, init_state,
                                        default_priors)
    from vireo_tpu.sim.synth import synth_pool_counts

    initialize_distributed(coordinator_address="127.0.0.1:29871",
                           num_processes=nproc, process_id=pid)
    n_dev = len(jax.devices())
    assert n_dev == 2 * nproc

    n_var = int(os.environ.get("MH_VARS", 800))
    n_cell = int(os.environ.get("MH_CELLS", 2400))
    d = synth_pool_counts(n_var=n_var, n_cell=n_cell, n_donor=4,
                          doublet_rate=0.05, density=0.02, seed=0)
    arrays, meta = build_cell_sharded_coo(d["AD"], d["DP"], n_dev)
    cfg = VireoConfig(n_var=n_var, n_cell=meta["n_cell_pad"], n_donor=4)
    rng = np.random.RandomState(1)
    state = init_state(cfg, rng=rng, dtype=np.float32)
    priors = default_priors(cfg, dtype=np.float32)
    mesh = make_mesh()

    import time
    r1 = sharded_fit_vb(mesh, arrays, meta, state, priors, cfg,
                        min_iter=1, max_iter=1)
    jax.block_until_ready(r1.elbo_final)
    r30 = sharded_fit_vb(mesh, arrays, meta, state, priors, cfg,
                         min_iter=30, max_iter=30)  # compile
    jax.block_until_ready(r30.elbo_final)
    dt = np.inf
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(sharded_fit_vb(
            mesh, arrays, meta, state, priors, cfg,
            min_iter=30, max_iter=30).elbo_final)
        dt = min(dt, time.time() - t0)
    # dense path via the per-process cell-range loader: each process
    # reads only its columns of the bundled demo data, the global
    # array is assembled with make_array_from_process_local_data
    from vireo_tpu.parallel.loader import (load_cellSNP_sharded,
                                           dense_counts_from_local)
    from vireo_tpu.parallel.mesh import fit_vb_auto
    dat, dmeta = load_cellSNP_sharded("/root/reference/data/cellSNP_mat")
    dcounts = dense_counts_from_local(mesh, dat["AD"], dat["DP"], dmeta)
    dcfg = VireoConfig(n_var=dcounts.n_var, n_cell=dcounts.n_cell,
                       n_donor=4)
    drng = np.random.RandomState(2)
    dstate = init_state(dcfg, rng=drng, dtype=np.float32)
    dpriors = default_priors(dcfg, dtype=np.float32)
    dres = fit_vb_auto(mesh, dcounts, dstate, dpriors, dcfg,
                       min_iter=1, max_iter=1)
    jax.block_until_ready(dres.elbo_final)

    if pid == 0:
        print(json.dumps({
            "metric": "multiprocess_elbo",
            "n_processes": nproc,
            "n_devices": n_dev,
            "elbo1": float(r1.elbo_final),
            "elbo30": float(r30.elbo_final),
            "dense_loader_elbo1": float(dres.elbo_final),
            "fit_s": round(dt, 3),
        }))


def single_process_elbo():
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    import numpy as np
    from vireo_tpu.parallel.mesh import (make_mesh, build_cell_sharded_coo,
                                         sharded_fit_vb)
    from vireo_tpu.models.vireo import (VireoConfig, init_state,
                                        default_priors)
    from vireo_tpu.sim.synth import synth_pool_counts

    n_var = int(os.environ.get("MH_VARS", 800))
    n_cell = int(os.environ.get("MH_CELLS", 2400))
    d = synth_pool_counts(n_var=n_var, n_cell=n_cell, n_donor=4,
                          doublet_rate=0.05, density=0.02, seed=0)
    arrays, meta = build_cell_sharded_coo(d["AD"], d["DP"], 4)
    cfg = VireoConfig(n_var=n_var, n_cell=meta["n_cell_pad"], n_donor=4)
    rng = np.random.RandomState(1)
    state = init_state(cfg, rng=rng, dtype=np.float32)
    priors = default_priors(cfg, dtype=np.float32)
    mesh = make_mesh(n_devices=4)
    r1 = sharded_fit_vb(mesh, arrays, meta, state, priors, cfg,
                        min_iter=1, max_iter=1)
    r30 = sharded_fit_vb(mesh, arrays, meta, state, priors, cfg,
                         min_iter=30, max_iter=30)  # compile
    jax.block_until_ready(r30.elbo_final)
    import time
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(sharded_fit_vb(
            mesh, arrays, meta, state, priors, cfg,
            min_iter=30, max_iter=30).elbo_final)
        dt = min(dt, time.time() - t0)

    from vireo_tpu.parallel.loader import (load_cellSNP_sharded,
                                           dense_counts_from_local)
    from vireo_tpu.parallel.mesh import fit_vb_auto
    dat, dmeta = load_cellSNP_sharded("/root/reference/data/cellSNP_mat")
    dcounts = dense_counts_from_local(mesh, dat["AD"], dat["DP"], dmeta)
    dcfg = VireoConfig(n_var=dcounts.n_var, n_cell=dcounts.n_cell,
                       n_donor=4)
    drng = np.random.RandomState(2)
    dstate = init_state(dcfg, rng=drng, dtype=np.float32)
    dpriors = default_priors(dcfg, dtype=np.float32)
    dres = fit_vb_auto(mesh, dcounts, dstate, dpriors, dcfg,
                       min_iter=1, max_iter=1)

    print(json.dumps({"metric": "singleprocess_elbo",
                      "elbo1": float(r1.elbo_final),
                      "elbo30": float(r30.elbo_final),
                      "dense_loader_elbo1": float(dres.elbo_final),
                      "fit_s": round(dt, 3)}))


def main():
    nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    # reference ELBO from one process with the same 4-device mesh
    out = subprocess.run(
        [sys.executable, __file__, "--single"],
        capture_output=True, text=True, timeout=600)
    single = json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1])

    procs = [subprocess.Popen(
        [sys.executable, __file__, "--worker", str(p), str(nproc)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
        for p in range(nproc)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), "worker failed"
    multi = json.loads(
        [ln for o in outs for ln in o.splitlines()
         if ln.startswith("{")][-1])

    # one-step parity is tight (same math, different f32 all-reduce
    # order: ~1e-7); after 30 EM iterations the soft-assignment
    # dynamics amplify that rounding noise, so the long-run tolerance
    # is loose — both runs converge to the same assignments.
    rel1 = abs(multi["elbo1"] - single["elbo1"]) / abs(single["elbo1"])
    rel30 = abs(multi["elbo30"] - single["elbo30"]) / abs(single["elbo30"])
    reld = (abs(multi["dense_loader_elbo1"] - single["dense_loader_elbo1"])
            / abs(single["dense_loader_elbo1"]))
    assert reld < 1e-5, reld
    # throughput: same global problem and SAME total device count (4),
    # run inside one process vs split across `nproc` processes whose
    # collectives ride localhost TCP — the measured cross-process
    # overhead to report next to the analytic ICI projection. (All
    # virtual devices share these physical cores, so true multi-host
    # speedup cannot be measured here, only the comm overhead bound.)
    iters_single = 30.0 / single["fit_s"]
    iters_multi = 30.0 / multi["fit_s"]
    print(json.dumps({
        "metric": "multihost_elbo_parity",
        "value": rel1,
        "unit": "rel_diff_1iter",
        "rel_diff_30iter": rel30,
        "single_elbo30": single["elbo30"],
        "multi_elbo30": multi["elbo30"],
        "n_processes": nproc,
        "fit_s_1proc": single["fit_s"],
        "fit_s_multiproc": multi["fit_s"],
        "iters_per_s_1proc": round(iters_single, 2),
        "iters_per_s_multiproc": round(iters_multi, 2),
        "crossproc_efficiency": round(iters_multi / iters_single, 4),
        "ok": rel1 < 1e-6 and rel30 < 1e-3,
    }))
    assert rel1 < 1e-6 and rel30 < 1e-3


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--single":
        single_process_elbo()
    else:
        main()

"""FULL vireo_wrap across processes: every phase (warm restarts, refit,
doublet) of the production orchestrator on a jax.distributed mesh.

Each process holds the host input (as in the reference's single-node
setting); device placement uses global NamedShardings, so the count
matrices and assignment posteriors live cell-sharded across ALL
processes' devices while parameters replicate — the wrap's normal
GSPMD path, exercised multi-process. Donor calls are checked against a
single-process run of the same data.

Usage: python benchmarks/multihost_wrap_demo.py [n_processes]
Prints one JSON line from process 0.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = int(os.environ.get("MW_PORT", 29917))

N_VAR = int(os.environ.get("MW_VARS", 1500))
N_CELL = int(os.environ.get("MW_CELLS", 2000))
N_DONOR = int(os.environ.get("MW_DONORS", 4))


def worker(pid, nproc):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    import numpy as np
    from vireo_tpu.parallel.mesh import initialize_distributed, make_mesh
    from vireo_tpu.engine.wrap import vireo_wrap
    from vireo_tpu.sim.synth import synth_pool_counts
    from vireo_tpu.ops.matching import optimal_match

    if nproc > 1:
        initialize_distributed(coordinator_address="127.0.0.1:%d" % PORT,
                               num_processes=nproc, process_id=pid)

    d = synth_pool_counts(n_var=N_VAR, n_cell=N_CELL, n_donor=N_DONOR,
                          doublet_rate=0.05, density=0.05, seed=0)

    # MW_FULL=1 additionally exercises the paths the round-3 advisor
    # flagged as multi-process crashes: per-cell ambient estimation
    # (host allgather of the cell-sharded selected block) and phase
    # checkpoints (allgathered state, written from process 0 only)
    full = os.environ.get("MW_FULL", "0") == "1"
    extra = {}
    if full:
        ckpt_dir = os.environ.get("MW_CKPT",
                                  "/tmp/vireo_mw_ckpt_%d" % PORT)
        # MW_RESUME=1 keeps the previous run's checkpoints so this run
        # exercises the multi-process RESUME path
        if (pid == 0 and os.path.isdir(ckpt_dir)
                and os.environ.get("MW_RESUME", "0") != "1"):
            import shutil
            shutil.rmtree(ckpt_dir)
        extra = dict(check_ambient=True, checkpoint_dir=ckpt_dir)

    mesh = make_mesh()          # all devices across all processes
    res = vireo_wrap(d["AD"], d["DP"], n_donor=N_DONOR, n_init=4,
                     random_seed=1, check_doublet=True, verbose=False,
                     mesh=mesh, **extra)

    # single-process reference fit of the same data (local mesh=None)
    ref = vireo_wrap(d["AD"], d["DP"], n_donor=N_DONOR, n_init=4,
                     random_seed=1, check_doublet=True, verbose=False,
                     mesh=None,
                     **({"check_ambient": True} if full else {}))

    if pid == 0:
        idx0, idx1 = optimal_match(ref["GT_prob"], res["GT_prob"],
                                   axis=1)
        pred = np.argmax(res["ID_prob"][:, idx1], axis=1)
        pred_ref = np.argmax(ref["ID_prob"], axis=1)
        agree = float(np.mean(pred == pred_ref))
        out = {
            "metric": "multiproc_wrap_donor_agreement",
            "value": round(agree, 4), "unit": "frac",
            "n_processes": nproc,
            "elbo_multi": float(res["LB_doublet"]),
            "elbo_single": float(ref["LB_doublet"]),
            "ok": agree >= 0.99,
        }
        if full:
            import glob
            psi = res["ambient_Psi"]
            out["ambient_shape"] = list(np.shape(psi))
            out["ambient_finite"] = bool(np.isfinite(psi).all())
            out["ambient_agree_ref"] = float(np.mean(
                np.argmax(psi[:, idx1], 1)
                == np.argmax(ref["ambient_Psi"], 1)))
            out["checkpoints_written"] = len(
                glob.glob(extra["checkpoint_dir"] + "/vireo_ckpt_*.npz"))
            out["ok"] = bool(out["ok"] and out["ambient_finite"]
                             and out["checkpoints_written"] >= 2)
        print(json.dumps(out))


def main():
    nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    procs = []
    for p in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "--worker", str(p), str(nproc)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [pr.communicate(timeout=1500)[0] for pr in procs]
    rc = [pr.returncode for pr in procs]
    for o in outs:
        for ln in o.splitlines():
            if ln.startswith("{"):
                print(ln)
    if any(r != 0 for r in rc):
        sys.stderr.write("worker rcs: %s\n%s\n" % (rc, outs[0][-2000:]))
        sys.exit(1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
